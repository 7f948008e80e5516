"""Warmup pre-compiles the BUCKETED serving shapes (VERDICT r2 #8):
after ``engine.warmup()``, the first coalesced batched request must
hit the jit trace caches — zero new compilations — because production
traffic pads to the same pow2 buckets the warmup covered.
"""

import numpy as np
import pytest

from qrag_tpu.config import QragConfig
from qrag_tpu.documents import Document
from qrag_tpu.engine import QragEngine, fused_search_rerank
from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.ops.topk import _scan_topk_device
from qrag_tpu.serving.batcher import SearchBatcher, _pair_fidelity_fn

D = 32


@pytest.fixture(scope="module")
def warm_engine(rng):
    cfg = QragConfig.from_dict(
        {
            "embedding": {"provider": "hash", "dim": D},
            "classical": {"method": "cosine"},
        }
    )
    x = rng.randn(3000, D).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    eng = QragEngine(
        config=cfg,
        index=DeviceFlatIndex.from_numpy(x, topk_mode="verified"),
    )
    eng.warmup()
    return eng


def _jit_cache_sizes(eng):
    qr = eng.controller.quantum_reranker
    fid_fn = _pair_fidelity_fn(
        qr.n_qubits,
        bool(qr.config.use_analytic_fidelity),
        qr.config.encoding,
    )
    return {
        "scan": _scan_topk_device._cache_size(),
        "fused": fused_search_rerank._cache_size(),
        "multi_fidelity": fid_fn._cache_size(),
    }


def test_batched_requests_hit_warm_caches(warm_engine):
    eng = warm_engine
    batcher = SearchBatcher(eng)
    before = _jit_cache_sizes(eng)
    rng = np.random.RandomState(1)

    # coalesced /search: 5 queries pad to the bucket-8 shape
    vecs = rng.randn(5, D).astype(np.float32)
    res = batcher.search(vecs, k=10)
    assert res.indices.shape == (5, 10)

    # coalesced /search_rerank: 3 queries pad to bucket 8, serving
    # defaults k=10 / candidates=100
    out = batcher.search_rerank(
        rng.randn(3, D).astype(np.float32), k=10, candidates=100
    )
    assert len(out["results"]) == 3

    # coalesced /search at a MID-ladder rung the old warmup missed:
    # 13 queries pad to bucket 16 (review finding r3 — 16/64/256 were
    # unwarmed when doc_buckets skipped rungs)
    res16 = batcher.search(rng.randn(13, D).astype(np.float32), k=10)
    assert res16.indices.shape == (13, 10)

    # coalesced quantum doc-list /rerank: 6 docs pad to doc bucket 8
    docs = [Document(str(i), f"document text {i}") for i in range(6)]
    rr = batcher.rerank_documents(
        "find the sponsor advertisement", docs, top_k=3
    )
    assert rr["reranker_used"] == "quantum" and len(rr["documents"]) == 3

    # a doc count in a previously-unwarmed rung: 12 docs -> pair
    # bucket 16
    docs12 = [Document(f"b{i}", f"promo spot {i}") for i in range(12)]
    rr12 = batcher.rerank_documents(
        "find the sponsor advertisement", docs12, top_k=4
    )
    assert len(rr12["documents"]) == 4

    # TWO coalesced doc-rerank requests (R=2, 6+12=18 pairs -> bucket
    # 32): the pair-flattened graph must already be compiled — the old
    # (R, D)-shaped op had no warmed graph for any R > 1
    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(
            batcher.rerank_documents,
            "find the sponsor advertisement",
            docs,
            3,
        )
        f2 = ex.submit(
            batcher.rerank_documents,
            "find the sponsor advertisement",
            docs12,
            4,
        )
        assert len(f1.result()["documents"]) == 3
        assert len(f2.result()["documents"]) == 4

    after = _jit_cache_sizes(eng)
    batcher.close()
    assert after == before, (
        f"batched serving compiled new graphs after warmup: "
        f"{before} -> {after}"
    )


def test_warmup_returns_time_and_is_idempotent(warm_engine):
    # a second warmup touches only cached graphs: near-instant
    dt = warm_engine.warmup()
    assert dt < 5.0
