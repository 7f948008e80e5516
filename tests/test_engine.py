"""QragEngine: fused retrieval→rerank pipeline (SURVEY.md §7 phase 1
exit criterion + BASELINE configs[3])."""

import numpy as np
import pytest

from qrag_tpu.config import QragConfig
from qrag_tpu.documents import Document
from qrag_tpu.engine import QragEngine
from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.ops.statevector import fidelity_analytic

import jax.numpy as jnp


def _engine(rng, n=200, d=64, **cfg_overrides):
    cfg = QragConfig.from_dict(
        {"embedding": {"provider": "hash", "dim": d}, **cfg_overrides}
    )
    x = rng.randn(n, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = DeviceFlatIndex.from_numpy(
        x, metric="l2", metadata=[f"show/ep{i}" for i in range(n)]
    )
    return QragEngine(config=cfg, index=idx), x


def test_search_by_vector(rng):
    eng, x = _engine(rng)
    res = eng.search(x[5], k=3)
    assert res.indices[0, 0] == 5
    assert res.metadata[0][0] == "show/ep5"


def test_search_by_text(rng):
    eng, _ = _engine(rng)
    # index a known text's embedding, then search for the same text
    eng.add_texts(["the quick brown fox"], ["added/t0"])
    res = eng.search("the quick brown fox", k=1)
    assert res.metadata[0][0] == "added/t0"
    assert res.scores[0, 0] < 1e-5


def test_fused_search_rerank_matches_two_stage(rng):
    """Fused jit result == separate retrieval-then-fidelity oracle."""
    eng, x = _engine(rng)
    n_qubits = eng.config.quantum.n_qubits
    q = x[17] + 0.01 * rng.randn(64).astype(np.float32)
    out = eng.search_rerank(q[None, :], k=5, candidates=20)
    hits = out["results"][0]
    assert len(hits) == 5
    # oracle: top-20 by L2, fidelity per candidate, top-5 by fidelity
    d2 = ((x - q) ** 2).sum(-1)
    cand = np.argsort(d2, kind="stable")[:20]
    fid = np.asarray(
        fidelity_analytic(jnp.asarray(q), jnp.asarray(x[cand]), n_qubits)
    )
    order = np.argsort(-fid, kind="stable")[:5]
    want_idx = cand[order]
    got_idx = [h["index"] for h in hits]
    assert set(got_idx) == set(int(i) for i in want_idx)
    got_scores = [h["score"] for h in hits]
    assert got_scores == sorted(got_scores, reverse=True)
    np.testing.assert_allclose(got_scores, np.sort(fid)[::-1][:5], atol=1e-5)


def test_search_rerank_classical_type(rng):
    eng, x = _engine(rng)
    out = eng.search_rerank(x[3][None, :], k=4, candidates=10, reranker_type="classical")
    assert out["reranker_used"] == "classical"
    assert out["results"][0][0]["index"] == 3


def test_search_rerank_classical_actually_reranks(rng):
    """Round-2 regression (VERDICT weak #4): on a NON-normalized IP
    corpus the cosine rerank ordering differs from raw IP retrieval —
    the "classical" label must mean a real cosine pass whose scores
    match the routed path's classical expert."""
    x = rng.randn(64, 32).astype(np.float32)
    x *= rng.uniform(0.2, 5.0, size=(64, 1)).astype(np.float32)  # wild norms
    eng = QragEngine(
        config=QragConfig.from_dict(
            {"embedding": {"provider": "hash", "dim": 32},
             "index": {"metric": "ip", "normalize": False}}
        )
    )
    eng.index.add(x)
    q = rng.randn(3, 32).astype(np.float32)
    out = eng.search_rerank(q, k=5, candidates=20, reranker_type="classical")
    # oracle: top-20 by IP, then cosine rerank, top-5
    for qi in range(3):
        ip = x @ q[qi]
        cand = np.argsort(-ip, kind="stable")[:20]
        cn = x[cand] / np.linalg.norm(x[cand], axis=1, keepdims=True)
        qn = q[qi] / np.linalg.norm(q[qi])
        cos = cn @ qn
        want = cand[np.argsort(-cos, kind="stable")[:5]]
        got = [h["index"] for h in out["results"][qi]]
        assert set(got) == set(int(i) for i in want)
        got_scores = [h["score"] for h in out["results"][qi]]
        np.testing.assert_allclose(
            got_scores, np.sort(cos)[::-1][:5], atol=1e-5
        )
        # the raw-retrieval ordering must actually differ somewhere,
        # otherwise this test proves nothing
    assert any(
        [h["index"] for h in out["results"][qi]]
        != list(np.argsort(-(x @ q[qi]), kind="stable")[:5])
        for qi in range(3)
    )


def test_search_rerank_none_and_unknown(rng):
    eng, x = _engine(rng)
    out = eng.search_rerank(x[2][None, :], k=3, candidates=8, reranker_type="none")
    assert out["reranker_used"] == "none"
    assert out["results"][0][0]["index"] == 2
    with pytest.raises(ValueError, match="reranker_type"):
        eng.search_rerank(x[2][None, :], k=3, reranker_type="bogus")


def test_search_rerank_candidates_capped_by_ntotal(rng):
    eng, x = _engine(rng, n=12)
    out = eng.search_rerank(x[0][None, :], k=5, candidates=100)
    assert len(out["results"][0]) == 5


def test_empty_index(rng):
    eng = QragEngine(
        config=QragConfig.from_dict({"embedding": {"provider": "hash", "dim": 8}})
    )
    out = eng.search_rerank(np.zeros((1, 8), np.float32), k=3)
    assert out["results"] == []


def test_rerank_through_engine(rng):
    eng, _ = _engine(rng)
    docs = [Document(str(i), f"content {i}") for i in range(4)]
    out = eng.rerank("a query with sponsor words", docs, top_k=2)
    assert out["reranker_used"] == "quantum"
    assert len(out["documents"]) == 2


def test_warmup_and_stats(rng):
    eng, _ = _engine(rng, n=50)
    dt = eng.warmup()
    assert dt >= 0
    stats = eng.stats()
    assert stats["index"]["ntotal"] == 50
    assert "search" in stats["metrics"]["latency"]


def test_engine_save_load_roundtrip(tmp_path, rng):
    eng, x = _engine(rng, n=60)
    d = str(tmp_path / "bundle")
    eng.save(d)
    from qrag_tpu.engine import QragEngine

    back = QragEngine.load(d)
    assert back.index.ntotal == 60
    assert back.config.embedding.dim == eng.config.embedding.dim
    r1 = eng.search(x[5], k=3)
    r2 = back.search(x[5], k=3)
    np.testing.assert_array_equal(r1.indices, r2.indices)
    assert r2.metadata[0][0] == "show/ep5"


def test_engine_save_load_quantized(tmp_path, rng):
    from qrag_tpu.engine import QragEngine
    from qrag_tpu.index.quantized_index import QuantizedFlatIndex

    cfg = QragConfig.from_dict(
        {"index": {"quantization": "int8"},
         "embedding": {"provider": "hash", "dim": 32}}
    )
    x = rng.randn(200, 32).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    eng = QragEngine(config=cfg)
    eng.index.add(x)
    d = str(tmp_path / "qb")
    eng.save(d)
    back = QragEngine.load(d)
    assert isinstance(back.index, QuantizedFlatIndex)
    assert back.search(x[9], k=1).indices[0, 0] == 9
