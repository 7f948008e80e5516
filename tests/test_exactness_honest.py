"""Exactness-honest fused/sharded paths (VERDICT r3 weak #5).

A bounded-configured engine must get provably-exact candidate sets on
the fused and pipelined paths (in-graph bounded_exact_topk, not a
silent approx downgrade); a verified-configured sharded index must run
the certificate per shard; /stats must report the EFFECTIVE mode per
path."""

import numpy as np
import pytest
import jax

from qrag_tpu.config import MeshConfig, QragConfig
from qrag_tpu.engine import QragEngine
from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.parallel import ShardedFlatIndex, make_mesh


def _engine(x, topk_mode, dim):
    cfg = QragConfig.from_dict(
        {"embedding": {"provider": "hash", "dim": dim}}
    )
    idx = DeviceFlatIndex.from_numpy(
        x, metric="l2", metadata=[f"m/{i}" for i in range(x.shape[0])],
        topk_mode=topk_mode,
    )
    return QragEngine(config=cfg, index=idx)


@pytest.fixture(scope="module")
def corpus_big():
    rng = np.random.RandomState(11)
    # 102 windows: bounded-eligible even at the serving default
    # candidate budget (100) the stats report assumes
    x = rng.randn(13056, 64).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def test_fused_bounded_candidates_match_exact(corpus_big):
    x = corpus_big
    eng_b = _engine(x, "bounded", 64)
    eng_e = _engine(x, "exact", 64)
    assert eng_b._fused_candidate_mode(20)[0] == "bounded"
    q = x[[3, 77, 500]] + 1e-3
    out_b = eng_b.search_rerank(q, k=5, candidates=20, reranker_type="quantum")
    out_e = eng_e.search_rerank(q, k=5, candidates=20, reranker_type="quantum")
    for hb, he in zip(out_b["results"], out_e["results"]):
        assert [h["index"] for h in hb] == [h["index"] for h in he]
        np.testing.assert_allclose(
            [h["score"] for h in hb], [h["score"] for h in he], atol=1e-6
        )
        np.testing.assert_allclose(
            [h["retrieval_score"] for h in hb],
            [h["retrieval_score"] for h in he],
            atol=1e-4,
        )


def test_fused_bounded_routed_and_classical(corpus_big):
    x = corpus_big
    eng_b = _engine(x, "bounded", 64)
    eng_e = _engine(x, "exact", 64)
    q = x[[10, 42]] - 5e-4
    for rtype in ("classical",):
        out_b = eng_b.search_rerank(q, k=4, candidates=20, reranker_type=rtype)
        out_e = eng_e.search_rerank(q, k=4, candidates=20, reranker_type=rtype)
        for hb, he in zip(out_b["results"], out_e["results"]):
            assert [h["index"] for h in hb] == [h["index"] for h in he]


def test_pipelined_bounded_stage1_matches_fused(corpus_big):
    x = corpus_big
    eng = _engine(x, "bounded", 64)
    q = x[[5, 9, 200, 301]] + 2e-4
    fused = eng.search_rerank(q, k=5, candidates=20, reranker_type="quantum")
    piped = eng.search_rerank_pipelined(q, k=5, candidates=20, micro_batch=2)
    for hf, hp in zip(fused["results"], piped["results"]):
        assert [h["index"] for h in hf] == [h["index"] for h in hp]


def test_bounded_small_corpus_effective_exact():
    rng = np.random.RandomState(3)
    x = rng.randn(256, 32).astype(np.float32)
    eng = _engine(x, "bounded", 32)
    mode, kw = eng._fused_candidate_mode(20)
    assert mode == "exact" and kw == {}
    modes = eng.stats()["index"]["effective_topk_modes"]
    assert modes["fused_candidates"] == "exact"
    assert modes["search"] == "bounded"


def test_stats_effective_modes(corpus_big):
    eng = _engine(corpus_big, "bounded", 64)
    modes = eng.stats()["index"]["effective_topk_modes"]
    assert modes == {
        "search": "bounded",
        "fused_candidates": "bounded",
        "pipelined_stage1": "bounded",
    }
    eng_v = _engine(corpus_big, "verified", 64)
    modes = eng_v.stats()["index"]["effective_topk_modes"]
    assert modes["search"] == "verified"
    assert modes["fused_candidates"] == "approx"


def test_fused_bounded_int8_matches_exact(corpus_big):
    """bounded_scan='int8': the fused candidate generation runs the
    int8 bounded-exact op in-graph and still matches the exact engine."""
    x = corpus_big
    cfg = QragConfig.from_dict({"embedding": {"provider": "hash", "dim": 64}})
    idx = DeviceFlatIndex.from_numpy(
        x, metric="l2", topk_mode="bounded", bounded_scan="int8",
        metadata=[f"m/{i}" for i in range(x.shape[0])],
    )
    eng_b = QragEngine(config=cfg, index=idx)
    eng_e = _engine(x, "exact", 64)
    mode, kw = eng_b._fused_candidate_mode(20)
    assert mode == "bounded" and kw["bounded_kind"] == "int8"
    q = x[[3, 77, 500]] + 1e-3
    out_b = eng_b.search_rerank(q, k=5, candidates=20, reranker_type="quantum")
    out_e = eng_e.search_rerank(q, k=5, candidates=20, reranker_type="quantum")
    for hb, he in zip(out_b["results"], out_e["results"]):
        assert [h["index"] for h in hb] == [h["index"] for h in he]
    # index.search (host path) through the int8 bounded arm too
    res_b = eng_b.index.search(q, k=5)
    res_e = eng_e.index.search(q, k=5)
    np.testing.assert_array_equal(res_b.indices, res_e.indices)
    np.testing.assert_allclose(res_b.scores, res_e.scores, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------- sharded verified


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(MeshConfig(data_parallel=2, model_parallel=4))


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_sharded_verified_matches_exact(mesh8, metric):
    """Per-shard certificate path (shards big enough that the approx
    pass + certificate actually runs, not the small-shard sort)."""
    rng = np.random.RandomState(5)
    x = rng.randn(8192, 32).astype(np.float32)
    q = rng.randn(6, 32).astype(np.float32)
    sharded = ShardedFlatIndex(x, mesh8, metric=metric, topk_mode="verified")
    single = DeviceFlatIndex.from_numpy(x, metric=metric, topk_mode="exact")
    rs = sharded.search(q, k=10)
    re = single.search(q, k=10)
    np.testing.assert_array_equal(rs.indices, re.indices)
    np.testing.assert_allclose(rs.scores, re.scores, rtol=1e-5, atol=1e-5)


def test_sharded_verified_small_shards(mesh8):
    rng = np.random.RandomState(6)
    x = rng.randn(1500, 16).astype(np.float32)  # small shards -> sort arm
    q = rng.randn(3, 16).astype(np.float32)
    sharded = ShardedFlatIndex(x, mesh8, topk_mode="verified")
    single = DeviceFlatIndex.from_numpy(x, topk_mode="exact")
    np.testing.assert_array_equal(
        sharded.search(q, k=7).indices, single.search(q, k=7).indices
    )


def test_engine_config_keeps_sharded_verified():
    """The engine no longer downgrades sharded 'verified' to 'approx'."""
    from qrag_tpu.engine import _index_cls_and_kwargs

    cfg = QragConfig.from_dict(
        {"index": {"sharded": True, "topk_mode": "verified"}}
    )
    _, kw = _index_cls_and_kwargs(cfg)
    assert kw["topk_mode"] == "verified"
    cfg_r = QragConfig.from_dict(
        {"index": {"sharded": True, "topk_mode": "refined"}}
    )
    _, kw_r = _index_cls_and_kwargs(cfg_r)
    assert kw_r["topk_mode"] == "approx"  # refined still downgrades, loudly
