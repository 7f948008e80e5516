"""Sharded index behind the product surface (VERDICT round-1 weak #5):
engine + HTTP serving over an 8-virtual-device CPU mesh, results
bit-identical to the single-device engine on the bundled corpus."""

import json
import urllib.request

import numpy as np
import pytest

from qrag_tpu.config import QragConfig
from qrag_tpu.engine import QragEngine
from qrag_tpu.serving import serve_in_thread


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def _get(url, path):
    with urllib.request.urlopen(url + path) as resp:
        return resp.status, json.loads(resp.read())


def _cfg(sharded: bool, merge: str = "allgather") -> QragConfig:
    return QragConfig.from_dict(
        {
            "embedding": {"provider": "hash", "dim": 1536},
            "index": {"sharded": sharded, "shard_merge": merge},
        }
    )


@pytest.fixture(scope="module")
def engines(bundled_index_path):
    sharded = QragEngine.from_faiss(bundled_index_path, config=_cfg(True))
    single = QragEngine.from_faiss(bundled_index_path, config=_cfg(False))
    return sharded, single


def test_config_builds_sharded_index(engines):
    from qrag_tpu.parallel.sharded_index import ShardedFlatIndex

    sharded, single = engines
    assert isinstance(sharded.index, ShardedFlatIndex)
    lay = sharded.index.layout()
    assert lay["mesh"]["model"] == 8 and lay["sharded"]


def test_sharded_search_bit_identical(engines, rng):
    sharded, single = engines
    q = sharded.index.sample_rows(rng.choice(119, 6, replace=False))
    q = q + 1e-4 * rng.randn(*q.shape).astype(np.float32)
    rs = sharded.search(q, k=10)
    ru = single.search(q, k=10)
    np.testing.assert_array_equal(rs.indices, ru.indices)
    np.testing.assert_allclose(rs.scores, ru.scores, rtol=1e-5, atol=1e-6)
    assert rs.metadata == ru.metadata


@pytest.mark.parametrize("rtype", ["quantum", "classical", "auto", "none"])
def test_sharded_search_rerank_matches_unsharded(engines, rtype):
    sharded, single = engines
    queries = ["find the advertisement segment", "what did they discuss"]
    out_s = sharded.search_rerank(queries, k=5, candidates=20, reranker_type=rtype)
    out_u = single.search_rerank(queries, k=5, candidates=20, reranker_type=rtype)
    assert out_s["reranker_used"] == out_u["reranker_used"]
    for hs, hu in zip(out_s["results"], out_u["results"]):
        assert [h["index"] for h in hs] == [h["index"] for h in hu]
        np.testing.assert_allclose(
            [h["score"] for h in hs],
            [h["score"] for h in hu],
            rtol=1e-5,
            atol=1e-6,
        )
        # retrieval_score must be API-edge finalized on BOTH arms
        # (distances ascending for l2, not raw goodness)
        np.testing.assert_allclose(
            [h["retrieval_score"] for h in hs],
            [h["retrieval_score"] for h in hu],
            rtol=1e-4,
            atol=1e-5,
        )


def test_sharded_ring_merge_matches(bundled_index_path, rng):
    eng_ring = QragEngine.from_faiss(
        bundled_index_path, config=_cfg(True, merge="ring")
    )
    eng_ag = QragEngine.from_faiss(bundled_index_path, config=_cfg(True))
    q = eng_ag.index.sample_rows([3, 77]) + 1e-4
    r1 = eng_ring.search(q, k=7)
    r2 = eng_ag.search(q, k=7)
    np.testing.assert_array_equal(r1.indices, r2.indices)
    np.testing.assert_allclose(r1.scores, r2.scores, rtol=1e-6)


def test_sharded_add_then_search(rng):
    eng = QragEngine(
        config=QragConfig.from_dict(
            {
                "embedding": {"provider": "hash", "dim": 64},
                "index": {"sharded": True, "normalize": False},
            }
        )
    )
    x = rng.randn(50, 64).astype(np.float32)
    eng.index.add(x, metadata=[f"m{i}" for i in range(50)])
    res = eng.search(x[17], k=3)
    assert res.indices[0, 0] == 17
    # append re-shards lazily
    y = rng.randn(30, 64).astype(np.float32)
    eng.index.add(y)
    res = eng.search(y[5], k=1)
    assert res.indices[0, 0] == 55


@pytest.fixture(scope="module")
def sharded_server(engines):
    sharded, _ = engines
    server = serve_in_thread(sharded, host="127.0.0.1", port=0)
    yield f"http://127.0.0.1:{server.server_address[1]}", sharded
    server.shutdown()


def test_http_search_on_sharded_corpus(sharded_server, engines):
    url, _ = sharded_server
    _, single = engines
    status, body = _post(
        url, "/search", {"query": "celebrity interview", "k": 5}
    )
    assert status == 200
    ref = single.search(
        np.asarray(single.embedder(["celebrity interview"])), k=5
    )
    got = [h["index"] for h in body["results"][0]]
    assert got == [int(i) for i in ref.indices[0]]


def test_http_search_rerank_and_stats_layout(sharded_server):
    url, _ = sharded_server
    status, body = _post(
        url,
        "/search_rerank",
        {"query": "sponsored segment about a product deal", "k": 3,
         "candidates": 15, "reranker_type": "auto"},
    )
    assert status == 200
    # batch routing is per-query; "auto" is the batch label (same as
    # the unsharded path)
    assert body["reranker_used"] == "auto"
    assert len(body["results"][0]) == 3
    status, stats = _get(url, "/stats")
    assert status == 200
    lay = stats["index"]["layout"]
    assert lay["sharded"] and lay["mesh"]["model"] == 8
    assert lay["merge"] == "allgather"


def test_sharded_bundle_roundtrip(engines, tmp_path):
    sharded, _ = engines
    bundle = str(tmp_path / "bundle")
    sharded.save(bundle)
    eng2 = QragEngine.load(bundle)
    # bundle config said sharded=True -> restores sharded
    from qrag_tpu.parallel.sharded_index import ShardedFlatIndex

    assert isinstance(eng2.index, ShardedFlatIndex)
    assert eng2.index.ntotal == sharded.index.ntotal
    q = sharded.index.sample_rows([11])
    np.testing.assert_array_equal(
        eng2.search(q, k=4).indices, sharded.search(q, k=4).indices
    )


def test_sharded_single_query_on_dp_mesh(bundled_index_path):
    """A 1-query request against a data-parallel mesh must pad the
    batch to the data axis (regression: shard_map rejects B=1 on
    dp=2)."""
    cfg = QragConfig.from_dict(
        {
            "embedding": {"provider": "hash", "dim": 1536},
            "index": {"sharded": True},
            "mesh": {"data_parallel": 2, "model_parallel": 4},
        }
    )
    eng = QragEngine.from_faiss(bundled_index_path, config=cfg)
    out = eng.search_rerank("single query on a dp mesh", k=3, candidates=10)
    assert len(out["results"]) == 1 and len(out["results"][0]) == 3
    out = eng.search_rerank(
        ["a", "b", "c"], k=2, candidates=8, reranker_type="classical"
    )
    assert len(out["results"]) == 3


def test_refined_downgrade_is_logged_verified_is_not(bundled_index_path, caplog):
    """'refined' still downgrades loudly; 'verified' now runs for real
    per shard (VERDICT r3 weak #5) so it must neither warn nor be
    remapped."""
    import logging

    with caplog.at_level(logging.WARNING, logger="qrag_tpu.engine"):
        QragEngine.from_faiss(
            bundled_index_path,
            config=QragConfig.from_dict(
                {"embedding": {"provider": "hash", "dim": 1536},
                 "index": {"sharded": True, "topk_mode": "refined"}}
            ),
        )
    assert any("does not support topk_mode" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="qrag_tpu.engine"):
        eng = QragEngine.from_faiss(
            bundled_index_path,
            config=QragConfig.from_dict(
                {"embedding": {"provider": "hash", "dim": 1536},
                 "index": {"sharded": True, "topk_mode": "verified"}}
            ),
        )
    assert not any(
        "does not support topk_mode" in r.message for r in caplog.records
    )
    assert eng.index.topk_mode == "verified"


def test_elastic_engine_survives_injected_failure(bundled_index_path):
    """config index.elastic builds ElasticShardedIndex behind the
    engine; an injected device failure re-shards over survivors and
    the request still succeeds (same results, fewer devices)."""
    from qrag_tpu.parallel.elastic import ElasticShardedIndex

    cfg = QragConfig.from_dict(
        {
            "embedding": {"provider": "hash", "dim": 1536},
            "index": {"sharded": True, "elastic": True},
        }
    )
    eng = QragEngine.from_faiss(bundled_index_path, config=cfg)
    assert isinstance(eng.index, ElasticShardedIndex)
    assert eng.index.layout()["elastic"] is True
    baseline = eng.search_rerank("celebrity interview", k=4, candidates=12)

    # transient failure (healthy mesh): retry, NO eviction
    def boom():
        raise RuntimeError("injected transient failure")

    eng.index.inject_search_failure(boom)
    out = eng.search_rerank("celebrity interview", k=4, candidates=12)
    assert eng.index.rebuilds == 0
    assert eng.index.layout()["mesh"]["model"] == 8  # capacity kept
    assert [h["index"] for h in out["results"][0]] == [
        h["index"] for h in baseline["results"][0]
    ]

    # persistent device death: localized eviction of exactly that chip
    victim = eng.index.devices[3]
    eng.index.inject_device_failure(victim)
    out = eng.search_rerank("celebrity interview", k=4, candidates=12)
    assert eng.index.rebuilds == 1
    assert eng.index.layout()["mesh"]["model"] == 7
    assert victim not in eng.index.devices
    assert [h["index"] for h in out["results"][0]] == [
        h["index"] for h in baseline["results"][0]
    ]
    # /stats through the engine surfaces the elastic layout
    stats = eng.stats()
    assert stats["index"]["layout"]["rebuilds"] == 1
    # appends survive re-sharding (master copy mirrors the live index)
    n0 = eng.index.ntotal
    eng.index.add(eng.index.sample_rows([0]) + 0.5)
    eng.index.inject_device_failure(eng.index.devices[-1])
    res = eng.search(eng.index.sample_rows([n0]), k=1)
    assert res.indices[0, 0] == n0
    assert eng.index.rebuilds == 2
