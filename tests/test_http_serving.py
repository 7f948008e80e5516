"""HTTP API round-trip tests mirroring the reference request/response
shapes (``app.py:56-92``; SURVEY.md §4.2)."""

import json
import urllib.request

import numpy as np
import pytest

from qrag_tpu.config import QragConfig
from qrag_tpu.engine import QragEngine
from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.serving import serve_in_thread


@pytest.fixture(scope="module")
def server_url(rng=np.random.RandomState(7)):
    cfg = QragConfig.from_dict({"embedding": {"provider": "hash", "dim": 32}})
    x = rng.randn(40, 32).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = DeviceFlatIndex.from_numpy(
        x, metric="l2", metadata=[f"show/ep{i}" for i in range(40)]
    )
    engine = QragEngine(config=cfg, index=idx)
    server = serve_in_thread(engine, host="127.0.0.1", port=0)
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


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


def test_root_info(server_url):
    status, body = _get(server_url, "/")
    assert status == 200
    assert "endpoints" in body and "rerank" in body["endpoints"]


def test_rerank_roundtrip(server_url):
    payload = {
        "query": "find the advertisement in this podcast",
        "documents": [
            {"id": "a", "content": "buy our product now great deal"},
            {"id": "b", "content": "the weather is nice today"},
            {"id": "c", "content": "sponsored by acme corp"},
        ],
        "reranker_type": "auto",
        "top_k": 2,
    }
    status, body = _post(server_url, "/rerank", payload)
    assert status == 200
    assert body["reranker_used"] == "quantum"  # keyword route
    assert body["query"] == payload["query"]
    assert len(body["documents"]) == 2
    entry = body["documents"][0]
    assert set(entry.keys()) == {"document", "score"}
    assert entry["document"]["id"] in {"a", "b", "c"}
    scores = [e["score"] for e in body["documents"]]
    assert scores == sorted(scores, reverse=True)


def test_rerank_classical_explicit(server_url):
    status, body = _post(
        server_url,
        "/rerank",
        {
            "query": "short query",
            "documents": [{"id": "1", "content": "xyz"}],
            "reranker_type": "classical",
        },
    )
    assert body["reranker_used"] == "classical"


def test_rerank_invalid_query_error_dict(server_url):
    """Handler errors come back as {"error": ...} with HTTP 200,
    matching ``app.py:75-77``."""
    status, body = _post(server_url, "/rerank", {"query": 42, "documents": []})
    assert status == 200
    assert "error" in body


def test_search_by_vector(server_url):
    rng = np.random.RandomState(7)
    x = rng.randn(40, 32).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    status, body = _post(
        server_url, "/search", {"vectors": [x[10].tolist()], "k": 3}
    )
    assert status == 200
    assert body["metric"] == "l2"
    assert body["results"][0][0]["index"] == 10
    assert body["results"][0][0]["metadata"] == "show/ep10"


def test_search_rerank_endpoint(server_url):
    rng = np.random.RandomState(7)
    x = rng.randn(40, 32).astype(np.float32)
    status, body = _post(
        server_url,
        "/search_rerank",
        {"vectors": [x[0].tolist()], "k": 3, "candidates": 10},
    )
    assert status == 200
    assert body["reranker_used"] == "quantum"
    hits = body["results"][0]
    assert len(hits) == 3
    assert all({"index", "score", "retrieval_score", "metadata"} <= set(h) for h in hits)


def test_add_then_search(server_url):
    status, body = _post(
        server_url,
        "/add",
        {"texts": ["unique marker text xyzzy"], "metadata": ["added/1"]},
    )
    assert status == 200 and body["stored_count"] == 1
    status, body = _post(
        server_url, "/search", {"query": "unique marker text xyzzy", "k": 1}
    )
    assert body["results"][0][0]["metadata"] == "added/1"


def test_stats_endpoint(server_url):
    status, body = _get(server_url, "/stats")
    assert status == 200
    assert body["index"]["d"] == 32
    assert "counters" in body["metrics"]


def test_unknown_route_404(server_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _get(server_url, "/nope")
    assert exc_info.value.code == 404


def test_malformed_json_400(server_url):
    import urllib.error

    req = urllib.request.Request(
        server_url + "/rerank", data=b"{not json", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(req)
    assert exc_info.value.code == 400


def test_search_with_batching_enabled(rng):
    """Server with --batching: concurrent /search requests coalesce and
    return correct per-request results."""
    import threading

    from qrag_tpu.config import QragConfig
    from qrag_tpu.engine import QragEngine
    from qrag_tpu.index.flat_index import DeviceFlatIndex
    from qrag_tpu.serving import serve_in_thread

    cfg = QragConfig.from_dict({"embedding": {"provider": "hash", "dim": 16}})
    x = rng.randn(100, 16).astype(np.float32)
    idx = DeviceFlatIndex.from_numpy(x, topk_mode="exact")
    engine = QragEngine(config=cfg, index=idx)
    server = serve_in_thread(engine, batching=True)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        outs = {}

        def hit(i):
            status, body = _post(
                url, "/search", {"vectors": [x[i].tolist()], "k": 2}
            )
            outs[i] = (status, body)

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(6):
            status, body = outs[i]
            assert status == 200
            assert body["results"][0][0]["index"] == i
        status, stats = _get(url, "/stats")
        assert stats["batcher"]["batched_queries"] == 6
    finally:
        server.shutdown()


def test_docs_endpoint(server_url):
    status, body = _get(server_url, "/docs")
    assert status == 200
    assert "POST /rerank" in body["endpoints"]


def test_streamed_search_ndjson(server_url):
    """"stream": true returns chunked NDJSON whose reassembled hits
    equal the plain /search response (ROADMAP serving item)."""
    vec = np.random.RandomState(3).randn(2, 32).astype(np.float32)
    payload = {"vectors": vec.tolist(), "k": 7}
    _, plain = _post(server_url, "/search", payload)
    req = urllib.request.Request(
        server_url + "/search",
        data=json.dumps({**payload, "stream": True}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "application/x-ndjson"
        lines = [json.loads(ln) for ln in resp.read().splitlines() if ln]
    assert lines[-1]["done"] is True
    assert lines[-1]["metric"] == plain["metric"]
    per_query = {}
    for ln in lines[:-1]:
        per_query.setdefault(ln["query"], []).extend(ln["hits"])
    assert len(per_query) == 2
    for qi, hits in per_query.items():
        want = plain["results"][qi]
        assert [h["index"] for h in hits] == [h["index"] for h in want]
        np.testing.assert_allclose(
            [h["score"] for h in hits], [h["score"] for h in want]
        )


def test_search_priority_accepted(server_url):
    """priority is accepted on the plain path (no batcher here) and
    on /search_rerank without changing results."""
    vec = np.random.RandomState(4).randn(1, 32).astype(np.float32)
    _, a = _post(server_url, "/search", {"vectors": vec.tolist(), "k": 3})
    _, b = _post(
        server_url,
        "/search",
        {"vectors": vec.tolist(), "k": 3, "priority": 7},
    )
    assert [h["index"] for h in a["results"][0]] == [
        h["index"] for h in b["results"][0]
    ]
