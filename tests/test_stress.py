"""Cross-endpoint concurrency stress on the threaded server + IO edge
cases (SURVEY.md §4.4 fault/concurrency tests)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from qrag_tpu.config import QragConfig
from qrag_tpu.engine import QragEngine
from qrag_tpu.index import faiss_io
from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.serving import serve_in_thread


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_mixed_endpoint_concurrency(rng):
    """Hammer /search, /add, /rerank and /search_rerank from 10
    threads: no errors, no bogus indices, index grows exactly by the
    adds."""
    cfg = QragConfig.from_dict({"embedding": {"provider": "hash", "dim": 24}})
    x = rng.randn(200, 24).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = DeviceFlatIndex.from_numpy(x, topk_mode="exact")
    engine = QragEngine(config=cfg, index=idx)
    server = serve_in_thread(engine)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    errors = []
    n_adds = 4

    def searcher(i):
        try:
            for j in range(6):
                status, body = _post(
                    url, "/search", {"query": f"text {i} {j}", "k": 3}
                )
                assert status == 200 and "results" in body, body
                for hit in body["results"][0]:
                    assert 0 <= hit["index"] < 300
        except Exception as e:  # noqa: BLE001
            errors.append(f"search: {e}")

    def adder(i):
        try:
            status, body = _post(
                url, "/add", {"texts": [f"added doc {i}"], "metadata": [f"a/{i}"]}
            )
            assert status == 200 and body.get("stored_count") == 1, body
        except Exception as e:  # noqa: BLE001
            errors.append(f"add: {e}")

    def reranker(i):
        try:
            status, body = _post(
                url,
                "/rerank",
                {
                    "query": "find the sponsor ads",
                    "documents": [
                        {"id": "a", "content": f"sponsored segment {i}"},
                        {"id": "b", "content": "other talk"},
                    ],
                    "top_k": 2,
                },
            )
            assert status == 200 and body["reranker_used"] == "quantum", body
        except Exception as e:  # noqa: BLE001
            errors.append(f"rerank: {e}")

    def fused(i):
        try:
            status, body = _post(
                url, "/search_rerank", {"query": f"fused {i}", "k": 2,
                                        "candidates": 8},
            )
            assert status == 200 and body["reranker_used"] == "quantum", body
        except Exception as e:  # noqa: BLE001
            errors.append(f"fused: {e}")

    try:
        threads = (
            [threading.Thread(target=searcher, args=(i,)) for i in range(4)]
            + [threading.Thread(target=adder, args=(i,)) for i in range(n_adds)]
            + [threading.Thread(target=reranker, args=(i,)) for i in range(2)]
            + [threading.Thread(target=fused, args=(i,)) for i in range(2)]
        )
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors[:5]
        assert engine.index.ntotal == 200 + n_adds
    finally:
        server.shutdown()


@pytest.mark.parametrize("n,d", [(1, 1), (1, 2000), (3, 1), (257, 7)])
def test_faiss_io_odd_shapes_roundtrip(tmp_path, rng, n, d):
    x = rng.randn(n, d).astype(np.float32)
    path = str(tmp_path / "odd.faiss")
    faiss_io.write_flat_index(path, x, metric="ip")
    back = faiss_io.read_flat_index(path)
    np.testing.assert_array_equal(back.vectors, x)


def test_index_odd_shapes_search(rng):
    x = rng.randn(3, 1).astype(np.float32)
    idx = DeviceFlatIndex.from_numpy(x, topk_mode="exact")
    res = idx.search(x[1], k=3)
    assert res.indices[0, 0] == 1


def test_truncated_faiss_file_rejected(tmp_path, rng):
    path = str(tmp_path / "t.faiss")
    x = rng.randn(10, 8).astype(np.float32)
    faiss_io.write_flat_index(path, x)
    raw = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(raw[: len(raw) // 2])
    with pytest.raises(ValueError, match="truncated|count"):
        faiss_io.read_flat_index(path)
