"""Pipelined two-stage search_rerank (PP row), recall sampling, and
index writer/reader concurrency."""

import threading

import numpy as np

from qrag_tpu.config import QragConfig
from qrag_tpu.engine import QragEngine
from qrag_tpu.index.flat_index import DeviceFlatIndex


def _engine(rng, n=300, d=48):
    cfg = QragConfig.from_dict({"embedding": {"provider": "hash", "dim": d}})
    x = rng.randn(n, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = DeviceFlatIndex.from_numpy(
        x, metric="l2", metadata=[f"m/{i}" for i in range(n)], topk_mode="exact"
    )
    return QragEngine(config=cfg, index=idx), x


def test_pipelined_matches_monolithic(rng):
    eng, x = _engine(rng)
    q = x[:70] + 0.001 * rng.randn(70, 48).astype(np.float32)
    mono = eng.search_rerank(q, k=5, candidates=20)
    piped = eng.search_rerank_pipelined(q, k=5, candidates=20, micro_batch=16)
    assert piped["queries"] == 70
    assert len(piped["results"]) == 70
    for a, b in zip(mono["results"], piped["results"]):
        assert [h["index"] for h in a] == [h["index"] for h in b]
        np.testing.assert_allclose(
            [h["score"] for h in a], [h["score"] for h in b], atol=1e-6
        )


def test_pipelined_tail_batch_padding(rng):
    eng, x = _engine(rng, n=100)
    piped = eng.search_rerank_pipelined(x[:5], k=3, candidates=10, micro_batch=4)
    assert len(piped["results"]) == 5
    assert piped["results"][0][0]["index"] == 0


def test_pipelined_after_add(rng):
    """Stage fns must see appended rows (no stale closure capture)."""
    eng, x = _engine(rng, n=64, d=32)
    q = rng.randn(1, 32).astype(np.float32)
    eng.search_rerank_pipelined(q, k=3, candidates=8)  # builds stage fns
    new = rng.randn(8, 32).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    eng.index.add(new, metadata=[f"new/{i}" for i in range(8)])
    res = eng.search_rerank_pipelined(new[2:3], k=1, candidates=4)
    assert res["results"][0][0]["index"] == 66
    assert res["results"][0][0]["metadata"] == "new/2"


def test_sample_recall(rng):
    eng, _ = _engine(rng)
    recall = eng.sample_recall(k=10, samples=12)
    assert recall >= 0.9  # tiny perturbation: should nearly always hit


def test_concurrent_add_and_search(rng):
    """Writer lock: append + search hammering must not corrupt results
    (SURVEY.md §5 race-detection contract for the Python index)."""
    eng, x = _engine(rng, n=128, d=16)
    errors = []
    stop = threading.Event()

    def writer():
        r = np.random.RandomState(1)
        for i in range(20):
            v = r.randn(4, 16).astype(np.float32)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            eng.index.add(v)

    def searcher():
        r = np.random.RandomState(2)
        while not stop.is_set():
            res = eng.index.search(x[:4], k=3)
            if (res.indices < -1).any() or (
                res.indices >= eng.index.ntotal + 100
            ).any():
                errors.append("bogus index")
                return

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=searcher) for _ in range(2)
    ]
    for t in threads:
        t.start()
    threads[0].join()
    stop.set()
    for t in threads[1:]:
        t.join()
    assert not errors
    assert eng.index.ntotal == 128 + 80
