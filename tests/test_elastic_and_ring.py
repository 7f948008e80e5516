"""Ring top-k merge + elastic recovery + amplitude encoding + routed
fused rerank (SURVEY.md §2 EP/ring rows, §5 failure detection)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qrag_tpu.config import MeshConfig, QragConfig
from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.parallel import ShardedFlatIndex, make_mesh
from qrag_tpu.parallel.elastic import ElasticShardedIndex


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(MeshConfig(data_parallel=2, model_parallel=4))


# ------------------------------------------------------------------ ring


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_ring_merge_matches_allgather(mesh8, metric, rng):
    x = rng.randn(2000, 48).astype(np.float32)
    q = rng.randn(6, 48).astype(np.float32)
    ring = ShardedFlatIndex(x, mesh8, metric=metric, topk_mode="exact", merge="ring")
    ag = ShardedFlatIndex(x, mesh8, metric=metric, topk_mode="exact", merge="allgather")
    r_ring = ring.search(q, k=10)
    r_ag = ag.search(q, k=10)
    np.testing.assert_array_equal(r_ring.indices, r_ag.indices)
    np.testing.assert_allclose(r_ring.scores, r_ag.scores, rtol=1e-5, atol=1e-5)


def test_ring_merge_tie_break(mesh8, rng):
    base = rng.randn(8, 16).astype(np.float32)
    x = np.tile(base, (128, 1))  # duplicates spread across all shards
    q = rng.randn(2, 16).astype(np.float32)
    ring = ShardedFlatIndex(x, mesh8, metric="ip", topk_mode="exact", merge="ring")
    single = DeviceFlatIndex.from_numpy(x, metric="ip", topk_mode="exact")
    np.testing.assert_array_equal(
        ring.search(q, k=6).indices, single.search(q, k=6).indices
    )


# --------------------------------------------------------------- elastic


def test_elastic_reshard_smaller_mesh(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    x = rng.randn(1000, 32).astype(np.float32)
    idx = ElasticShardedIndex(x, topk_mode="exact")
    q = rng.randn(4, 32).astype(np.float32)
    before = idx.search(q, k=5)
    assert idx.probe()
    idx.remove_devices(idx.devices[4:])  # lose half the pod
    after = idx.search(q, k=5)
    np.testing.assert_array_equal(before.indices, after.indices)
    assert idx.rebuilds == 1


def test_elastic_transient_failure_keeps_capacity(rng):
    """A one-shot failure with a HEALTHY mesh is transient: recovery
    retries without evicting anyone (VERDICT r2 #4 — the old code
    threw away a healthy tail device here)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    x = rng.randn(500, 16).astype(np.float32)
    idx = ElasticShardedIndex(x, topk_mode="exact")
    n_dev = len(idx.devices)
    q = x[3:4]

    def boom():
        raise RuntimeError("simulated transient failure")

    idx.inject_search_failure(boom)
    res = idx.search(q, k=3)  # recovery path: retry, no eviction
    assert res.indices[0, 0] == 3
    assert idx.rebuilds == 0
    assert len(idx.devices) == n_dev


def test_elastic_localizes_specific_dead_device(rng):
    """A persistently-dead device (fails searches AND its own probe)
    is localized by per-device probes and EXACTLY it leaves the mesh:
    one rebuild, healthy devices kept, results unchanged."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    x = rng.randn(900, 16).astype(np.float32)
    idx = ElasticShardedIndex(x, topk_mode="exact")
    q = rng.randn(3, 16).astype(np.float32)
    before = idx.search(q, k=5)
    victim = idx.devices[2]  # NOT the tail — the old heuristic would
    survivors_expected = [d for d in idx.devices if d != victim]

    idx.inject_device_failure(victim)
    after = idx.search(q, k=5)

    assert idx.rebuilds == 1  # exactly one re-shard
    assert victim not in idx.devices
    assert idx.devices == survivors_expected  # only the dead one left
    np.testing.assert_array_equal(before.indices, after.indices)
    np.testing.assert_allclose(before.scores, after.scores, rtol=1e-5)


def test_elastic_localizes_multiple_dead_devices(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    x = rng.randn(600, 16).astype(np.float32)
    idx = ElasticShardedIndex(x, topk_mode="exact")
    q = x[7:9]
    bad = [idx.devices[1], idx.devices[5]]
    for d in bad:
        idx.inject_device_failure(d)
    res = idx.search(q, k=2)
    assert res.indices[0, 0] == 7
    assert idx.rebuilds == 1  # both evicted in ONE rebuild
    assert all(d not in idx.devices for d in bad)
    assert len(idx.devices) == 6


def test_probe_device_reports_health(rng):
    x = rng.randn(64, 8).astype(np.float32)
    idx = ElasticShardedIndex(x, topk_mode="exact")
    assert all(idx.probe_device(d) for d in idx.devices)
    idx.inject_device_failure(idx.devices[0])
    assert not idx.probe_device(idx.devices[0])
    assert idx.localize_failures() == [idx.devices[0]]


def test_probe_deadline_on_hung_device(rng, monkeypatch):
    """A HUNG device call (not an erroring one) must not hang the
    prober: the deadline abandons the stuck daemon thread and reports
    unhealthy on schedule (review finding r3: ThreadPoolExecutor's
    context manager joined the stuck worker, deadlocking probe)."""
    import time

    import qrag_tpu.parallel.elastic as elastic_mod

    x = rng.randn(64, 8).astype(np.float32)
    idx = ElasticShardedIndex(x, topk_mode="exact")
    idx.probe_timeout_s = 0.2

    hang = lambda *a, **k: time.sleep(60)  # noqa: E731
    monkeypatch.setattr(elastic_mod.jax, "device_put", hang)
    t0 = time.monotonic()
    assert not idx.probe_device(idx.devices[0])
    assert not idx.probe()
    assert time.monotonic() - t0 < 5.0  # returned on deadline, not after 60s


def test_hung_probe_threads_bounded(rng):
    """VERDICT r3 weak #8: hammering probes at a persistently HUNG
    device must not accumulate one abandoned thread per attempt — at
    most one live abandoned thread per probe target (a target whose
    previous probe is still hung reports unhealthy immediately)."""
    import threading

    x = rng.randn(64, 8).astype(np.float32)
    idx = ElasticShardedIndex(
        x, topk_mode="exact", probe_timeout_s=0.05, probe_cache_ttl_s=0.0
    )
    victim = idx.devices[0]
    idx.inject_device_hang(victim, 1.5)
    n_before = threading.active_count()
    for _ in range(30):
        assert not idx.probe_device(victim)
    assert idx.leaked_probe_threads <= 1  # one abandoned thread, not 30
    assert threading.active_count() <= n_before + 2
    assert idx.layout()["leaked_probe_threads"] <= 1  # /stats surface
    # healthy devices still probe fine while the victim hangs
    assert idx.probe_device(idx.devices[1])


def test_unhealthy_probe_verdict_ttl_cached(rng):
    """ADVICE r3: an unhealthy device verdict is TTL-cached, so
    repeated recovery attempts don't serially re-pay the probe
    deadline per already-known-dead device."""
    import time

    x = rng.randn(64, 8).astype(np.float32)
    idx = ElasticShardedIndex(
        x, topk_mode="exact", probe_timeout_s=0.1, probe_cache_ttl_s=30.0
    )
    victim = idx.devices[0]
    idx.inject_device_hang(victim, 0.5)
    assert not idx.probe_device(victim)  # pays the deadline once
    t0 = time.monotonic()
    for _ in range(20):
        assert not idx.probe_device(victim)
    assert time.monotonic() - t0 < 0.1  # cache hits — no re-probe
    # eviction clears the cache entry for the gone device
    idx.remove_devices([victim])
    assert victim not in idx._probe_verdicts


def test_elastic_no_devices_left(rng):
    x = rng.randn(100, 8).astype(np.float32)
    idx = ElasticShardedIndex(x, devices=jax.devices()[:1], topk_mode="exact")
    with pytest.raises(RuntimeError):
        idx.remove_devices(idx.devices)


# ------------------------------------------------------ amplitude encoding


def test_amplitude_fidelity_is_squared_cosine(rng):
    from qrag_tpu.ops.statevector import amplitude_fidelity

    n_qubits = 4
    q = rng.randn(16).astype(np.float32)
    d = rng.randn(8, 16).astype(np.float32)
    got = np.asarray(amplitude_fidelity(jnp.asarray(q), jnp.asarray(d), n_qubits))
    qn = q / np.linalg.norm(q)
    dn = d / np.linalg.norm(d, axis=1, keepdims=True)
    want = (dn @ qn) ** 2
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_amplitude_pads_and_truncates(rng):
    from qrag_tpu.ops.statevector import amplitude_encode

    n_qubits = 3  # dim 8
    short = np.asarray(amplitude_encode(jnp.asarray(rng.randn(5).astype(np.float32)), n_qubits))
    assert short.shape == (8,) and abs(np.linalg.norm(short) - 1) < 1e-6
    assert np.all(short[5:] == 0)
    long = np.asarray(amplitude_encode(jnp.asarray(rng.randn(20).astype(np.float32)), n_qubits))
    assert long.shape == (8,) and abs(np.linalg.norm(long) - 1) < 1e-6


def test_swap_test_probability_range(rng):
    from qrag_tpu.ops.statevector import swap_test_probability

    p = np.asarray(
        swap_test_probability(
            jnp.asarray(rng.randn(16).astype(np.float32)),
            jnp.asarray(rng.randn(8, 16).astype(np.float32)),
            4,
        )
    )
    assert np.all((p >= 0.5 - 1e-6) & (p <= 1.0 + 1e-6))
    v = rng.randn(16).astype(np.float32)
    p_same = float(
        swap_test_probability(jnp.asarray(v), jnp.asarray(v)[None, :], 4)[0]
    )
    assert abs(p_same - 1.0) < 1e-6


def test_quantum_reranker_amplitude_mode():
    from qrag_tpu.config import QuantumConfig
    from qrag_tpu.documents import Document
    from qrag_tpu.reranker.quantum import QuantumReranker

    rr = QuantumReranker(QuantumConfig(n_qubits=3, encoding="amplitude"))
    docs = [Document(str(i), f"text {i}") for i in range(5)]
    out = rr.rerank("query", docs, top_k=3)
    assert len(out) == 3
    assert all(0 <= s <= 1 + 1e-6 for _, s in out)


# ------------------------------------------------------ routed fused rerank


def test_routed_search_rerank_auto(rng):
    from qrag_tpu.engine import QragEngine

    cfg = QragConfig.from_dict({"embedding": {"provider": "hash", "dim": 32}})
    x = rng.randn(300, 32).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    eng = QragEngine(
        config=cfg, index=DeviceFlatIndex.from_numpy(x, topk_mode="exact")
    )
    # two queries: one routes quantum (keyword), one classical (short)
    out = eng.search_rerank(
        ["find the sponsor ads", "hello"], k=5, candidates=20,
        reranker_type="auto",
    )
    assert out["reranker_used"] == "auto"
    assert len(out["results"]) == 2
    # classical-routed row should equal pure-cosine scoring of candidates
    q_vec = eng.embedder(["hello"])[0]
    d2 = ((x - q_vec) ** 2).sum(-1)
    cand = np.argsort(d2, kind="stable")[:20]
    qn = q_vec / np.linalg.norm(q_vec)
    cos = (x[cand] / np.linalg.norm(x[cand], axis=1, keepdims=True)) @ qn
    want = cand[np.argsort(-cos, kind="stable")[:5]]
    got = [h["index"] for h in out["results"][1]]
    assert set(got) == set(int(i) for i in want)
