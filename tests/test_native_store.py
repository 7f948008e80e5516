"""Native C++ index store: build, roundtrip, scan parity vs the JAX
path, concurrency hammer (SURVEY.md §5 race-detection contract)."""

import os
import threading

import numpy as np
import pytest

pytest.importorskip("ctypes")

from qrag_tpu.index.native_store import (  # noqa: E402
    NativeVectorStore,
    cpu_scan_topk,
    load_library,
)


@pytest.fixture(scope="module", autouse=True)
def built_library():
    load_library()  # builds libqidx.so on demand (g++ in image)


def test_create_append_read(tmp_path, rng):
    path = str(tmp_path / "store.qidx")
    with NativeVectorStore(path, d=32, metric="l2") as store:
        a = rng.randn(10, 32).astype(np.float32)
        b = rng.randn(2000, 32).astype(np.float32)  # forces capacity growth
        assert store.append(a) == 10
        assert store.append(b) == 2010
        assert store.ntotal == 2010 and store.d == 32
        np.testing.assert_array_equal(store.read(0, 10), a)
        np.testing.assert_array_equal(store.read(10), b)


def test_reopen_persists(tmp_path, rng):
    path = str(tmp_path / "p.qidx")
    x = rng.randn(7, 16).astype(np.float32)
    with NativeVectorStore(path, d=16, metric="ip", normalized=True) as s:
        s.append(x)
        s.flush()
    with NativeVectorStore(path, writable=False) as s:
        assert s.ntotal == 7 and s.metric == "ip" and s.normalized
        np.testing.assert_array_equal(s.read(), x)


def test_dim_mismatch_rejected(tmp_path, rng):
    path = str(tmp_path / "d.qidx")
    with NativeVectorStore(path, d=8) as s:
        s.append(rng.randn(2, 8).astype(np.float32))
        with pytest.raises(ValueError):
            s.append(rng.randn(2, 16).astype(np.float32))
    with pytest.raises(OSError):
        NativeVectorStore(path, d=16)  # reopen with wrong d


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_scan_parity_with_jax(tmp_path, rng, metric):
    """C++ heap scan == JAX exact scan, incl. tie order."""
    import jax.numpy as jnp

    from qrag_tpu.ops.topk import flat_scan_topk

    x = rng.randn(500, 24).astype(np.float32)
    q = rng.randn(6, 24).astype(np.float32)
    s_c, i_c = cpu_scan_topk(x, q, 10, metric=metric)
    s_j, i_j = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(x), 10, metric=metric, mode="exact"
    )
    np.testing.assert_array_equal(i_c, np.asarray(i_j))
    np.testing.assert_allclose(s_c, np.asarray(s_j), rtol=1e-4, atol=1e-4)


def test_scan_tie_break_lower_index(rng):
    x = np.repeat(rng.randn(5, 8).astype(np.float32), 4, axis=0)
    q = rng.randn(1, 8).astype(np.float32)
    _, idx = cpu_scan_topk(x, q, 8, metric="ip")
    import jax.numpy as jnp

    from qrag_tpu.ops.topk import ip_topk

    _, idx_j = ip_topk(jnp.asarray(q), jnp.asarray(x), 8)
    np.testing.assert_array_equal(idx, np.asarray(idx_j))


def test_store_scan_topk(tmp_path, rng):
    path = str(tmp_path / "s.qidx")
    x = rng.randn(300, 16).astype(np.float32)
    with NativeVectorStore(path, d=16, metric="l2") as s:
        s.append(x)
        scores, idx = s.scan_topk(x[42], k=3)
        assert idx[0, 0] == 42
        assert scores[0, 0] < 1e-5


def test_k_exceeds_ntotal_padding(tmp_path, rng):
    with NativeVectorStore(str(tmp_path / "k.qidx"), d=8) as s:
        s.append(rng.randn(3, 8).astype(np.float32))
        scores, idx = s.scan_topk(rng.randn(1, 8).astype(np.float32), k=6)
        assert (idx[0, 3:] == -1).all()
        assert np.isinf(scores[0, 3:]).all()


def test_concurrent_append_and_scan(tmp_path, rng):
    """Hammer append+read concurrently: readers must never see torn
    rows (rows are either fully present or not yet published)."""
    path = str(tmp_path / "c.qidx")
    d = 16
    writer_store = NativeVectorStore(path, d=d, metric="ip")
    marker = np.full((1, d), 7.0, np.float32)  # rows have constant value
    writer_store.append(marker)
    stop = threading.Event()
    errors = []

    def writer():
        i = 0
        while not stop.is_set() and i < 300:
            val = float(i % 50) + 1.0
            writer_store.append(np.full((4, d), val, np.float32))
            i += 1

    def reader():
        reader_store = NativeVectorStore(path, writable=False)
        try:
            while not stop.is_set():
                n = reader_store.ntotal
                if n == 0:
                    continue
                rows = reader_store.read(0, n)
                # each row must be constant-valued (never torn)
                if not np.all(rows == rows[:, :1]):
                    errors.append("torn row observed")
                    return
        finally:
            reader_store.close()

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(2)
    ]
    for t in threads:
        t.start()
    threads[0].join()
    stop.set()
    for t in threads[1:]:
        t.join()
    writer_store.close()
    assert not errors


def test_reader_sees_growth_after_open(tmp_path, rng):
    """Regression (round-1 SIGSEGV): a reader opened before the writer
    grows the file must remap, not dereference past its old mapping."""
    path = str(tmp_path / "grow.qidx")
    d = 16
    writer = NativeVectorStore(path, d=d, metric="ip")
    first = rng.randn(1, d).astype(np.float32)
    writer.append(first)
    reader = NativeVectorStore(path, writable=False)
    try:
        np.testing.assert_array_equal(reader.read(0, 1), first)
        # grow well past the initial 1024-row capacity -> ftruncate+remap
        big = rng.randn(5000, d).astype(np.float32)
        writer.append(big)
        assert reader.ntotal == 5001
        got = reader.read(0, 5001)  # segfaulted before the remap fix
        np.testing.assert_array_equal(got[0], first[0])
        np.testing.assert_array_equal(got[1:], big)
        # scan path too: must cover rows beyond the original mapping
        scores, idx = reader.scan_topk(big[4321], k=3)
        all_rows = np.concatenate([first, big])
        s_ref, i_ref = cpu_scan_topk(all_rows, big[4321], 3, metric="ip")
        np.testing.assert_array_equal(idx, i_ref)
        np.testing.assert_allclose(scores, s_ref, rtol=1e-5)
    finally:
        reader.close()
        writer.close()


def test_to_device_index(tmp_path, rng):
    path = str(tmp_path / "dev.qidx")
    x = rng.randn(50, 12).astype(np.float32)
    with NativeVectorStore(path, d=12, metric="l2") as s:
        s.append(x)
        idx = s.to_device_index()
    res = idx.search(x[5], k=1)
    assert res.indices[0, 0] == 5


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_threaded_scan_matches_single_thread(rng, metric):
    """Query-parallel (b >= threads) AND corpus-split (b < threads)
    modes must match the single-thread oracle exactly, tie order
    included."""
    x = rng.randn(20000, 32).astype(np.float32)
    x[1000:1004] = x[999]  # exact ties across a thread boundary region
    # query-parallel mode
    qb = rng.randn(16, 32).astype(np.float32)
    s1, i1 = cpu_scan_topk(x, qb, 10, metric=metric, threads=1)
    s4, i4 = cpu_scan_topk(x, qb, 10, metric=metric, threads=4)
    np.testing.assert_array_equal(i1, i4)
    np.testing.assert_array_equal(s1, s4)
    # corpus-split mode (single query, ties included)
    q1 = x[999:1000] + 0.0
    s1, i1 = cpu_scan_topk(x, q1, 10, metric=metric, threads=1)
    s4, i4 = cpu_scan_topk(x, q1, 10, metric=metric, threads=6)
    np.testing.assert_array_equal(i1, i4)
    np.testing.assert_allclose(s1, s4, rtol=1e-6, atol=1e-6)
    assert i1[0, 0] == 999 if metric == "l2" else True


def test_threaded_scan_k_exceeds_ntotal(rng):
    x = rng.randn(5, 8).astype(np.float32)
    q = rng.randn(1, 8).astype(np.float32)
    s, i = cpu_scan_topk(x, q, 9, metric="ip", threads=3)
    assert (i[0, 5:] == -1).all()
    assert np.isneginf(s[0, 5:]).all()


def test_store_threaded_scan(tmp_path, rng):
    path = str(tmp_path / "mt.qidx")
    x = rng.randn(3000, 16).astype(np.float32)
    with NativeVectorStore(path, d=16, metric="l2") as s:
        s.append(x)
        s1, i1 = s.scan_topk(x[:8], k=5, threads=1)
        s4, i4 = s.scan_topk(x[:8], k=5, threads=4)
        np.testing.assert_array_equal(i1, i4)
        np.testing.assert_array_equal(s1, s4)
        assert (i1[:, 0] == np.arange(8)).all()


def _clustered(rng, n, d, n_centers=8, spread=0.03):
    centers = rng.randn(n_centers, d).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.randint(0, n_centers, n)] + spread * rng.randn(
        n, d
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def test_native_cluster_topk_exact_and_prunes(rng):
    """C++ cluster-pruned exact search (the host twin of
    ops/cluster_topk.py): identical to the C++ exact scan on clustered
    data (zero fallbacks), exact via the ladder on uniform data."""
    from qrag_tpu.index.native_store import (
        build_host_clusters,
        raw_cluster_topk,
        cpu_scan_topk,
    )

    x = _clustered(rng, 20000, 48)
    clusters = build_host_clusters(x, rows_per_cluster=512, iters=5)
    q = _clustered(rng, 16, 48)
    for metric in ("l2", "ip"):
        s, i, stats = raw_cluster_topk(x, clusters, q, 10, metric=metric)
        s0, i0 = cpu_scan_topk(x, q, 10, metric=metric)
        np.testing.assert_array_equal(i, i0)
        np.testing.assert_allclose(s, s0, rtol=1e-6, atol=1e-6)
        assert stats[0] == 0, f"{metric}: fallbacks on clustered data"

    # uniform data defeats the bounds; exactness must survive the
    # escalate/fallback ladder
    xu = rng.randn(5000, 48).astype(np.float32)
    xu /= np.linalg.norm(xu, axis=1, keepdims=True)
    cu = build_host_clusters(xu, rows_per_cluster=512, iters=3)
    qu = rng.randn(4, 48).astype(np.float32)
    s, i, stats = raw_cluster_topk(xu, cu, qu, 10)
    s0, i0 = cpu_scan_topk(xu, qu, 10)
    np.testing.assert_array_equal(i, i0)
    np.testing.assert_allclose(s, s0, rtol=1e-6, atol=1e-6)


def test_native_cluster_topk_ties_and_budget(rng):
    from qrag_tpu.index.native_store import (
        build_host_clusters,
        raw_cluster_topk,
        cpu_scan_topk,
    )

    x = _clustered(rng, 8000, 32)
    dup = x[97].copy()
    for j in (97, 2001, 5003, 7999):
        x[j] = dup
    clusters = build_host_clusters(x, rows_per_cluster=512, iters=4)
    q = (dup + 0.0002 * rng.randn(32)).astype(np.float32)[None, :]
    s, i, stats = raw_cluster_topk(x, clusters, q, 8)
    s0, i0 = cpu_scan_topk(x, q, 8)
    # the C side scores every row with the SAME dot kernel, so ties
    # are bitwise and the lower-index order must match exactly
    np.testing.assert_array_equal(i, i0)
    # starved budget floors at k (S = max(budget, k)); still exact
    s1, i1, st1 = raw_cluster_topk(x, clusters, q, 8, budget=1)
    np.testing.assert_array_equal(i1, i0)

    # mass ties: 40 copies of one vector — k-means sends identical
    # rows to ONE cluster (variable-size clusters dodge the device
    # design's fixed-group birthday collisions entirely), so this
    # certifies cleanly; exactness incl. the 10-lowest-index order
    x2 = _clustered(rng, 8000, 32)
    v = x2[500].copy()
    for j in rng.choice(8000, size=40, replace=False):
        x2[j] = v
    c2 = build_host_clusters(x2, rows_per_cluster=512, iters=4)
    q2 = v[None, :]
    s2, i2, st2 = raw_cluster_topk(x2, c2, q2, 10)
    s20, i20 = cpu_scan_topk(x2, q2, 10)
    np.testing.assert_array_equal(i2, i20)

    # uniform data with G >> S: the bounds prune nothing, tier-1 must
    # fail and the ladder (escalation and/or full scan) must fire —
    # exactness unconditional
    xu = rng.randn(20000, 32).astype(np.float32)
    xu /= np.linalg.norm(xu, axis=1, keepdims=True)
    cu = build_host_clusters(xu, rows_per_cluster=256, iters=2)
    qu = rng.randn(3, 32).astype(np.float32)
    su, iu, stu = raw_cluster_topk(xu, cu, qu, 10)
    su0, iu0 = cpu_scan_topk(xu, qu, 10)
    np.testing.assert_array_equal(iu, iu0)
    assert stu[0] + stu[1] > 0, "uniform data must fire the ladder"


def test_store_cluster_topk(tmp_path, rng):
    """Store-level clustered search: mmap rows in place, cached
    structure invalidates on append."""
    from qrag_tpu.index.native_store import NativeVectorStore

    x = _clustered(rng, 6000, 32)
    store = NativeVectorStore(str(tmp_path / "s.qidx"), d=32, metric="l2")
    store.append(x)
    s, i, stats = store.cluster_topk(x[:3] + 0.001, 5)
    s0, i0 = store.scan_topk(x[:3] + 0.001, 5)
    np.testing.assert_array_equal(i, i0)
    np.testing.assert_allclose(s, s0, rtol=1e-6, atol=1e-6)
    c1 = store.build_clusters()
    assert store.build_clusters() is c1  # cached
    extra = _clustered(rng, 64, 32)
    store.append(extra)
    assert store.build_clusters() is not c1  # append invalidates
    s2, i2, _ = store.cluster_topk(extra[:2], 5)
    s20, i20 = store.scan_topk(extra[:2], 5)
    np.testing.assert_array_equal(i2, i20)


def test_native_cluster_topk_mt_matches_single(rng):
    from qrag_tpu.index.native_store import (
        build_host_clusters,
        raw_cluster_topk,
    )

    x = _clustered(rng, 12000, 32)
    clusters = build_host_clusters(x, rows_per_cluster=512, iters=3)
    q = _clustered(rng, 16, 32)
    s1, i1, st1 = raw_cluster_topk(x, clusters, q, 10, threads=1)
    s4, i4, st4 = raw_cluster_topk(x, clusters, q, 10, threads=4)
    np.testing.assert_array_equal(i1, i4)
    np.testing.assert_array_equal(s1, s4)
    np.testing.assert_array_equal(st1, st4)


def test_store_cluster_topk_empty_store(tmp_path, rng):
    """Empty store: padded -1/inf output (parity with scan_topk), no
    crash in the cluster build."""
    from qrag_tpu.index.native_store import NativeVectorStore

    with NativeVectorStore(str(tmp_path / "e.qidx"), d=16) as s:
        q = rng.randn(2, 16).astype(np.float32)
        sc, i, stats = s.cluster_topk(q, 5)
        assert (i == -1).all()
        assert np.isinf(sc).all()
