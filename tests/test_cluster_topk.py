"""Cluster-pruned provably-exact top-k (ops/cluster_topk.py).

Oracle: full f32 goodness + lax.top_k over the ORIGINAL row order
(position tie-break == original-index tie-break), the same contract
every other exact mode in the framework is tested against."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qrag_tpu.ops.cluster_topk import (
    build_clustered_groups,
    cluster_pruned_topk,
)
from qrag_tpu.ops.topk import _goodness


def _oracle(queries, corpus, metric, k):
    g = _goodness(
        jnp.asarray(queries, jnp.float32),
        jnp.asarray(corpus, jnp.float32),
        metric,
        None,
        None,
    )
    return jax.lax.top_k(g, k)


def _clustered_corpus(rng, n, d, n_centers=24, spread=0.05):
    """Mixture of Gaussians on the unit sphere — the geometry real
    embedding corpora have (and the one cluster pruning serves)."""
    centers = rng.randn(n_centers, d).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = rng.randint(0, n_centers, size=n)
    x = centers[which] + spread * rng.randn(n, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def _assert_indices_tie_tolerant(queries, corpus, metric, idx, oi, ov):
    """The framework exactness contract (the bounded-mode test
    convention): identity equals the full-matrix oracle EXCEPT where
    the oracle's values show a sub-noise tie (two f32 evaluation
    orders of the same dot drift ~1e-7 absolute; refine-domain and
    matmul-domain orderings of such ties legitimately differ — e.g. a
    duplicate row scored by the fast einsum on one shard and the
    fallback matmul on another)."""
    if np.array_equal(idx, oi):
        return
    g = np.asarray(
        _goodness(
            jnp.asarray(queries, jnp.float32),
            jnp.asarray(corpus, jnp.float32),
            metric, None, None,
        )
    )
    rows, pos = np.where(idx != oi)
    tol = 3e-4 * (1.0 + np.abs(ov[rows, pos]))
    gap = np.abs(g[rows, idx[rows, pos]] - ov[rows, pos])
    assert (gap <= tol).all(), (
        f"non-tie index mismatch: rows {rows}, pos {pos}, gap {gap}"
    )


def _check_exact(queries, corpus, groups, metric, k, budget=None):
    vals, idx, fb, esc = cluster_pruned_topk(
        jnp.asarray(queries), groups, k, metric=metric, budget=budget
    )
    ov, oi = _oracle(queries, corpus, metric, k)
    idx, oi = np.asarray(idx), np.asarray(oi)
    vals, ov = np.asarray(vals), np.asarray(ov)
    _assert_indices_tie_tolerant(queries, corpus, metric, idx, oi, ov)
    np.testing.assert_allclose(vals, ov, rtol=1e-5, atol=1e-4)
    return bool(np.asarray(fb)), bool(np.asarray(esc))


def test_clustered_corpus_certifies_without_fallback(rng):
    # fewer natural centers than k-means clusters (n/rows_per_cluster
    # = 8 here), so clusters subdivide the mixture and radii reflect
    # real geometry — the regime the accelerator serves
    x = _clustered_corpus(rng, 4096, 64, n_centers=6)
    groups = build_clustered_groups(x, group_rows=128, kmeans_iters=4)
    q = _clustered_corpus(rng, 16, 64, n_centers=6)
    fb, esc = _check_exact(q, x, groups, "l2", 10)
    assert not fb, "clustered geometry must certify without the full scan"


def test_uniform_corpus_still_exact(rng):
    # uniform random on the sphere: radii ~ row norms, bounds prune
    # nothing useful — escalation/fallback must preserve exactness
    x = rng.randn(2048, 48).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    groups = build_clustered_groups(x, group_rows=128, kmeans_iters=2)
    q = rng.randn(8, 48).astype(np.float32)
    _check_exact(q, x, groups, "l2", 10)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_metrics_exact(rng, metric):
    x = _clustered_corpus(rng, 3000, 32)  # non-multiple of group_rows
    groups = build_clustered_groups(x, group_rows=128, kmeans_iters=3)
    q = _clustered_corpus(rng, 9, 32)
    _check_exact(q, x, groups, metric, 7)


def test_duplicate_rows_tie_break_by_original_index(rng):
    x = _clustered_corpus(rng, 1024, 32)
    # plant the same row at scattered ORIGINAL indices; after the
    # build's permutation they land in one cluster's groups, but the
    # returned order must follow the original indices
    dup = x[137].copy()
    for i in (3, 200, 512, 900, 1019):
        x[i] = dup
    groups = build_clustered_groups(x, group_rows=128, kmeans_iters=3)
    q = (dup + 0.001 * rng.randn(32)).astype(np.float32)[None, :]
    q /= np.linalg.norm(q)
    _check_exact(q, x, groups, "l2", 8)


def test_mass_ties_at_threshold(rng):
    """40 exact copies of one vector scattered across the corpus: the
    top-10 are the 10 lowest ORIGINAL indices, every copy's group
    ties at the threshold, and the certificate must refuse to certify
    any selection that could miss one (escalate/fallback, exactness
    unconditional)."""
    x = _clustered_corpus(rng, 4096, 32, n_centers=6)
    v = x[500].copy()
    spots = rng.choice(4096, size=40, replace=False)
    for i in spots:
        x[i] = v
    groups = build_clustered_groups(x, group_rows=128, kmeans_iters=3)
    q = v[None, :]
    _check_exact(q, x, groups, "l2", 10)
    _check_exact(q, x, groups, "ip", 10)


def test_tiny_budget_escalates_then_full_sorts(rng):
    x = _clustered_corpus(rng, 2048, 32, n_centers=4, spread=0.3)
    groups = build_clustered_groups(x, group_rows=128, kmeans_iters=2)
    q = rng.randn(4, 32).astype(np.float32)
    # budget 1 < k guarantees tier-1 failure; exactness must survive
    fb, esc = _check_exact(q, x, groups, "l2", 10, budget=1)
    assert esc, "budget below k must at least escalate"


def test_bf16_store_exact_wrt_stored_rows(rng):
    x = _clustered_corpus(rng, 2048, 64)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    groups = build_clustered_groups(xb, group_rows=128, kmeans_iters=3)
    q = _clustered_corpus(rng, 8, 64)
    # the scoring function is defined on the STORED rows: oracle on
    # the f32 cast of the bf16 store
    _check_exact(q, np.asarray(xb.astype(jnp.float32)), groups, "l2", 10)


def test_bf16_store_master_sqnorms_match_plain_paths(rng):
    """ADVICE r4 (medium): on a bf16 store the accel used to rank by
    stored-row norms while every other l2 path scores with the f32
    MASTER norms — accel-routed batches returned different top-10s
    than the plain path (reproduced: 40/40 slots differed).  With
    ``sqnorms=`` threaded through the build, the accel's refine
    function is the plain paths' refine function and results match;
    the widened norm-gap margin keeps certification sound."""
    x = _clustered_corpus(rng, 4096, 64)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    master_sq = np.sum(x * x, axis=1, dtype=np.float32)
    groups = build_clustered_groups(
        xb, group_rows=128, kmeans_iters=3,
        sqnorms=jnp.asarray(master_sq),
    )
    q = _clustered_corpus(rng, 8, 64)
    vals, idx, fb, esc = cluster_pruned_topk(
        jnp.asarray(q), groups, 10, metric="l2"
    )
    # oracle = the plain paths' scoring function: bf16 stored rows,
    # MASTER f32 sqnorms (flat_index.py:338 semantics)
    q32 = jnp.asarray(q, jnp.float32)
    dots = q32 @ jnp.asarray(xb).astype(jnp.float32).T
    g = (
        2.0 * dots
        - jnp.sum(q32 * q32, axis=1, keepdims=True)
        - jnp.asarray(master_sq)[None, :]
    )
    ov, oi = jax.lax.top_k(g, 10)
    _assert_indices_tie_tolerant(
        q, np.asarray(xb.astype(jnp.float32)), "l2",
        np.asarray(idx), np.asarray(oi), np.asarray(ov),
    )
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ov), rtol=1e-5, atol=1e-4
    )


def test_bf16_index_accel_matches_plain_search(rng):
    """End-to-end reproduction of the ADVICE r4 scenario: a bf16-store
    DeviceFlatIndex must return the SAME top-10 whether the batch
    routes through the clustered accelerator or the plain path."""
    from qrag_tpu.index.flat_index import DeviceFlatIndex

    x = _clustered_corpus(rng, 6144, 64)
    mk = dict(
        metric="l2", store_dtype="bfloat16", cluster_group_rows=128,
        accel_read_cap=0,
    )
    idx_accel = DeviceFlatIndex.from_numpy(
        x, small_batch_accel="clustered", accel_max_batch=8, **mk
    )
    # the comparison path must share the accel's QUERY contract (f32
    # query against the bf16 store + master norms): that's "bounded".
    # The default scan modes round the query to the store dtype first
    # — a separate, documented per-mode score-precision difference.
    idx_plain = DeviceFlatIndex.from_numpy(
        x, small_batch_accel="none", topk_mode="bounded", **mk
    )
    q = _clustered_corpus(rng, 4, 64)
    assert idx_accel._accel_eligible(4, 10)
    ra = idx_accel.search(q, 10)
    rp = idx_plain.search(q, 10)
    np.testing.assert_array_equal(ra.indices, rp.indices)
    np.testing.assert_allclose(ra.scores, rp.scores, rtol=1e-5, atol=1e-4)


def test_budget_covering_all_groups_is_exact(rng):
    x = _clustered_corpus(rng, 1024, 32)
    groups = build_clustered_groups(x, group_rows=128, kmeans_iters=2)
    q = rng.randn(5, 32).astype(np.float32)
    # S >= G: tier-1 scores the whole corpus, cert trivially holds
    _check_exact(q, x, groups, "l2", 10, budget=64)


def test_small_and_empty_corpora_degrade_exactly(rng):
    # below one group: a single sequential group, tier-1 scores
    # everything, results exact
    x = rng.normal(size=(64, 32)).astype(np.float32)
    groups = build_clustered_groups(x, group_rows=128)
    q = rng.normal(size=(2, 32)).astype(np.float32)
    _check_exact(q, x, groups, "l2", 5)
    # empty: well-shaped placeholder, all results invalid, certifies
    # trivially (no phantom fallback counts)
    from qrag_tpu.ops.cluster_topk import empty_groups

    eg = empty_groups(32, 128, jnp.float32)
    vals, idx, fb, esc = cluster_pruned_topk(q, eg, 5)
    assert not bool(np.asarray(fb)) and not bool(np.asarray(esc))
    assert np.all(np.isneginf(np.asarray(vals)))


def test_index_accel_routes_and_counts(rng):
    """DeviceFlatIndex small-batch accelerator: small batches route
    through the clustered exact path (counters move only on its
    escalation/fallback events), large batches keep the normal mode,
    and both agree with the oracle."""
    from qrag_tpu.index.flat_index import DeviceFlatIndex

    x = _clustered_corpus(rng, 6000, 64)
    idx = DeviceFlatIndex.from_numpy(
        x,
        metric="l2",
        topk_mode="verified",
        small_batch_accel="clustered",
        cluster_group_rows=128,
        accel_max_batch=8,
        accel_read_cap=0,  # correctness test: bypass the read guard
    )
    assert idx._accel_eligible(4, 10)
    assert not idx._accel_eligible(9, 10)  # over accel_max_batch
    # the default read cap routes read-heavy shapes to the scan:
    # batch * S * L (4 * 20 * 128 = 10k rows) > 0.5 * 6000
    idx.accel_read_cap = 0.5
    assert not idx._accel_eligible(4, 10)
    assert idx._accel_eligible(1, 10)  # 2.5k <= 3k
    idx.accel_read_cap = 0.0
    q = _clustered_corpus(rng, 4, 64)
    res = idx.search(q, 10)
    ov, oi = _oracle(q, x, "l2", 10)
    np.testing.assert_array_equal(res.indices, np.asarray(oi))
    # structure built once, cached on the snapshot
    assert idx.device_buffers().extras.get("clustered") is not None
    # device-level route (jit-safe path) agrees once built
    sv, si = idx.search_device(jnp.asarray(q), 10)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(oi))
    # appending invalidates the snapshot cache; next search rebuilds
    idx.add(_clustered_corpus(rng, 10, 64))
    res2 = idx.search(q, 10)
    ov2, oi2 = _oracle(
        q, np.asarray(idx.sample_rows(range(idx.ntotal))), "l2", 10
    )
    np.testing.assert_array_equal(res2.indices, np.asarray(oi2))


def test_engine_accel_config_and_stats(rng):
    """Config plumbing: an engine built with small_batch_accel=
    'clustered' warms the structure eagerly and reports the counters
    in /stats."""
    from qrag_tpu.config import QragConfig
    from qrag_tpu.engine import QragEngine
    from qrag_tpu.index.flat_index import DeviceFlatIndex

    cfg = QragConfig.from_dict(
        {
            "embedding": {"provider": "hash", "dim": 64},
            "index": {
                "small_batch_accel": "clustered",
                "cluster_group_rows": 128,
            },
        }
    )
    x = _clustered_corpus(rng, 5000, 64)
    idx = DeviceFlatIndex.from_numpy(
        x,
        metric="l2",
        small_batch_accel=cfg.index.small_batch_accel,
        cluster_group_rows=cfg.index.cluster_group_rows,
        accel_read_cap=0,
    )
    eng = QragEngine(config=cfg, index=idx)
    eng.warmup(batch_sizes=[1], doc_buckets=[8])
    assert idx.device_buffers().extras.get("clustered") is not None
    st = eng.stats()
    assert st["index"]["small_batch_accel"] == "clustered"
    assert "cluster_fallbacks" in st["index"]
    assert "cluster_escalations" in st["index"]


def test_native_roundtrip_persists_permutation(rng, tmp_path, monkeypatch):
    """save_native persists the clustered permutation; load_native
    rebuilds the structure WITHOUT re-running k-means, and search
    stays exact."""
    from qrag_tpu.index.flat_index import DeviceFlatIndex
    import qrag_tpu.ops.cluster_topk as ct

    x = _clustered_corpus(rng, 5000, 64)
    idx = DeviceFlatIndex.from_numpy(
        x, metric="l2", small_batch_accel="clustered",
        cluster_group_rows=128, accel_read_cap=0,
    )
    idx.build_clustered()
    d = str(tmp_path / "native")
    idx.save_native(d)
    assert (tmp_path / "native" / "cluster_assign.npy").exists()

    def boom(*a, **kw):  # noqa: ANN001
        raise AssertionError("k-means must not run on the load path")

    monkeypatch.setattr(ct, "_kmeans_assign", boom)
    idx2 = DeviceFlatIndex.load_native(
        d, small_batch_accel="clustered", cluster_group_rows=128,
        accel_read_cap=0,
    )
    assert idx2._cluster_assign is not None
    q = _clustered_corpus(rng, 4, 64)
    res = idx2.search(q, 10)
    ov, oi = _oracle(q, x, "l2", 10)
    np.testing.assert_array_equal(res.indices, np.asarray(oi))
    # the rebuilt-from-assignment structure must reproduce the
    # original layout exactly (group-labeled assignment round-trip)
    g1 = idx.device_buffers().extras["clustered"]
    g2 = idx2.device_buffers().extras["clustered"]
    np.testing.assert_array_equal(
        np.asarray(g1.orig_idx), np.asarray(g2.orig_idx)
    )
    # mismatched group_rows must NOT adopt the stale assignment
    monkeypatch.undo()
    idx3 = DeviceFlatIndex.load_native(
        d, small_batch_accel="clustered", cluster_group_rows=256
    )
    assert idx3._cluster_assign is None


def test_probe_mode_is_ivf_nprobe(rng):
    """certify=False = FAISS-IVF nprobe semantics: no fallback ever,
    recall governed by the budget; exact on clustered data where the
    budget covers the true groups, and returned scores are exact
    refine-domain evaluations even when recall < 1."""
    x = _clustered_corpus(rng, 4096, 64, n_centers=6)
    groups = build_clustered_groups(x, group_rows=128, kmeans_iters=4)
    q = _clustered_corpus(rng, 8, 64, n_centers=6)
    vals, idx, fb, esc = cluster_pruned_topk(
        jnp.asarray(q), groups, 10, certify=False
    )
    assert not bool(np.asarray(fb)) and not bool(np.asarray(esc))
    ov, oi = _oracle(q, x, "l2", 10)
    oi_n, idx_n = np.asarray(oi), np.asarray(idx)
    # approximate contract: high recall at the auto budget (20 of 32
    # groups here), NOT identity — the session-scoped rng makes the
    # draw order-dependent and probe misses are by design
    hits = np.mean(
        [
            len(set(idx_n[i]) & set(oi_n[i])) / 10.0
            for i in range(len(q))
        ]
    )
    assert hits >= 0.8, f"probe recall collapsed: {hits}"
    # starved budget: recall may drop, but it must NOT fall back and
    # every returned (idx, score) pair must be a true evaluation
    vals1, idx1, fb1, esc1 = cluster_pruned_topk(
        jnp.asarray(q), groups, 10, certify=False, budget=1
    )
    assert not bool(np.asarray(fb1)) and not bool(np.asarray(esc1))
    g = np.asarray(
        _goodness(
            jnp.asarray(q, jnp.float32), jnp.asarray(x, jnp.float32),
            "l2", None, None,
        )
    )
    i1 = np.asarray(idx1)
    v1 = np.asarray(vals1)
    rows, cols = np.nonzero(i1 < x.shape[0])
    np.testing.assert_allclose(
        v1[rows, cols], g[rows, i1[rows, cols]], rtol=1e-5, atol=1e-4
    )


def test_index_probe_mode_routes(rng):
    """clustered_probe through the index: APPROXIMATE by contract —
    assert what it promises (never falls back, returned scores are
    true evaluations, recall governed by the budget), not oracle
    identity (the session-scoped rng makes corpora order-dependent,
    and a probe miss on a marginally-clustered draw is by design)."""
    from qrag_tpu.index.flat_index import DeviceFlatIndex

    x = _clustered_corpus(rng, 5000, 64, n_centers=6)
    idx = DeviceFlatIndex.from_numpy(
        x, metric="l2", small_batch_accel="clustered_probe",
        cluster_group_rows=128, accel_read_cap=0,
    )
    q = _clustered_corpus(rng, 4, 64, n_centers=6)
    res = idx.search(q, 10)
    assert idx.cluster_fallbacks == 0 and idx.cluster_escalations == 0
    ov, oi = _oracle(q, x, "l2", 10)
    oi = np.asarray(oi)
    # recall floor: the auto budget covers 20 of ~40 groups on a
    # 6-center mixture — well over half the true top-10 per query
    hits = np.mean(
        [
            len(set(res.indices[i]) & set(oi[i])) / 10.0
            for i in range(len(q))
        ]
    )
    assert hits >= 0.6, f"probe recall collapsed: {hits}"
    # every returned (idx, score) pair is a true refine-domain value
    g = np.asarray(
        _goodness(
            jnp.asarray(q, jnp.float32), jnp.asarray(x, jnp.float32),
            "l2", None, None,
        )
    )
    rows, cols = np.nonzero(res.indices >= 0)
    np.testing.assert_allclose(
        -res.scores[rows, cols],
        g[rows, res.indices[rows, cols]],
        rtol=1e-5, atol=1e-4,
    )


def test_batcher_coalesced_requests_route_accel(rng):
    """Serving batcher + accel: concurrent small /search requests
    coalesce into one device batch that still routes through the
    clustered exact path (bucketed batch <= accel_max_batch), results
    equal the oracle per request."""
    import threading

    from qrag_tpu.config import QragConfig
    from qrag_tpu.engine import QragEngine
    from qrag_tpu.index.flat_index import DeviceFlatIndex
    from qrag_tpu.serving.batcher import SearchBatcher

    cfg = QragConfig.from_dict({"embedding": {"provider": "hash", "dim": 64}})
    x = _clustered_corpus(rng, 5000, 64)
    idx = DeviceFlatIndex.from_numpy(
        x, metric="l2", metadata=[f"m/{i}" for i in range(5000)],
        small_batch_accel="clustered", cluster_group_rows=128,
        accel_read_cap=0,
    )
    eng = QragEngine(config=cfg, index=idx)
    idx.build_clustered()
    batcher = SearchBatcher(eng, max_wait_s=0.05)
    try:
        qs = [x[i : i + 1] + 0.001 for i in (7, 312, 4999)]
        results = [None] * len(qs)

        def worker(i):
            results[i] = batcher.search(qs[i], k=5)

        ts = [
            threading.Thread(target=worker, args=(i,))
            for i in range(len(qs))
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        for i, q in enumerate(qs):
            ov, oi = _oracle(q, x, "l2", 5)
            np.testing.assert_array_equal(
                results[i].indices, np.asarray(oi)
            )
    finally:
        batcher.close()


@pytest.fixture(scope="module")
def mesh8():
    from qrag_tpu.config import MeshConfig
    from qrag_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(MeshConfig(data_parallel=2, model_parallel=4))


def test_sharded_accel_exact_and_counted(mesh8, rng):
    """Sharded clustered accelerator: per-shard pruning + exact merge
    equals the oracle; counters surface; large batches keep the
    normal sharded path."""
    from qrag_tpu.parallel import ShardedFlatIndex

    x = _clustered_corpus(rng, 20000, 64)
    # duplicates across shards: tie order must follow global index
    dup = x[17].copy()
    for i in (17, 6001, 12003, 19997):
        x[i] = dup
    idx = ShardedFlatIndex(
        x,
        mesh8,
        metric="l2",
        metadata=[f"m{i}" for i in range(20000)],
        small_batch_accel="clustered",
        cluster_group_rows=128,
        accel_max_batch=8,
        accel_read_cap=0,  # small-scale correctness test
    )
    assert idx._accel_eligible(4, 10)
    q = np.concatenate(
        [
            _clustered_corpus(rng, 3, 64),
            (dup + 0.0005 * rng.randn(64)).astype(np.float32)[None, :],
        ]
    )
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    res = idx.search(q, 10)
    ov, oi = _oracle(q, x, "l2", 10)
    _assert_indices_tie_tolerant(
        q, x, "l2", res.indices, np.asarray(oi), np.asarray(ov)
    )
    assert res.metadata[0][0] == f"m{res.indices[0, 0]}"
    # counters are ints and the structure is cached
    assert isinstance(idx.cluster_fallbacks, int)
    s1 = idx._accel_struct
    idx.search(q, 10)
    assert idx._accel_struct is s1
    # beyond accel_max_batch: normal sharded path, same oracle
    qb = np.repeat(q, 4, axis=0)
    res_b = idx.search(qb, 10)
    ovb, oib = _oracle(qb, x, "l2", 10)
    _assert_indices_tie_tolerant(
        qb, x, "l2", res_b.indices, np.asarray(oib), np.asarray(ovb)
    )
    # append invalidates; next small search rebuilds and stays exact
    extra = _clustered_corpus(rng, 50, 64)
    idx.add(extra, [f"m{20000+i}" for i in range(50)])
    x2 = np.concatenate([x, extra])
    res2 = idx.search(q, 10)
    ov2, oi2 = _oracle(q, x2, "l2", 10)
    _assert_indices_tie_tolerant(
        q, x2, "l2", res2.indices, np.asarray(oi2), np.asarray(ov2)
    )


def test_sharded_accel_tiny_budget_still_exact(mesh8, rng):
    from qrag_tpu.parallel import ShardedFlatIndex

    x = _clustered_corpus(rng, 20000, 64, n_centers=4, spread=0.3)
    idx = ShardedFlatIndex(
        x, mesh8, metric="l2",
        small_batch_accel="clustered",
        cluster_group_rows=128,
        cluster_budget=1,  # < k: tier-1 must fail; exactness survives
        accel_read_cap=0,
    )
    q = rng.randn(2, 64).astype(np.float32)
    res = idx.search(q, 10)
    ov, oi = _oracle(q, x, "l2", 10)
    _assert_indices_tie_tolerant(
        q, x, "l2", res.indices, np.asarray(oi), np.asarray(ov)
    )
    assert idx.cluster_escalations > 0 or idx.cluster_fallbacks > 0


def test_build_shapes_and_permutation_integrity(rng):
    x = _clustered_corpus(rng, 1000, 32)
    groups = build_clustered_groups(x, group_rows=128, kmeans_iters=2)
    n_pad = groups.corpus_p.shape[0]
    assert n_pad % (128 * 16) == 0  # fallback chunking invariant
    oid = np.asarray(groups.orig_idx)
    valid = np.asarray(groups.valid_p)
    assert valid.sum() == 1000
    # the valid original indices are a permutation of range(n)
    assert sorted(oid[valid].tolist()) == list(range(1000))
    # permuted rows match the original rows they claim to be
    np.testing.assert_array_equal(
        np.asarray(groups.corpus_p)[valid], x[oid[valid]]
    )


def test_sharded_accel_ip_metric(mesh8, rng):
    from qrag_tpu.parallel import ShardedFlatIndex

    x = _clustered_corpus(rng, 20000, 64)
    idx = ShardedFlatIndex(
        x, mesh8, metric="ip",
        small_batch_accel="clustered",
        cluster_group_rows=128,
        accel_read_cap=0,
    )
    q = _clustered_corpus(rng, 4, 64)
    res = idx.search(q, 10)
    ov, oi = _oracle(q, x, "ip", 10)
    _assert_indices_tie_tolerant(
        q, x, "ip", res.indices, np.asarray(oi), np.asarray(ov)
    )
    np.testing.assert_allclose(
        res.scores, np.asarray(ov), rtol=1e-5, atol=1e-4
    )


def test_fused_search_rerank_uses_accel_candidates(rng):
    """search_rerank at small batch routes candidate generation
    through the clustered accel IN-GRAPH; results must match the same
    engine with the accelerator off (same candidate set -> same
    rerank), and the quantum rerank semantics are untouched."""
    from qrag_tpu.config import QragConfig
    from qrag_tpu.engine import QragEngine
    from qrag_tpu.index.flat_index import DeviceFlatIndex

    cfg = QragConfig.from_dict({"embedding": {"provider": "hash", "dim": 64}})
    x = _clustered_corpus(rng, 6000, 64, n_centers=6)
    meta = [f"m/{i}" for i in range(6000)]
    accel_idx = DeviceFlatIndex.from_numpy(
        x, metric="l2", metadata=meta,
        small_batch_accel="clustered", cluster_group_rows=128,
        accel_read_cap=0,
    )
    plain_idx = DeviceFlatIndex.from_numpy(x, metric="l2", metadata=meta)
    eng_a = QragEngine(config=cfg, index=accel_idx)
    eng_p = QragEngine(config=cfg, index=plain_idx)
    accel_idx.build_clustered()

    mode, kw = eng_a._fused_candidate_mode(16, batch=1)
    assert mode == "clustered" and "cluster_bufs" in kw
    # beyond accel_max_batch the normal mode returns
    mode_b, _ = eng_a._fused_candidate_mode(16, batch=64)
    assert mode_b != "clustered"

    q = x[17:18] + 0.001
    out_a = eng_a.search_rerank(q, k=5, candidates=16)
    out_p = eng_p.search_rerank(q, k=5, candidates=16)
    ids_a = [h["index"] for h in out_a["results"][0]]
    ids_p = [h["index"] for h in out_p["results"][0]]
    assert ids_a == ids_p, (ids_a, ids_p)


def test_build_clustered_pins_to_explicit_snapshot(rng):
    """build_clustered(snap=...) sizes off the SNAPSHOT's rows: a
    concurrent append (newer self.ntotal) must neither leak capacity
    padding into the structure nor surface rows the snapshot's matrix
    cannot gather."""
    from qrag_tpu.index.flat_index import DeviceFlatIndex

    x = _clustered_corpus(rng, 5000, 64, n_centers=6)
    idx = DeviceFlatIndex.from_numpy(
        x, metric="l2", small_batch_accel="clustered",
        cluster_group_rows=128, accel_read_cap=0,
    )
    snap_old = idx.device_buffers()
    idx.add(_clustered_corpus(rng, 200, 64))  # publishes a new gen
    groups = idx.build_clustered(snap=snap_old)
    oid = np.asarray(groups.orig_idx)
    valid = np.asarray(groups.valid_p)
    assert valid.sum() == 5000  # old snapshot's rows only
    assert oid[valid].max() < 5000
