"""approx / verified top-k modes vs the exact path."""

import numpy as np
import jax.numpy as jnp

from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.ops.topk import (
    flat_scan_topk,
    goodness_topk,
    scan_topk_verified,
)


def test_goodness_topk_small_n_uses_exact(rng):
    g = jnp.asarray(rng.randn(4, 100).astype(np.float32))
    va, ia = goodness_topk(g, 5, mode="approx")
    ve, ie = goodness_topk(g, 5, mode="exact")
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ie))


def test_verified_scan_matches_exact_values(rng):
    q = rng.randn(16, 64).astype(np.float32)
    x = rng.randn(8192, 64).astype(np.float32)
    s_v, i_v, n_bad = scan_topk_verified(
        jnp.asarray(q), jnp.asarray(x), 10, metric="l2"
    )
    s_e, i_e = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(x), 10, metric="l2", mode="exact"
    )
    # verified guarantees exact score VALUES (tie order may differ)
    np.testing.assert_allclose(s_v, np.asarray(s_e), rtol=1e-5, atol=1e-5)
    assert n_bad >= 0
    # and with float scores ties are absent → indices match too
    np.testing.assert_array_equal(i_v, np.asarray(i_e))


def test_verified_scan_ip(rng):
    q = rng.randn(8, 32).astype(np.float32)
    x = rng.randn(8192, 32).astype(np.float32)
    s_v, i_v, _ = scan_topk_verified(jnp.asarray(q), jnp.asarray(x), 7, metric="ip")
    s_e, i_e = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(x), 7, metric="ip", mode="exact"
    )
    np.testing.assert_allclose(s_v, np.asarray(s_e), rtol=1e-5)
    np.testing.assert_array_equal(i_v, np.asarray(i_e))


def test_verified_fallback_fires_on_adversarial_input(rng):
    """A corpus where many near-ties cluster inside one approx window
    can defeat the approx pass; verified mode must still return exact
    values via its fallback."""
    q = np.zeros((4, 16), np.float32)
    q[:, 0] = 1.0
    x = rng.randn(8192, 16).astype(np.float32) * 0.01
    # plant the true top-10 adjacent to each other (same windows)
    for j in range(10):
        x[4000 + j] = 0.0
        x[4000 + j, 0] = 1.0 - 1e-4 * j
    s_v, i_v, n_bad = scan_topk_verified(
        jnp.asarray(q), jnp.asarray(x), 10, metric="ip"
    )
    s_e, i_e = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(x), 10, metric="ip", mode="exact"
    )
    np.testing.assert_allclose(s_v, np.asarray(s_e), rtol=1e-6)
    np.testing.assert_array_equal(i_v, np.asarray(i_e))


def test_index_modes_agree(rng):
    x = rng.randn(9000, 48).astype(np.float32)
    q = x[123:127] + 0.001 * rng.randn(4, 48).astype(np.float32)
    exact = DeviceFlatIndex.from_numpy(x, topk_mode="exact")
    verified = DeviceFlatIndex.from_numpy(x, topk_mode="verified")
    r_e = exact.search(q, k=10)
    r_v = verified.search(q, k=10)
    np.testing.assert_allclose(r_v.scores, r_e.scores, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(r_v.indices, r_e.indices)


def test_bf16_store_dtype_search(rng):
    x = rng.randn(2000, 64).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = DeviceFlatIndex.from_numpy(x, store_dtype="bfloat16")
    res = idx.search(x[7:8], k=3)
    assert res.indices[0, 0] == 7
    assert res.scores[0, 0] < 1e-2  # bf16 noise floor


def test_verified_fallback_writable_patch(rng, monkeypatch):
    """Regression (review finding 1): the exact-fallback patch-up must
    write into a WRITABLE copy — force the certificate to fail."""
    import qrag_tpu.ops.topk as topk_mod

    q = rng.randn(4, 32).astype(np.float32)
    x = rng.randn(8192, 32).astype(np.float32)

    orig = topk_mod._scan_topk_device

    def sabotage(queries, corpus, sqnorms, valid, k, metric, mode, o, rt):
        vals, idx, ok = orig(
            queries, corpus, sqnorms, valid, k, metric, mode, o, rt
        )
        if mode == "verified":
            # pretend the approx pass missed rows 1 and 3
            import jax.numpy as jnp

            ok = jnp.asarray([True, False, True, False])
            vals = vals.at[1].set(vals[1] - 1.0)  # corrupt those rows
            idx = idx.at[3].set(0)
        return vals, idx, ok

    monkeypatch.setattr(topk_mod, "_scan_topk_device", sabotage)
    s_v, i_v, n_bad = topk_mod.scan_topk_verified(
        jnp.asarray(q), jnp.asarray(x), 5, metric="ip"
    )
    assert n_bad == 2
    monkeypatch.setattr(topk_mod, "_scan_topk_device", orig)
    s_e, i_e = topk_mod.flat_scan_topk(
        jnp.asarray(q), jnp.asarray(x), 5, metric="ip", mode="exact"
    )
    np.testing.assert_array_equal(i_v, np.asarray(i_e))
    np.testing.assert_allclose(s_v, np.asarray(s_e), rtol=1e-5)


def test_refined_mode_exact_scores(rng):
    """'refined' returns exact score values (bf16 only in selection)."""
    q = rng.randn(8, 48).astype(np.float32)
    x = rng.randn(8192, 48).astype(np.float32)
    s_r, i_r = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(x), 10, metric="l2", mode="refined"
    )
    s_e, i_e = flat_scan_topk(
        jnp.asarray(q), jnp.asarray(x), 10, metric="l2", mode="exact"
    )
    # recall high on random data; agreeing positions carry EXACT scores
    agree = np.asarray(i_r) == np.asarray(i_e)
    assert agree.mean() > 0.9
    np.testing.assert_allclose(
        np.asarray(s_r)[agree], np.asarray(s_e)[agree], rtol=1e-5, atol=1e-5
    )


def test_refined_mode_through_index(rng):
    x = rng.randn(5000, 32).astype(np.float32)
    idx = DeviceFlatIndex.from_numpy(x, topk_mode="refined")
    res = idx.search(x[99:100], k=3)
    assert res.indices[0, 0] == 99
    assert res.scores[0, 0] < 1e-4


def test_verified_jit_mode(rng):
    """scan_topk_verified_jit: exact values/indices, usable inside a
    jit'd scan (the host verified path cannot be), fallback count
    exposed."""
    import functools

    import jax
    import jax.numpy as jnp

    from qrag_tpu.ops.topk import l2_topk, scan_topk_verified_jit

    x = rng.randn(6000, 32).astype(np.float32)
    q = rng.randn(8, 32).astype(np.float32)
    sq = np.sum(x * x, axis=1)
    vals, idx, n_bad = scan_topk_verified_jit(
        jnp.asarray(q), jnp.asarray(x), 5, metric="l2",
        corpus_sqnorms=jnp.asarray(sq),
    )
    want_v, want_i = l2_topk(jnp.asarray(q), jnp.asarray(x), 5,
                             corpus_sqnorms=jnp.asarray(sq))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(want_v), rtol=1e-5, atol=1e-5
    )
    assert int(np.asarray(n_bad)) == 0

    # inside a jit'd scan (the bench loop shape)
    @functools.partial(jax.jit, static_argnames=("k", "iters"))
    def loop(queries, corpus, sqn, k, iters):
        def body(carry, _):
            v, i, nb = scan_topk_verified_jit(
                carry, corpus, k, metric="l2", corpus_sqnorms=sqn
            )
            return carry + (1e-9 * v[:, :1]).astype(carry.dtype), nb

        _, nbs = jax.lax.scan(body, queries, None, length=iters)
        return nbs.sum()

    total_bad = loop(jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), 5, 3)
    assert int(np.asarray(total_bad)) == 0
