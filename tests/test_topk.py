"""Exact scan+top-k vs NumPy oracles (SURVEY.md §4.1: top-k kernel vs
np.argpartition; L2-vs-cosine order equivalence on unit vectors)."""

import numpy as np
import jax.numpy as jnp

from qrag_tpu.ops.topk import flat_scan_topk, ip_topk, l2_topk


def _np_l2_topk(q, x, k):
    d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def _np_ip_topk(q, x, k):
    s = q @ x.T
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def test_l2_topk_matches_numpy(rng):
    q = rng.randn(4, 64).astype(np.float32)
    x = rng.randn(200, 64).astype(np.float32)
    d, i = l2_topk(jnp.asarray(q), jnp.asarray(x), 10)
    dn, in_ = _np_l2_topk(q, x, 10)
    np.testing.assert_array_equal(np.asarray(i), in_)
    np.testing.assert_allclose(np.asarray(d), dn, rtol=1e-4, atol=1e-4)


def test_ip_topk_matches_numpy(rng):
    q = rng.randn(4, 64).astype(np.float32)
    x = rng.randn(200, 64).astype(np.float32)
    s, i = ip_topk(jnp.asarray(q), jnp.asarray(x), 10)
    sn, in_ = _np_ip_topk(q, x, 10)
    np.testing.assert_array_equal(np.asarray(i), in_)
    np.testing.assert_allclose(np.asarray(s), sn, rtol=1e-4, atol=1e-4)


def test_l2_equals_ip_order_on_unit_vectors(rng):
    """d^2 = 2 - 2*ip on unit vectors, so orderings must coincide
    (the hard-part-4 requirement, SURVEY.md §7)."""
    q = rng.randn(3, 32).astype(np.float32)
    x = rng.randn(500, 32).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    _, i_l2 = l2_topk(jnp.asarray(q), jnp.asarray(x), 10)
    _, i_ip = ip_topk(jnp.asarray(q), jnp.asarray(x), 10)
    np.testing.assert_array_equal(np.asarray(i_l2), np.asarray(i_ip))


def test_valid_rows_masking(rng):
    """Padded corpus rows must never appear in results."""
    q = rng.randn(2, 16).astype(np.float32)
    x = rng.randn(64, 16).astype(np.float32)
    x[40:] = 0.0  # padding rows (would otherwise win L2 for some queries)
    valid = np.zeros(64, dtype=bool)
    valid[:40] = True
    d, i = l2_topk(jnp.asarray(q), jnp.asarray(x), 10, valid_rows=jnp.asarray(valid))
    assert np.asarray(i).max() < 40
    s, j = ip_topk(jnp.asarray(q), jnp.asarray(x), 10, valid_rows=jnp.asarray(valid))
    assert np.asarray(j).max() < 40


def test_flat_scan_topk_dispatch(rng):
    q = rng.randn(2, 16).astype(np.float32)
    x = rng.randn(50, 16).astype(np.float32)
    d, i = flat_scan_topk(jnp.asarray(q), jnp.asarray(x), 5, metric="l2")
    dn, in_ = _np_l2_topk(q, x, 5)
    np.testing.assert_array_equal(np.asarray(i), in_)
