"""Pallas fused scan+top-k vs the XLA reference path (interpreter mode
on CPU; same kernel code compiles on TPU).  SURVEY.md §7 phase 2."""

import numpy as np
import pytest
import jax.numpy as jnp

from qrag_tpu.ops.pallas.scan_topk import pallas_scan_topk
from qrag_tpu.ops.topk import ip_topk, l2_topk


@pytest.mark.parametrize("metric", ["l2", "ip"])
@pytest.mark.parametrize(
    "b,n,d,k",
    [
        (4, 300, 64, 10),  # unaligned everything
        (1, 128, 128, 5),  # aligned, single query
        (9, 1000, 48, 7),  # odd batch
    ],
)
def test_pallas_matches_xla(rng, metric, b, n, d, k):
    q = rng.randn(b, d).astype(np.float32)
    x = rng.randn(n, d).astype(np.float32)
    s_p, i_p = pallas_scan_topk(jnp.asarray(q), jnp.asarray(x), k, metric=metric)
    if metric == "l2":
        s_x, i_x = l2_topk(jnp.asarray(q), jnp.asarray(x), k)
    else:
        s_x, i_x = ip_topk(jnp.asarray(q), jnp.asarray(x), k)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=1e-5, atol=1e-5)


def test_pallas_valid_rows_mask(rng):
    q = rng.randn(3, 32).astype(np.float32)
    x = rng.randn(256, 32).astype(np.float32)
    x[200:] = 0.0
    valid = np.zeros(256, bool)
    valid[:200] = True
    s, i = pallas_scan_topk(
        jnp.asarray(q), jnp.asarray(x), 8, metric="l2",
        valid_rows=jnp.asarray(valid),
    )
    assert np.asarray(i).max() < 200
    s_x, i_x = l2_topk(
        jnp.asarray(q), jnp.asarray(x), 8, valid_rows=jnp.asarray(valid)
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_x))


def test_pallas_k_exceeds_real_rows(rng):
    """k larger than the number of valid rows → invalid slots marked."""
    q = rng.randn(2, 16).astype(np.float32)
    x = rng.randn(64, 16).astype(np.float32)
    valid = np.zeros(64, bool)
    valid[:5] = True
    s, i = pallas_scan_topk(
        jnp.asarray(q), jnp.asarray(x), 8, metric="ip",
        valid_rows=jnp.asarray(valid),
    )
    s, i = np.asarray(s), np.asarray(i)
    assert np.all(np.isfinite(s[:, :5]))
    assert np.all(np.isneginf(s[:, 5:]))
    assert set(i[0, :5]) == set(range(5))


def test_pallas_duplicate_scores_tie_break(rng):
    """Duplicate rows: ties resolve to the lower index, like lax.top_k."""
    base = rng.randn(1, 16).astype(np.float32)
    x = np.repeat(rng.randn(10, 16).astype(np.float32), 3, axis=0)  # 30 rows
    s_p, i_p = pallas_scan_topk(jnp.asarray(base), jnp.asarray(x), 6, metric="ip")
    s_x, i_x = ip_topk(jnp.asarray(base), jnp.asarray(x), 6)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))


def test_pallas_through_flat_index(rng):
    """DeviceFlatIndex(use_pallas=True) end-to-end."""
    from qrag_tpu.index.flat_index import DeviceFlatIndex

    x = rng.randn(150, 40).astype(np.float32)
    idx = DeviceFlatIndex.from_numpy(x, metric="l2", use_pallas=True)
    res = idx.search(x[33:34], k=4)
    assert res.indices[0, 0] == 33
    ref = DeviceFlatIndex.from_numpy(x, metric="l2", use_pallas=False)
    ref_res = ref.search(x[33:34], k=4)
    np.testing.assert_array_equal(res.indices, ref_res.indices)
