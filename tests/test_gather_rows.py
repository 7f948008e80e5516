"""Pallas DMA row-gather kernel (ops/pallas/gather_rows.py).

Correctness runs in interpret mode everywhere.  On the current axon
TPU toolchain the kernel does NOT compile: any DYNAMIC-INDEX async
copy (``corpus_ref.at[row]`` with a runtime row) crashes the remote
AOT compile helper (tpu_compile_helper exit 1), in every variant —
fori_loop, unrolled, python-unrolled, rank-1/rank-2 slices, ANY/HBM
spaces — while static-index DMAs and scalar prefetch compile fine
(isolated by /tmp probes, r4; recorded in docs/PERFORMANCE.md).
``kernel_available()`` probes this at runtime so callers can fall
back to jnp.take."""

import numpy as np
import jax
import jax.numpy as jnp

from qrag_tpu.ops.pallas.gather_rows import (
    gather_ready,
    gather_rows,
    gather_rows_2d,
    kernel_available,
)


def test_gather_matches_take(rng):
    x = jnp.asarray(rng.randn(5000, 128).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 5000, size=(700,)).astype(np.int32))
    got = gather_rows(x, idx, rows_per_block=256, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(x)[np.asarray(idx)]
    )


def test_gather_2d_and_dtypes(rng):
    x = jnp.asarray(rng.randn(4096, 256).astype(np.float32)).astype(
        jnp.bfloat16
    )
    idx = jnp.asarray(rng.randint(0, 4096, size=(16, 32)).astype(np.int32))
    got = gather_rows_2d(x, idx, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(x)[np.asarray(idx)]
    )


def test_gather_clamps_out_of_range(rng):
    x = jnp.asarray(rng.randn(100, 128).astype(np.float32))
    idx = jnp.asarray(np.array([0, -5, 99, 5000], np.int32))
    got = gather_rows(x, idx, interpret=True)
    want = np.asarray(x)[np.clip(np.asarray(idx), 0, 99)]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_gather_blockspec_matches_take(rng):
    from qrag_tpu.ops.pallas.gather_rows import gather_rows_blockspec

    x = jnp.asarray(rng.randn(4096, 256).astype(np.float32)).astype(
        jnp.bfloat16
    )
    idx = jnp.asarray(rng.randint(0, 4096, size=(513,)).astype(np.int32))
    got = gather_rows_blockspec(x, idx, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(x)[np.asarray(idx)]
    )
    # out-of-range clamps like the DMA form
    idx2 = jnp.asarray(np.array([0, -3, 4095, 9999], np.int32))
    got2 = gather_rows_blockspec(x, idx2, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got2), np.asarray(x)[np.clip(np.asarray(idx2), 0, 4095)]
    )


def test_gather_ready_and_availability_probe():
    assert gather_ready(1000, 256)
    assert not gather_ready(1000, 100)  # non-lane-aligned rows
    # the probe must return a bool and never raise (on CPU: False —
    # the kernel is TPU DMA machinery; on the current axon TPU
    # toolchain: also False, the compile-helper crash documented above)
    avail = kernel_available()
    assert isinstance(avail, bool)
    if jax.default_backend() != "tpu":
        assert avail is False
