"""Coalesced candidate-row gather kernel (VERDICT r4 item 3).

TPU random row gathers via ``jnp.take`` run at ~15-30 GB/s effective
(docs/PERFORMANCE.md round-2; re-measured 22.5 GB/s in the r4 lab) —
XLA's gather lowers to vector loads that cannot keep enough HBM
requests in flight.  Every gather-then-rescore stage pays it: bounded
mode's candidate gather, ``refine_candidates``, the fused-rerank
feature gather.

This kernel instead issues one async DMA per candidate row
(HBM -> VMEM output block), R rows per grid step, so tens of row
fetches are in flight at once and Mosaic double-buffers the output
block write-back.  Issue cost is per-row and byte-independent, so the
win grows with the row size (f32 768 = 3 KB rows: the VERDICT
microbench target).

The index list arrives via scalar prefetch (SMEM) — available before
the kernel body runs, which is what lets the DMAs start immediately.
Out-of-range indices are clamped by the caller (padding rows fetch row
0 and are masked downstream, same contract as ``jnp.take`` mode
"clip").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(
    idx_ref, corpus_ref, out_ref, sem, *, rows: int, full_unroll: bool
):
    g = pl.program_id(0)

    def dma(r):
        row = idx_ref[g * rows + r]
        return pltpu.make_async_copy(
            corpus_ref.at[row], out_ref.at[r], sem
        )

    def issue(r, carry):
        dma(r).start()
        return carry

    # Mosaic kernel loops support only unroll=1 or full unroll; the
    # issue loop is pure scalar work (this loop IS the kernel's
    # critical path), but full unroll of hundreds of DMA starts can
    # trip Mosaic internal errors — keep both forms selectable
    unroll = rows if full_unroll else 1
    jax.lax.fori_loop(0, rows, issue, 0, unroll=unroll)

    def wait(r, carry):
        dma(r).wait()
        return carry

    jax.lax.fori_loop(0, rows, wait, 0, unroll=unroll)


@functools.partial(
    jax.jit, static_argnames=("rows_per_block", "full_unroll", "interpret")
)
def gather_rows(
    corpus: jnp.ndarray,  # (N, d) any dtype
    idx: jnp.ndarray,  # (M,) int32 row indices (caller-clamped)
    rows_per_block: int = 256,
    full_unroll: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """(M, d) = corpus[idx] via per-row async DMAs.

    M is padded up to ``rows_per_block`` internally (padding fetches
    row 0; the pad rows are sliced off).  The corpus stays in HBM
    (``pl.ANY``) — only the gathered rows ever touch VMEM."""
    m = idx.shape[0]
    n, d = corpus.shape
    mp = -(-m // rows_per_block) * rows_per_block
    idx_p = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    if mp != m:
        idx_p = jnp.pad(idx_p, (0, mp - m))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // rows_per_block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (rows_per_block, d),
            lambda g, idx_ref: (g, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        functools.partial(
            _gather_kernel, rows=rows_per_block, full_unroll=full_unroll
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, d), corpus.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * mp * d * corpus.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx_p, corpus)
    return out[:m] if mp != m else out


def gather_rows_2d(
    corpus: jnp.ndarray,  # (N, d)
    idx: jnp.ndarray,  # (B, C) int32
    rows_per_block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, C, d) = corpus[idx] — the candidate-gather shape."""
    b, c = idx.shape
    flat = gather_rows(
        corpus,
        idx.reshape(-1),
        rows_per_block=rows_per_block,
        interpret=interpret,
    )
    return flat.reshape(b, c, corpus.shape[1])


def _gather_bs_kernel(idx_ref, row_ref, out_ref):
    # the pipeline machinery already DMA'd the right row block here
    # (the in_spec index_map reads the prefetched index ref); the body
    # only forwards it to the output block
    del idx_ref
    out_ref[:] = row_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_blockspec(
    corpus: jnp.ndarray,  # (N, d) any dtype
    idx: jnp.ndarray,  # (M,) int32 row indices (caller-clamped)
    interpret: bool = False,
) -> jnp.ndarray:
    """(M, d) = corpus[idx] via index_map-driven pipeline DMAs.

    The second gather form (VERDICT r4 item 3): instead of in-kernel
    dynamic-index ``make_async_copy`` (which crashes the axon AOT
    compile helper in every variant — docs/PERFORMANCE.md round-4),
    the input BlockSpec's ``index_map`` reads the scalar-prefetched
    index array, so Mosaic's own pipeline issues the per-row DMAs with
    dynamically computed block offsets — the canonical Pallas TPU
    block-sparse gather shape, a different compile path from the
    in-kernel DMA.

    One row per grid step; the pipeline's double buffering keeps a
    couple of row DMAs in flight."""
    m = idx.shape[0]
    n, d = corpus.shape
    idx_p = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec(
                (1, d),
                lambda g, idx_ref: (idx_ref[g], 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, d), lambda g, idx_ref: (g, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _gather_bs_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), corpus.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * m * d * corpus.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx_p, corpus)


def gather_ready(n: int, d: int) -> bool:
    """Kernel applicability: whole rows, lane-aligned feature dim."""
    return d % 128 == 0 and n >= 1


_KERNEL_AVAILABLE: dict = {}


def kernel_available() -> bool:
    """Does this toolchain compile the dynamic-index DMA kernel?

    On the current axon TPU AOT compile helper it does NOT: any
    dynamic-index async copy crashes the helper (exit 1) in every
    variant (fori_loop / unrolled / python-unrolled, rank-1/2, ANY or
    HBM source), while static-index DMAs and scalar prefetch compile
    fine — isolated r4, recorded in docs/PERFORMANCE.md.  The probe
    compiles a tiny gather ONCE per process and caches the verdict so
    callers (refine/bounded gathers) can decide statically, falling
    back to jnp.take (~22-28 GB/s measured)."""
    import jax

    backend = jax.default_backend()
    if backend != "tpu":
        return _KERNEL_AVAILABLE.setdefault(backend, False)
    if backend not in _KERNEL_AVAILABLE:
        try:
            x = jnp.zeros((256, 128), jnp.float32)
            idx = jnp.arange(8, dtype=jnp.int32)
            out = gather_rows(x, idx, rows_per_block=8)
            out.block_until_ready()
            _KERNEL_AVAILABLE[backend] = True
        except Exception:  # noqa: BLE001 - any compile failure
            _KERNEL_AVAILABLE[backend] = False
    return _KERNEL_AVAILABLE[backend]
