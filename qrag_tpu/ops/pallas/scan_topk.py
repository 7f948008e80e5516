"""Pallas fused matmul-scan + on-chip top-k (round-1 design —
DEPRECATED as a dispatch target, kept as reference + tests).

Measured 10-50x behind the XLA partial-reduce scan at every
production shape (docs/PERFORMANCE.md round-1 table): the k unrolled
merge rounds serialize against the MXU instead of overlapping with
it.  ``ops.topk.flat_scan_topk`` no longer dispatches here (VERDICT
r4 weak #6) — the production Mosaic kernels are the packed window
scans in ``ops/pallas/fused_scan.py``.  This file stays in-tree as
the reference implementation of the running-buffer design, exercised
by tests/test_pallas_scan.py in interpret mode.

The TPU-native replacement for FAISS's C++ flat scan
(``store_in_faiss.py:105``'s IndexFlatL2, searched via faiss-cpu):
stream corpus tiles HBM→VMEM, score them on the MXU, and keep a
running per-query top-k in VMEM — the full (B, N) score matrix is
NEVER materialized in HBM (SURVEY.md §7 hard part 1).

Kernel structure (grid = corpus tiles, sequential on TPU):

  step i:
    X_tile (T, d), xsq_tile (1, T), bias_tile (1, T) DMA'd by BlockSpec
    g = Q @ X_tile^T                      (MXU, f32 or bf16-in/f32-acc)
    g = ip ? g : -(qsq + xsq - 2g)        ("goodness": bigger = better)
    g += bias (0 valid / -inf padded rows)
    merge into running (B, k) top-k held in the output VMEM buffers
    (constant out BlockSpec → the buffer persists across grid steps)

The merge is k unrolled rounds of max / first-argmax / mask over the
concatenated (B, k+T) candidates, built only from max/min/where
reductions (no argmax primitive needed); first-occurrence tie-breaking
reproduces ``lax.top_k``'s lower-index-wins order because running
entries (earlier tiles → lower global indices) precede tile entries.

On non-TPU backends the kernel runs in interpreter mode so tests
exercise the identical code path on the 8-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(np.finfo(np.float32).min)  # avoid inf arithmetic in-kernel
_BIG_I32 = np.int32(2 ** 31 - 1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile_n(
    d: int, b: int, vmem_budget_bytes: int = 5 * 1024 * 1024
) -> int:
    """Corpus rows per tile, sized so X tile + score/candidate planes
    fit VMEM alongside the Q block, the pipeline's double-buffered
    input tiles, and the unrolled merge's live temporaries (~2x the
    plane estimate, hence the conservative budget):
    x(T*d*4)*2 + ~6 candidate planes of b*(T+128)*4."""
    fixed = b * d * 4 + 6 * b * 128 * 4
    avail = max(vmem_budget_bytes - fixed, 512 * 1024)
    per_row = 2 * d * 4 + 6 * b * 4
    t = avail // per_row
    t = max(128, min(2048, t))
    return (t // 128) * 128


def _scan_topk_kernel(
    q_ref,  # (B, d) VMEM
    qsq_ref,  # (B, 1) VMEM
    x_ref,  # (T, d) VMEM (tile)
    xsq_ref,  # (1, T) VMEM (tile)
    bias_ref,  # (1, T) VMEM (tile)
    out_vals_ref,  # (B, k_pad) VMEM — running top-k values (persists)
    out_idx_ref,  # (B, k_pad) VMEM — running top-k global indices
    *,
    k: int,
    k_pad: int,
    tile_n: int,
    metric: str,
    compute_dtype,
):
    i = pl.program_id(0)
    b = q_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        out_vals_ref[:] = jnp.full_like(out_vals_ref, _NEG_INF)
        out_idx_ref[:] = jnp.full_like(out_idx_ref, -1)

    q = q_ref[:]
    x = x_ref[:]
    if compute_dtype == jnp.bfloat16:
        q = q.astype(jnp.bfloat16)
        x = x.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        q,
        x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, T)
    if metric == "l2":
        g = 2.0 * dots - qsq_ref[:] - xsq_ref[:]  # = -(||q-x||^2)
    else:
        g = dots
    g = g + bias_ref[:]  # -BIG on padded/invalid rows

    tile_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), dimension=1)
        + i * tile_n
    )
    # candidates: running top-k first (lower global indices win ties)
    vals = jnp.concatenate([out_vals_ref[:], g], axis=1)  # (B, k+T)
    cidx = jnp.concatenate([out_idx_ref[:], tile_idx], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, vals.shape, dimension=1)

    # k selection rounds; selected entries are re-marked in-place in
    # the FIRST k_pad lanes (the running-buffer section) by position:
    # round j's winner is written to position j via a positional mask —
    # all full-width vector ops, no column stores, no relayouts.
    sel_vals = jnp.full_like(vals[:, :k_pad], _NEG_INF)
    sel_idx = jnp.full_like(cidx[:, :k_pad], -1)
    out_pos = jax.lax.broadcasted_iota(jnp.int32, (b, k_pad), dimension=1)
    for j in range(k):  # k is small and static — unrolled
        m = jnp.max(vals, axis=1, keepdims=True)  # (B, 1)
        is_max = vals >= m
        first = jnp.min(
            jnp.where(is_max, pos, _BIG_I32), axis=1, keepdims=True
        )  # (B, 1) first occurrence
        hit = pos == first
        gidx = jnp.max(jnp.where(hit, cidx, -1), axis=1, keepdims=True)
        write = out_pos == j
        sel_vals = jnp.where(write, m, sel_vals)
        sel_idx = jnp.where(write, gidx, sel_idx)
        vals = jnp.where(hit, _NEG_INF, vals)
    out_vals_ref[:] = sel_vals
    out_idx_ref[:] = sel_idx


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "tile_n", "compute_dtype", "interpret"),
)
def _pallas_scan_topk_padded(
    q: jnp.ndarray,  # (Bp, dp) f32
    qsq: jnp.ndarray,  # (Bp, 1) f32
    x: jnp.ndarray,  # (Np, dp) f32
    xsq: jnp.ndarray,  # (1, Np) f32
    bias: jnp.ndarray,  # (1, Np) f32
    k: int,
    metric: str,
    tile_n: int,
    compute_dtype,
    interpret: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    bp, dp = q.shape
    np_, _ = x.shape
    grid = (np_ // tile_n,)
    flops = 2 * bp * np_ * dp
    # running top-k buffers padded to a 128-lane multiple: keeps every
    # candidate plane lane-aligned, avoiding relayouts (and supports
    # k > 128 — regression-tested)
    kp = _round_up(k, 128) if not interpret else k
    out_vals, out_idx = pl.pallas_call(
        functools.partial(
            _scan_topk_kernel,
            k=k,
            k_pad=kp,
            tile_n=tile_n,
            metric=metric,
            compute_dtype=compute_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bp, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, kp), jnp.float32),
            jax.ShapeDtypeStruct((bp, kp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=np_ * dp * 4 + bp * dp * 4 + bp * kp * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, qsq, x, xsq, bias)
    return out_vals[:, :k], out_idx[:, :k]


def pallas_scan_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    metric: str = "l2",
    corpus_sqnorms: Optional[jnp.ndarray] = None,
    valid_rows: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
    tile_n: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused scan+top-k with the `flat_scan_topk` interface.

    Returns (scores, indices): L2 distances ascending / inner products
    descending, matching the XLA path bit-for-bit on f32 (tested).
    """
    if queries.ndim != 2 or corpus.ndim != 2:
        raise NotImplementedError("pallas path needs 2D queries/corpus")
    b, d = queries.shape
    n = corpus.shape[0]
    if n == 0 or k > n:
        raise NotImplementedError("pallas path needs 0 < k <= ntotal")
    interpret = jax.default_backend() != "tpu"
    # query chunk size: the kernel's VMEM working set (Q block + (B, T)
    # score/candidate planes + pipeline double-buffers) must stay under
    # the 16 MB scoped limit
    max_b = 256

    dp = _round_up(d, 128)
    bp = _round_up(min(b, max_b), 8)
    tile = tile_n or _pick_tile_n(dp, bp)
    npad = _round_up(n, tile)

    # corpus-side prep is hoisted OUT of the per-chunk loop: padding the
    # (N, d) matrix + sqnorms/bias once, not once per 256-query chunk
    x = jnp.zeros((npad, dp), jnp.float32).at[:n, :d].set(corpus.astype(jnp.float32))
    if corpus_sqnorms is None:
        xsq_valid = jnp.sum(
            corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=1
        )
    else:
        xsq_valid = corpus_sqnorms.astype(jnp.float32)
    xsq = jnp.zeros((1, npad), jnp.float32).at[0, :n].set(xsq_valid)
    bias_row = jnp.full((npad,), _NEG_INF, jnp.float32)
    if valid_rows is not None:
        bias_row = bias_row.at[:n].set(
            jnp.where(valid_rows.astype(bool), 0.0, _NEG_INF)
        )
    else:
        bias_row = bias_row.at[:n].set(0.0)
    bias = bias_row[None, :]

    def run_chunk(q_chunk: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cb = q_chunk.shape[0]
        q = (
            jnp.zeros((bp, dp), jnp.float32)
            .at[:cb, :d]
            .set(q_chunk.astype(jnp.float32))
        )
        qsq = jnp.sum(q * q, axis=1, keepdims=True)
        v, i = _pallas_scan_topk_padded(
            q, qsq, x, xsq, bias, k, metric, tile, compute_dtype, interpret
        )
        return v[:cb], i[:cb]

    parts = [run_chunk(queries[i : i + max_b]) for i in range(0, b, max_b)]
    if len(parts) == 1:
        vals, idx = parts[0]
    else:
        vals = jnp.concatenate([p[0] for p in parts], axis=0)
        idx = jnp.concatenate([p[1] for p in parts], axis=0)
    if metric == "l2":
        # g = -(d^2) (+bias); recover distances, mask invalid as +inf
        invalid = vals <= _NEG_INF / 2
        dist = jnp.where(invalid, jnp.inf, jnp.maximum(-vals, 0.0))
        return dist, idx
    invalid = vals <= _NEG_INF / 2
    return jnp.where(invalid, -jnp.inf, vals), idx
