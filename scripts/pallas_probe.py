#!/usr/bin/env python
"""Probe: isolate where the fused-scan kernel's time goes on the TPU.

Variants (all 1M x 768 bf16, B=1024 unless flagged):
  matmul      — dot only, write per-tile (bm, 128) row-slice of dots
  rowmax      — dot + jnp.max over the whole (bm, bn) tile
  win_reshape — dot + window stats via (bm, nw, 128) reshape
  win_slice   — dot + window stats via nw strided 128-lane slices
Usage: python scripts/pallas_probe.py --variant rowmax --bm 1024 --bn 512
"""
import argparse, functools, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from qrag_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bench import make_corpus

NEG = float(np.finfo(np.float32).min)


def make_kernel(variant, bm, bn, nw, acc=jnp.float32):
    def kernel(q_ref, x_ref, out_ref):
        j = pl.program_id(1)
        dots = jax.lax.dot_general(
            q_ref[:], x_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc)
        if acc != jnp.float32:
            dots = dots.astype(jnp.float32)
        if variant == "matmul":
            out_ref[:] = dots[None, :, :128]
        elif variant == "rowmax":
            out_ref[:] = jnp.max(dots, axis=1, keepdims=True)[None]
        elif variant == "win_reshape":
            gw = dots.reshape(bm, nw, 128)
            out_ref[:] = jnp.max(gw, axis=2)[None]
        elif variant == "win_slice":
            parts = [
                jnp.max(dots[:, w * 128:(w + 1) * 128], axis=1, keepdims=True)
                for w in range(nw)
            ]
            out_ref[:] = jnp.concatenate(parts, axis=1)[None]
        elif variant == "win_slice_arg":
            outs = []
            for w in range(nw):
                seg = dots[:, w * 128:(w + 1) * 128]
                m = jnp.max(seg, axis=1, keepdims=True)
                lane = jax.lax.broadcasted_iota(jnp.int32, seg.shape, 1)
                arg = jnp.min(jnp.where(seg >= m, lane, 128), axis=1, keepdims=True)
                outs.append(m + arg.astype(jnp.float32) * 0.0)
            out_ref[:] = jnp.concatenate(outs, axis=1)[None]
    return kernel


def make_int_kernel(variant, bm, bn, nw):
    """Int8-input variants that keep the tile in int32 end-to-end:
    value+lane packed into one int32, ONE max per window."""
    def kernel(q_ref, x_ref, out_ref):
        dots = jax.lax.dot_general(
            q_ref[:], x_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)  # |dots| < 127*127*768 < 2^24
        lane = jax.lax.broadcasted_iota(jnp.int32, dots.shape, 1)
        packed = (dots << 7) | (127 - (lane & 127))  # ties -> lower lane wins
        if variant == "win_packed_slice":
            outs = [
                jnp.max(packed[:, w * 128:(w + 1) * 128], axis=1, keepdims=True)
                for w in range(nw)
            ]
            out_ref[:] = jnp.concatenate(outs, axis=1)[None].astype(jnp.float32)
        elif variant == "win_packed_reshape":
            out_ref[:] = jnp.max(
                packed.reshape(bm, nw, 128), axis=2
            )[None].astype(jnp.float32)
        elif variant == "win_int_slice":  # max only, no packing
            outs = [
                jnp.max(dots[:, w * 128:(w + 1) * 128], axis=1, keepdims=True)
                for w in range(nw)
            ]
            out_ref[:] = jnp.concatenate(outs, axis=1)[None].astype(jnp.float32)
    return kernel


def make_int_kernel_xt(variant, bm, bn, nw):
    """x pre-transposed (d, bn) tiles: natural MXU operand order."""
    def kernel(q_ref, x_ref, out_ref):
        dots = jax.lax.dot_general(
            q_ref[:], x_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, dots.shape, 1)
        packed = (dots << 7) | (127 - (lane & 127))
        outs = [
            jnp.max(packed[:, w * 128:(w + 1) * 128], axis=1, keepdims=True)
            for w in range(nw)
        ]
        out_ref[:] = jnp.concatenate(outs, axis=1)[None].astype(jnp.float32)
    return kernel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", required=True)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--b", type=int, default=1024)
    p.add_argument("--bm", type=int, default=1024)
    p.add_argument("--bn", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "int8"])
    args = p.parse_args()
    n = (args.n // args.bn) * args.bn
    b, d, bm, bn = args.b, args.d, args.bm, args.bn
    nw = bn // 128
    out_w = {"matmul": 128, "rowmax": 1}.get(args.variant, nw)

    corpus = make_corpus(n, d, jnp.bfloat16)
    if args.dtype == "int8":
        from qrag_tpu.ops.quantize import quantize_rows
        corpus = jax.jit(quantize_rows)(corpus.astype(jnp.float32))[0]
    q0 = jax.random.normal(jax.random.PRNGKey(7), (b, d), jnp.float32)
    q0 = (q0 / jnp.linalg.norm(q0, axis=1, keepdims=True))
    q0 = q0.astype(jnp.int8) if args.dtype == "int8" else q0.astype(jnp.bfloat16)
    np.asarray(corpus[0, 0].astype(jnp.float32))

    if args.variant == "win_packed_xt":
        kern = make_int_kernel_xt(args.variant, bm, bn, nw)
    elif args.variant.startswith("win_packed") or args.variant == "win_int_slice":
        kern = make_int_kernel(args.variant, bm, bn, nw)
    else:
        kern = make_kernel(
            args.variant, bm, bn, nw,
            acc=jnp.int32 if args.dtype == "int8" else jnp.float32,
        )
    n_tiles = n // bn
    grid = (b // bm, n_tiles)

    if args.variant == "win_packed_xt":
        corpus = corpus.T  # (d, n) layout
        x_spec = pl.BlockSpec(
            (d, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM
        )
    else:
        x_spec = pl.BlockSpec(
            (bn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM
        )
    np.asarray(corpus[0, 0].astype(jnp.float32))

    @jax.jit
    def run(q, x):
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                x_spec,
            ],
            out_specs=pl.BlockSpec(
                (1, bm, out_w), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_tiles, b, out_w), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d,
                bytes_accessed=n * d * (1 if args.dtype == "int8" else 2),
                transcendentals=0,
            ),
        )(q, x)
        return out[0, 0, 0], out[-1, -1, -1]

    @jax.jit
    def loop2(q, x):
        # data-dependence between iterations defeats CSE/elision
        def body(i, acc):
            dep = (acc * 0).astype(q.dtype)
            a, bb = run(q + dep, x)
            return acc + a + bb
        return jax.lax.fori_loop(0, args.iters, body, jnp.zeros((), jnp.float32))

    r = loop2(q0, corpus); np.asarray(r)
    t0 = time.time(); r = loop2(q0, corpus); np.asarray(r)
    dt = (time.time() - t0) / args.iters
    eff = 2.0 * b * n * d / dt / 1e12
    print(f"{args.variant} {args.dtype} bm={bm} bn={bn}: {dt*1e3:.2f} ms "
          f"({eff:.1f} T(FL)OP/s, {dt/ (grid[0]*grid[1]) *1e6:.2f} us/step)")


if __name__ == "__main__":
    main()
