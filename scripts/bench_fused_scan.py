#!/usr/bin/env python
"""TPU microbenchmark: Pallas fused window-stat scan vs the XLA
approx_max_k pipeline at 1M x 768, B=1024, k=10 (BASELINE configs[2]).

Methodology per docs/PERFORMANCE.md: iterations inside ONE jit
(lax.scan), corpus passed as an argument, timing by host-consuming a
tiny dependent output.  Run variants one at a time (one TPU process!).
"""
import argparse, functools, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from qrag_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from qrag_tpu.ops.topk import _goodness, goodness_topk
from qrag_tpu.ops.quantize import quantize_rows
from qrag_tpu.ops.pallas.fused_scan import fused_scan_topk, window_stats

from bench import make_corpus  # reuse on-device corpus gen


def timed(fn, *args, iters):
    r = fn(*args)          # compile+warm
    np.asarray(r[0])
    t0 = time.time()
    r = fn(*args)
    np.asarray(r[0])
    return (time.time() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--b", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--variant", required=True,
                   choices=["xla", "pallas_bf16", "pallas_int8", "raw_bf16", "raw_int8"])
    p.add_argument("--bm", type=int, default=256)
    p.add_argument("--bn", type=int, default=512)
    p.add_argument("--second", type=int, default=1)
    p.add_argument("--rf", type=int, default=8)
    args = p.parse_args()
    n, d, b, k, iters = args.n, args.d, args.b, args.k, args.iters
    n = (n // args.bn) * args.bn

    corpus = make_corpus(n, d, jnp.bfloat16)
    sq = jnp.sum(corpus.astype(jnp.float32)**2, axis=1)
    np.asarray(sq[0])
    q0 = jax.random.normal(jax.random.PRNGKey(7), (b, d), jnp.float32)
    q0 = q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)

    flops = 2.0 * b * n * d

    if args.variant == "xla":
        @functools.partial(jax.jit, static_argnames=())
        def loop(q, x, xsq):
            def body(c, _):
                g = _goodness(c.astype(jnp.bfloat16), x, "l2", xsq, None)
                v, i = goodness_topk(g, k, mode="approx")
                return c + 1e-9 * v[:, :1], (v[0, 0], i[0, 0])
            qo, (v, i) = jax.lax.scan(body, q, None, length=iters)
            return v.sum() + qo[0, 0], i.sum()
        dt = timed(loop, q0, corpus, sq, iters=iters)

    elif args.variant in ("pallas_bf16", "pallas_int8"):
        if args.variant == "pallas_int8":
            x8, xs = jax.jit(quantize_rows)(corpus.astype(jnp.float32))
            np.asarray(xs[0])
            scan_x, scale = x8, xs
        else:
            scan_x, scale = corpus, None
        @jax.jit
        def loop(q, sx, xf, xsq, xscale):
            def body(c, _):
                v, i = fused_scan_topk(
                    c, sx, xf, k, metric="l2", corpus_sqnorms=xsq,
                    x_scale=xscale, refine_factor=args.rf,
                    bm=args.bm, bn=args.bn, use_second=bool(args.second))
                return c + 1e-9 * v[:, :1], (v[0, 0], i[0, 0])
            qo, (v, i) = jax.lax.scan(body, q, None, length=iters)
            return v.sum() + qo[0, 0], i.sum()
        dt = timed(loop, q0, scan_x, corpus, sq, scale, iters=iters)

    else:  # raw kernel only
        int8 = args.variant == "raw_int8"
        if int8:
            x8, xs = jax.jit(quantize_rows)(corpus.astype(jnp.float32))
            np.asarray(xs[0])
            q8, qs = jax.jit(quantize_rows)(q0)
            scan_x, rs_v = x8, xs[None, :]
            q_in, cs_v = q8, qs[:, None]
        else:
            scan_x, rs_v = corpus, jnp.ones((1, n), jnp.float32)
            q_in, cs_v = q0.astype(jnp.bfloat16), jnp.ones((b, 1), jnp.float32)
        ca = jnp.zeros((b, 1), jnp.float32)
        ra = jnp.zeros((1, n), jnp.float32)
        @jax.jit
        def loop(qq, cs, x, rs):
            def body(c, _):
                wmax, warg = window_stats(
                    qq, cs, ca, x, rs, ra, alpha=1.0,
                    bm=args.bm, bn=args.bn, want_second=bool(args.second))[:2]
                return c + 1e-9 * wmax[:1, :1].sum(), (wmax[0, 0], warg[0, 0])
            qo, (v, i) = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
            return v.sum() + qo, i.sum()
        dt = timed(loop, q_in, cs_v, scan_x, rs_v, iters=iters)

    print(f"{args.variant} bm={args.bm} bn={args.bn} second={args.second} "
          f"rf={args.rf}: {dt*1e3:.2f} ms/batch{b} "
          f"({b/dt:,.0f} QPS, {flops/dt/1e12:.1f} T(FL)OP/s eff)")

if __name__ == "__main__":
    main()
