#!/usr/bin/env python
"""TPU microbenchmark: packed window-scan backends vs the XLA
approx_max_k pipeline at 1M x 768, B=1024, k=10 (BASELINE configs[2]).

Methodology per docs/PERFORMANCE.md: iterations inside ONE jit
(lax.scan) with FULL-COLUMN data dependence (`carry + 1e-9*v[:, :1]`)
— integer `x*0` folds and consuming only `out[0,0]` lets XLA
slice-propagate the matmul away; both silently measure nothing.
Run variants one at a time (one TPU process!).
"""
import argparse, functools, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from qrag_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from qrag_tpu.ops.topk import _goodness, goodness_topk
from qrag_tpu.ops.window_scan import (
    make_lane_rank, quantize_block_rows_device, windowed_scan_topk)
from bench import make_corpus


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=999_936)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--b", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--variant", required=True,
                   choices=["xla_approx", "window_pallas", "window_xla"])
    p.add_argument("--rf", type=int, default=4)
    p.add_argument("--gather-free", action="store_true",
                   help="exact_scores=False (scores from the planes)")
    args = p.parse_args()
    if args.gather_free and args.variant == "xla_approx":
        p.error("--gather-free applies to the windowed variants only")
    n, d, b, k, iters = args.n, args.d, args.b, args.k, args.iters
    n = (n // 512) * 512

    corpus = make_corpus(n, d, jnp.bfloat16)
    sq = jnp.sum(corpus.astype(jnp.float32)**2, axis=1)
    np.asarray(sq[0])
    q0 = jax.random.normal(jax.random.PRNGKey(7), (b, d), jnp.float32)
    q0 = q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)

    if args.variant == "xla_approx":
        @jax.jit
        def loop(q, x, xsq):
            def body(c, _):
                g = _goodness(c.astype(jnp.bfloat16), x, "l2", xsq, None)
                v, i = goodness_topk(g, k, mode="approx")
                return c + 1e-9 * v[:, :1], (v[0, 0], i[0, 0])
            qo, (v, i) = jax.lax.scan(body, q, None, length=iters)
            return v.sum() + qo[0, 0], i.sum()
        fn, fargs = loop, (q0, corpus, sq)
    else:
        x8, bscale = jax.jit(quantize_block_rows_device)(
            corpus.astype(jnp.float32))
        np.asarray(bscale[0])
        lane_rank = jnp.asarray(make_lane_rank(n))
        backend = "pallas" if args.variant == "window_pallas" else "xla"

        @jax.jit
        def loop(q, sx, xf, lr, bs, xsq):
            def body(c, _):
                v, i = windowed_scan_topk(
                    c, sx, xf, lr, k, metric="l2", corpus_sqnorms=xsq,
                    window_scale=bs, refine_factor=args.rf,
                    selector="approx", backend=backend,
                    exact_scores=not args.gather_free)
                return c + 1e-9 * v[:, :1], (v[0, 0], i[0, 0])
            qo, (v, i) = jax.lax.scan(body, q, None, length=iters)
            return v.sum() + qo[0, 0], i.sum()
        fn, fargs = loop, (q0, x8, corpus, lane_rank, bscale, sq)

    r = fn(*fargs); np.asarray(r[0])
    t0 = time.time(); r = fn(*fargs); np.asarray(r[0])
    dt = (time.time() - t0) / iters
    print(f"{args.variant} rf={args.rf}: {dt*1e3:.2f} ms/batch{b} "
          f"({b/dt:,.0f} QPS, {2.0*b*n*d/dt/1e12:.1f} T(FL)OP/s eff)")


if __name__ == "__main__":
    main()
