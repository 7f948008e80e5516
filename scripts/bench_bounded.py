"""TPU microbench: bounded-exact top-k vs verified vs approx.

1M x 768 bf16 / B=1024 / k=10, the headline shape.  Timing follows
CLAUDE.md: loop inside ONE jit via lax.scan, full-column dependence
through the carry, consume results, best-of-3.  Run alone (one
TPU-heavy process at a time).

    python scripts/bench_bounded.py [--iters 8] [--backend pallas]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import make_corpus, _timed_best  # noqa: E402
from qrag_tpu.ops.bounded_topk import (  # noqa: E402
    bounded_exact_topk,
    window_maxnorms,
)
from qrag_tpu.ops.topk import (  # noqa: E402
    _goodness,
    goodness_topk,
    scan_topk_verified_jit,
)
from qrag_tpu.ops.window_scan import make_lane_rank  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--b", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--backend", default="pallas")
    p.add_argument(
        "--candidates", type=int, default=None,
        help="C budget; default None = regime/k-aware auto "
        "(bounded_topk._auto_budgets + the large-k widening)",
    )
    p.add_argument(
        "--scan", default="bf16", choices=["bf16", "int8", "both"],
        help="bounded scan arithmetic (int8 = exact-integer dots at "
        "the int8 MXU rate; ops/bounded_topk.bounded_exact_topk_int8)",
    )
    p.add_argument("--skip-verified", action="store_true")
    p.add_argument("--skip-approx", action="store_true")
    p.add_argument(
        "--raw", action="store_true",
        help="also time the bare top-2 scan kernel (no selection)",
    )
    args = p.parse_args()
    n, d, b, k = args.n, args.d, args.b, args.k

    t0 = time.time()
    # the Mosaic scan tiles N by 512: round the corpus up (the extra
    # <0.05% rows do real work, so QPS is if anything understated)
    n = -(-n // 512) * 512
    corpus = make_corpus(n, d, jnp.bfloat16)
    sq = jnp.sum(
        corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=1
    )
    mx = jnp.asarray(window_maxnorms(np.asarray(sq)))
    lr = jnp.asarray(make_lane_rank(n))
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (b, d), jnp.float32)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.bfloat16)
    print(f"# setup {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    iters = args.iters

    if args.scan in ("bf16", "both"):
        @jax.jit
        def bounded_loop(q0, corpus_, sq_, mx_, lr_):
            def body(carry, _):
                vals, idx, fb, npatch, esc = bounded_exact_topk(
                    carry, corpus_, corpus_, sq_, mx_, lr_, k,
                    metric="l2", candidates=args.candidates,
                    backend=args.backend,
                )
                carry = carry + (1e-9 * vals[:, :1]).astype(carry.dtype)
                return carry, (vals.sum(), idx.sum(), fb, npatch, esc)
            q_out, (v, i, fbs, nps, escs) = jax.lax.scan(
                body, q0, None, length=iters
            )
            return (
                v.sum() + q_out[0, 0].astype(jnp.float32),
                i.sum(),
                fbs.sum(),
                nps.sum(),
                escs.sum(),
            )

        dt, r = _timed_best(bounded_loop, q, corpus, sq, mx, lr)
        ms = dt / iters * 1e3
        print(
            f"bounded[bf16,{args.backend},C={args.candidates or 'auto'},"
            f"k={k}]: {ms:.2f} "
            f"ms/batch{b} = {b*iters/dt:,.0f} QPS  "
            f"fallbacks={int(np.asarray(r[2]))}/{iters} "
            f"patched_windows={int(np.asarray(r[3]))} "
            f"escalated={int(np.asarray(r[4]))}/{iters}",
            flush=True,
        )

    if args.scan in ("int8", "both"):
        from qrag_tpu.ops.bounded_topk import (
            bounded_exact_topk_int8,
            window_minsqnorms_device,
            window_quant_residuals_device,
        )
        from qrag_tpu.ops.window_scan import quantize_block_rows_device

        q8x, wscale = jax.jit(quantize_block_rows_device)(
            corpus.astype(jnp.float32)
        )
        minsq = window_minsqnorms_device(sq)
        resid = window_quant_residuals_device(corpus, q8x, wscale)
        np.asarray(resid[0])
        qf = q.astype(jnp.float32)

        @jax.jit
        def bounded8_loop(q0, q8x_, wscale_, corpus_, sq_, mx_, minsq_, resid_, lr_):
            def body(carry, _):
                vals, idx, fb, npatch, esc = bounded_exact_topk_int8(
                    carry, q8x_, wscale_, corpus_, sq_, mx_, minsq_,
                    resid_, lr_, k,
                    metric="l2", candidates=args.candidates or 48,
                    backend=args.backend,
                )
                carry = carry + (1e-9 * vals[:, :1]).astype(carry.dtype)
                return carry, (vals.sum(), idx.sum(), fb, npatch, esc)
            q_out, (v, i, fbs, nps, escs) = jax.lax.scan(
                body, q0, None, length=iters
            )
            return (
                v.sum() + q_out[0, 0].astype(jnp.float32),
                i.sum(),
                fbs.sum(),
                nps.sum(),
                escs.sum(),
            )

        dt, r = _timed_best(
            bounded8_loop, qf, q8x, wscale, corpus, sq, mx, minsq, resid, lr
        )
        ms = dt / iters * 1e3
        print(
            f"bounded[int8,{args.backend},C={args.candidates or 'auto'}]: {ms:.2f} "
            f"ms/batch{b} = {b*iters/dt:,.0f} QPS  "
            f"fallbacks={int(np.asarray(r[2]))}/{iters} "
            f"patched_windows={int(np.asarray(r[3]))}",
            flush=True,
        )

    if args.raw:
        from qrag_tpu.ops.pallas.fused_scan import (
            pallas_packed_window_scan_top2,
        )

        @jax.jit
        def raw_loop(q0, corpus_, sq_):
            ra = -sq_[None, :]

            def body(carry, _):
                ca = -jnp.sum(
                    carry.astype(jnp.float32) ** 2, axis=1, keepdims=True
                )
                pk1, pk2 = pallas_packed_window_scan_top2(
                    carry, corpus_, row_add=ra, col_add=ca, alpha=2.0
                )
                carry = carry + (
                    1e-9 * pk1[:, :1].astype(jnp.float32)
                ).astype(carry.dtype)
                return carry, (pk1.sum(), pk2.sum())

            q_out, (p1, p2) = jax.lax.scan(body, q0, None, length=iters)
            return (
                p1.sum().astype(jnp.float32)
                + q_out[0, 0].astype(jnp.float32),
                p2.sum(),
            )

        dt, _ = _timed_best(raw_loop, q, corpus, sq)
        print(
            f"raw top2 scan: {dt/iters*1e3:.2f} ms/batch{b} "
            f"= {b*iters/dt:,.0f} QPS",
            flush=True,
        )

    if args.skip_approx:
        return

    @jax.jit
    def approx_loop(q0, corpus_, sq_):
        def body(carry, _):
            g = _goodness(carry, corpus_, "l2", sq_, None)
            vals, idx = goodness_topk(g, k, "approx", 2, 0.99)
            carry = carry + (1e-9 * vals[:, :1]).astype(carry.dtype)
            return carry, (vals.sum(), idx.sum())
        q_out, (v, i) = jax.lax.scan(body, q0, None, length=iters)
        return v.sum() + q_out[0, 0].astype(jnp.float32), i.sum()

    dt, _ = _timed_best(approx_loop, q, corpus, sq)
    print(
        f"approx o=2: {dt/iters*1e3:.2f} ms/batch{b} = {b*iters/dt:,.0f} QPS",
        flush=True,
    )

    if not args.skip_verified:
        @jax.jit
        def verified_loop(q0, corpus_, sq_):
            def body(carry, _):
                vals, idx, nb = scan_topk_verified_jit(
                    carry, corpus_, k, metric="l2", corpus_sqnorms=sq_
                )
                carry = carry + (1e-9 * vals[:, :1]).astype(carry.dtype)
                return carry, (vals.sum(), idx.sum(), nb)
            q_out, (v, i, nb) = jax.lax.scan(body, q0, None, length=iters)
            return v.sum() + q_out[0, 0].astype(jnp.float32), i.sum(), nb.sum()

        dt, r = _timed_best(verified_loop, q, corpus, sq)
        print(
            f"verified(cert): {dt/iters*1e3:.2f} ms/batch{b} = "
            f"{b*iters/dt:,.0f} QPS  fallback_rows={int(np.asarray(r[2]))}",
            flush=True,
        )


if __name__ == "__main__":
    main()
