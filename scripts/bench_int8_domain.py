"""Time the own-domain int8 EXACT top-k (ops/int8_domain.py) at the
headline shape (1M x 768, B=1024, k=10) on the live chip.

Timing rules per docs/PERFORMANCE.md: dependent lax.scan inside ONE
jit (dispatch amortization), full-column carry dependence, consume via
np.asarray.  Compares against the bf16 bounded-exact pipeline in the
same session (cross-session variance is +/-10-18%).

Usage: timeout 1800 python scripts/bench_int8_domain.py [--iters 48]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--skip-bounded", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qrag_tpu.ops.int8_domain import (
        exact_topk_int8_domain,
        row_int_sqnorms,
    )
    from qrag_tpu.ops.window_scan import (
        WINDOW,
        make_lane_rank,
        quantize_block_rows_device,
    )

    n = -(-args.n // 1024) * 1024  # transposed Mosaic tile
    d, b, k, iters = args.d, args.b, args.k, args.iters
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    print(f"# backend={jax.default_backend()} n={n} d={d} b={b} k={k} "
          f"iters={iters}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    corpus32 = jax.random.normal(key, (n, d), jnp.float32) / np.sqrt(d)
    x8, bscales = jax.jit(quantize_block_rows_device)(corpus32)
    row_isq = jax.jit(row_int_sqnorms)(x8)
    lr = jnp.asarray(make_lane_rank(n))
    q = jax.random.normal(jax.random.PRNGKey(11), (b, d), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)

    @jax.jit
    def loop(q0, x8_, bs_, isq_, lr_):
        def body(carry, _):
            vals, idx, fb, npatch, esc = exact_topk_int8_domain(
                carry, x8_, bs_, isq_, lr_, k, metric="l2",
                backend=backend,
            )
            carry = carry + 1e-9 * vals[:, :1]
            return carry, (vals.sum(), idx.sum(), fb, esc)

        q_out, (v, i, fbs, escs) = jax.lax.scan(body, q0, None, length=iters)
        return (
            v.sum() + q_out[0, 0],
            i.sum(),
            fbs.sum(),
            escs.sum(),
        )

    best = None
    for rep in range(3):
        t0 = time.time()
        r = loop(q, x8, bscales, row_isq, lr)
        s = float(np.asarray(r[0]))
        dt = time.time() - t0
        fb = int(np.asarray(r[2]))
        esc = int(np.asarray(r[3]))
        print(f"# rep{rep}: {dt/iters*1e3:.2f} ms/batch  checksum={s:.3f} "
              f"fallback_batches={fb}/{iters} escalated={esc}",
              file=sys.stderr)
        if best is None or dt < best:
            best = dt
    ms = best / iters * 1e3
    qps = b * iters / best
    print(f"int8_domain_exact: {ms:.2f} ms/batch{b} = {qps:,.0f} QPS "
          f"(own-domain exact, k={k})")

    if not args.skip_bounded:
        sys.path.insert(0, "/root/repo")
        from bench import bench_bounded_mode

        qps_b, per_b, fb_b = bench_bounded_mode(n, d, b, k, iters)
        print(f"bf16_bounded:      {per_b*1e3:.2f} ms/batch{b} = "
              f"{qps_b:,.0f} QPS (fallback batches {fb_b}/{iters})")
        print(f"speedup int8-domain over bf16-bounded: {per_b*1e3/ms:.2f}x")


if __name__ == "__main__":
    main()
