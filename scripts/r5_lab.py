"""Round-4/5 TPU perf lab: bounded-mode candidate budget + the int8
pre-filter hybrid feasibility question (docs/ROADMAP.md round-5 queue
item 2).

One session, one process (CLAUDE.md rules: loop inside one jit with
full-column dependence; consume results; compare within a run).

    python scripts/r5_lab.py --sections csweep,band,int8top2

Sections (1M x 768 / B=1024 / k=10 defaults):
  csweep    full bounded_exact_topk pipeline at C in {12,16,24,32}:
            the candidate gather is ~2.2 ms of the 13.4 ms pipeline
            and scales with C; cert_a headroom decides how low C goes
  band      UNTIMED certificate-band census: per-query count of
            windows whose upper bound clears the true top-10
            threshold, for the bf16 margins AND the int8 quantization
            margins; batch-union fraction of qualifying windows.
            These numbers decide the int8 two-level hybrid: if the
            per-query int8 band needs C >~ 128 and the batch union
            covers most windows, neither a restricted second scan nor
            a candidate gather can beat the bf16 single-level mode
  int8top2  XLA int8 packed top-2 window scan timing: does XLA fuse
            the pack/reshape/max epilogue into the int8 matmul (the
            5.84 ms matmul+rowmax class) or materialize (B, N) int32?
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import make_corpus, _timed_best  # noqa: E402


def section_csweep(q, corpus, sq, mx, lr, iters, b, k, cs):
    from qrag_tpu.ops.bounded_topk import bounded_exact_topk

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    for C in cs:
        @jax.jit
        def loop(q0, corpus_, sq_, mx_, lr_, C=C):
            def body(carry, _):
                vals, idx, fb, npatch, esc = bounded_exact_topk(
                    carry, corpus_, corpus_, sq_, mx_, lr_, k,
                    metric="l2", candidates=C, backend=backend,
                )
                carry = carry + (1e-9 * vals[:, :1]).astype(carry.dtype)
                return carry, (vals.sum(), idx.sum(), fb)

            q_out, (v, i, fbs) = jax.lax.scan(body, q0, None, length=iters)
            return (
                v.sum() + q_out[0, 0].astype(jnp.float32),
                i.sum(),
                fbs.sum(),
            )

        dt, r = _timed_best(loop, q, corpus, sq, mx, lr)
        print(
            f"csweep C={C}: {dt/iters*1e3:.2f} ms/batch{b} "
            f"({b*iters/dt:,.0f} QPS), fallback batches "
            f"{int(np.asarray(r[2]))}/{iters}",
            flush=True,
        )


def section_band(q, corpus, sq, mx, lr, b, k, batches):
    """Certificate-band census (untimed).  Replicates the ub formulas
    of ops/bounded_topk.{bounded_exact_topk,bounded_exact_topk_int8}
    and counts qualifying windows against the TRUE top-k threshold."""
    from qrag_tpu.ops.bounded_topk import (
        margin_coeff,
        packed_window_scan_top2,
        plane_value_bounds,
        window_minsqnorms_device,
        window_quant_residuals_device,
    )
    from qrag_tpu.ops.window_scan import WINDOW, quantize_block_rows_device

    n, d = corpus.shape
    nw = n // WINDOW

    q8x, wscale = jax.jit(quantize_block_rows_device)(
        corpus.astype(jnp.float32)
    )
    minsq = window_minsqnorms_device(sq)
    resid = window_quant_residuals_device(corpus, q8x, wscale)

    @jax.jit
    def census(qb, corpus, sq, mx, lr, q8x, wscale, minsq, resid):
        # NB: all big buffers are ARGUMENTS — closing a jit over them
        # bakes gigabytes of constants (CLAUDE.md trap; the first run
        # of this census did exactly that and wedged the compile)
        q32 = qb.astype(jnp.float32)
        qsq = jnp.sum(q32 * q32, axis=-1, keepdims=True)
        qnorm = jnp.sqrt(qsq)

        # ---- true refine-domain top-k threshold (chunked oracle)
        def chunk_thr(qc):
            g = (
                2.0
                * jax.lax.dot_general(
                    qc, corpus.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                - jnp.sum(qc * qc, axis=1, keepdims=True)
                - sq[None, :]
            )
            vals, _ = jax.lax.top_k(g, k)
            return vals[:, k - 1]

        thr = jax.lax.map(
            chunk_thr, q32.reshape(-1, 128, d)
        ).reshape(b)

        # ---- bf16 margins (scan == refine rows: coeff = drift only)
        ra = -sq[None, :].astype(jnp.float32)
        ca = -qsq
        pk1, pk2 = packed_window_scan_top2(
            qb.astype(corpus.dtype), corpus, lr,
            row_add=ra, col_add=ca, alpha=2.0,
        )
        _, v1_ub = plane_value_bounds(pk1)
        coeff = 2.0 * margin_coeff(qb.dtype, corpus.dtype, corpus.dtype, d)
        margin = coeff * qnorm * mx[None, :] + 1e-30
        margin = margin + 5e-7 * (qsq + mx[None, :] ** 2)
        count_bf16 = jnp.sum(v1_ub + margin >= thr[:, None], axis=1)

        # ---- int8 margins (quantization residual band)
        q_absmax = jnp.max(jnp.abs(q32), axis=1)
        t = jnp.where(q_absmax > 0, q_absmax / 127.0, 1.0)
        q8 = jnp.clip(jnp.round(q32 / t[:, None]), -127, 127).astype(
            jnp.int8
        )
        dots = jax.lax.dot_general(
            q8, q8x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        dmax = jnp.max(dots.reshape(b, nw, WINDOW), axis=2)
        s1 = t[:, None] * wscale[None, :] * dmax.astype(jnp.float32)
        q_deq = q8.astype(jnp.float32) * t[:, None]
        rq = jnp.sqrt(jnp.sum((q32 - q_deq) ** 2, axis=1)) * (1 + 1e-5)
        E = (
            (qnorm[:, 0] + rq)[:, None] * resid[None, :]
            + (mx + resid)[None, :] * rq[:, None]
        )
        E = 1.25 * E + coeff / 2.0 * qnorm * mx[None, :] + 2e-7 * jnp.abs(s1)
        ub8 = 2.0 * (s1 + E) - qsq - minsq[None, :] + 5e-7 * (
            qsq + mx[None, :] ** 2
        )
        qual8 = ub8 >= thr[:, None]
        count_int8 = jnp.sum(qual8, axis=1)
        union8 = jnp.sum(jnp.any(qual8, axis=0))
        return count_bf16, count_int8, union8

    cb_all, c8_all, un_all = [], [], []
    key = jax.random.PRNGKey(101)
    for i in range(batches):
        key, sub = jax.random.split(key)
        qb = jax.random.normal(sub, q.shape, jnp.float32)
        qb = (qb / jnp.linalg.norm(qb, axis=1, keepdims=True)).astype(
            q.dtype
        )
        cb, c8, un = census(qb, corpus, sq, mx, lr, q8x, wscale, minsq, resid)
        cb_all.append(np.asarray(cb))
        c8_all.append(np.asarray(c8))
        un_all.append(int(np.asarray(un)))
    cb = np.concatenate(cb_all)
    c8 = np.concatenate(c8_all)
    print(
        f"band bf16: qualifying windows/query mean {cb.mean():.1f} "
        f"p99 {np.percentile(cb, 99):.0f} max {cb.max()} "
        f"(cert_a needs max <= C)",
        flush=True,
    )
    print(
        f"band int8: qualifying windows/query mean {c8.mean():.1f} "
        f"p99 {np.percentile(c8, 99):.0f} max {c8.max()}",
        flush=True,
    )
    print(
        f"band int8 batch-union: {np.mean(un_all):,.0f} of {nw} windows "
        f"({100*np.mean(un_all)/nw:.1f}%) qualify for >=1 of {b} queries "
        f"(a restricted second scan would cover this fraction)",
        flush=True,
    )


def section_int8top2(q, corpus, lr, iters, b):
    from qrag_tpu.ops.bounded_topk import packed_window_scan_top2_int
    from qrag_tpu.ops.window_scan import quantize_block_rows_device

    q8x, _ = jax.jit(quantize_block_rows_device)(corpus.astype(jnp.float32))

    @jax.jit
    def loop(q0, q8x_, lr_):
        def body(carry, _):
            am = jnp.max(jnp.abs(carry), axis=1)
            t = jnp.where(am > 0, am / 127.0, 1.0)
            q8 = jnp.clip(jnp.round(carry / t[:, None]), -127, 127).astype(
                jnp.int8
            )
            pk1, pk2 = packed_window_scan_top2_int(q8, q8x_, lr_)
            carry = carry + 1e-9 * pk1[:, :1].astype(jnp.float32)
            return carry, (pk1.sum(), pk2.sum())

        q_out, (p1, p2) = jax.lax.scan(body, q0, None, length=iters)
        return (
            p1.sum().astype(jnp.float32) + q_out[0, 0],
            p2.sum(),
        )

    dt, _ = _timed_best(loop, q.astype(jnp.float32), q8x, lr)
    print(
        f"int8top2 XLA packed scan: {dt/iters*1e3:.2f} ms/batch{b}",
        flush=True,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sections", default="csweep,band,int8top2")
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--b", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--cs", default="32,24,16,12")
    args = p.parse_args()
    sections = args.sections.split(",")

    from qrag_tpu.ops.window_scan import WINDOW, make_lane_rank

    n = -(-args.n // 2048) * 2048
    corpus = make_corpus(n, args.d, jnp.bfloat16)
    sq = jnp.sum(
        corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=1
    )
    mx = jnp.sqrt(jnp.max(sq.reshape(-1, WINDOW), axis=1))
    lr = jnp.asarray(make_lane_rank(n))
    q = jax.random.normal(jax.random.PRNGKey(11), (args.b, args.d))
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.bfloat16)

    print(
        f"platform={jax.default_backend()} n={n} d={args.d} b={args.b} "
        f"k={args.k} iters={args.iters}",
        flush=True,
    )
    if "csweep" in sections:
        section_csweep(
            q, corpus, sq, mx, lr, args.iters, args.b, args.k,
            [int(c) for c in args.cs.split(",")],
        )
    if "band" in sections:
        section_band(q, corpus, sq, mx, lr, args.b, args.k, args.batches)
    if "int8top2" in sections:
        section_int8top2(q, corpus, lr, args.iters, args.b)


if __name__ == "__main__":
    main()
