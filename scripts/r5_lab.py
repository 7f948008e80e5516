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
    """Certificate-band census (untimed), via the PRODUCTION bound
    front-ends (`ops.bounded_topk.window_bounds_bf16/_int8` — no
    hand-copied replica that could silently desync).  Three margin
    regimes, each against its own refine-domain true top-k threshold:

      narrow  bf16 queries / bf16 scan / bf16 refine (the bench
              regime: scan aliases refine, coeff = f32 drift only)
      wide    f32 queries / bf16 scan / f32 refine (the production
              store_dtype="float32" index regime: bf16-rounding
              margins, ~5e-3 relative)
      int8    f32 queries / int8 scan / f32 refine (quantization
              residual margins)

    The per-query qualifying-window count is what cert_a's candidate
    budget C must cover; the batch-union decides restricted-second-
    scan feasibility."""
    from qrag_tpu.ops.bounded_topk import (
        window_bounds_bf16,
        window_bounds_int8,
        window_maxnorms_device,
        window_minsqnorms_device,
        window_quant_residuals_device,
    )
    from qrag_tpu.ops.window_scan import WINDOW, quantize_block_rows_device

    n, d = corpus.shape
    nw = n // WINDOW

    # wide/int8 regimes need a TRUE f32 refine corpus whose bf16/int8
    # scans are roundings of it (corpus arrives bf16 — perturb in f32
    # so refine != round(scan) exactly, as in a real f32 index store)
    corpus_f = corpus.astype(jnp.float32)
    corpus_f = corpus_f * (
        1.0
        + 3e-4
        * jax.random.normal(jax.random.PRNGKey(7), (n, 1), jnp.float32)
    )
    corpus_f = jax.jit(
        lambda x: x / jnp.linalg.norm(x, axis=1, keepdims=True)
    )(corpus_f)
    scan_w = corpus_f.astype(jnp.bfloat16)
    sq_f = jnp.sum(corpus_f * corpus_f, axis=1)
    mx_f = window_maxnorms_device(sq_f)
    q8x, wscale = jax.jit(quantize_block_rows_device)(corpus_f)
    minsq = window_minsqnorms_device(sq_f)
    resid = window_quant_residuals_device(corpus_f, q8x, wscale)

    def thr_fn(q32, corpus_ref, sq_ref):
        # true refine-domain top-k threshold (chunked oracle)
        def chunk_thr(qc):
            g = (
                2.0
                * jax.lax.dot_general(
                    qc, corpus_ref.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                - jnp.sum(qc * qc, axis=1, keepdims=True)
                - sq_ref[None, :]
            )
            vals, _ = jax.lax.top_k(g, k)
            return vals[:, k - 1]

        return jax.lax.map(
            chunk_thr, q32.reshape(-1, 128, q32.shape[1])
        ).reshape(-1)

    @jax.jit
    def census(qb, corpus, sq, mx, lr, corpus_f, scan_w, sq_f, mx_f):
        # NB: all big buffers are ARGUMENTS — closing a jit over them
        # bakes gigabytes of constants (CLAUDE.md trap; the first run
        # of this census did exactly that and wedged the compile)
        q32 = qb.astype(jnp.float32)

        # ---- narrow: bf16 queries, scan == refine (bench regime)
        thr_n = thr_fn(q32, corpus, sq)
        qb16 = qb.astype(jnp.bfloat16)
        _, _, ub_n, ub2_n, _, _ = window_bounds_bf16(
            qb16, corpus, corpus, sq, mx, lr, metric="l2"
        )
        count_n = jnp.sum(ub_n >= thr_n[:, None], axis=1)
        fc_n = jnp.sum(ub2_n >= thr_n[:, None], axis=1)

        # ---- mid: f32 queries, bf16 scan == bf16 refine (the common
        # serving regime: bf16 store, user queries arrive f32 — only
        # the query-rounding margin term fires)
        _, _, ub_m, ub2_m, _, _ = window_bounds_bf16(
            qb, corpus, corpus, sq, mx, lr, metric="l2"
        )
        count_m = jnp.sum(ub_m >= thr_n[:, None], axis=1)
        fc_m = jnp.sum(ub2_m >= thr_n[:, None], axis=1)

        # ---- wide: f32 queries, bf16 scan, f32 refine (production)
        thr_w = thr_fn(q32, corpus_f, sq_f)
        _, _, ub_w, ub2_w, _, _ = window_bounds_bf16(
            q32, scan_w, corpus_f, sq_f, mx_f, lr, metric="l2"
        )
        qual_w = ub_w >= thr_w[:, None]
        count_w = jnp.sum(qual_w, axis=1)
        union_w = jnp.sum(jnp.any(qual_w, axis=0))
        fc_w = jnp.sum(ub2_w >= thr_w[:, None], axis=1)

        return (count_n, fc_n, count_m, fc_m, count_w, fc_w, union_w,
                thr_w)

    @jax.jit
    def census_i8(qb, thr_w, corpus_f, sq_f, mx_f, q8x, wscale, minsq,
                  resid, lr):
        # int8 bounds build a (chunk, N) int32 dot plane — chunk the
        # query axis so three live copies of a (B, N) i32 buffer
        # (11.5 GB at B=1024, N=1M) never exist (OOM'd at full B)
        q32 = qb.astype(jnp.float32)

        def one(args):
            qc, tc = args
            _, _, ub_8, ub2_8, _, _, _ = window_bounds_int8(
                qc, q8x, wscale, corpus_f, sq_f, mx_f, minsq, resid,
                lr, metric="l2",
            )
            qual = ub_8 >= tc[:, None]
            return (
                jnp.sum(qual, axis=1),
                jnp.sum(ub2_8 >= tc[:, None], axis=1),
                jnp.any(qual, axis=0),
            )

        cnt, fc, anyw = jax.lax.map(
            one,
            (q32.reshape(-1, 128, q32.shape[1]),
             thr_w.reshape(-1, 128)),
        )
        return (
            cnt.reshape(-1), fc.reshape(-1),
            jnp.sum(jnp.any(anyw, axis=0)),
        )

    rows = {"narrow": [], "mid": [], "wide": [], "int8": []}
    fl = {"narrow": [], "mid": [], "wide": [], "int8": []}
    unions = {"wide": [], "int8": []}
    key = jax.random.PRNGKey(101)
    for i in range(batches):
        key, sub = jax.random.split(key)
        qb = jax.random.normal(sub, q.shape, jnp.float32)
        qb = qb / jnp.linalg.norm(qb, axis=1, keepdims=True)
        cn, fn_, cm, fm, cw, fw, uw, thr_w = census(
            qb, corpus, sq, mx, lr, corpus_f, scan_w, sq_f, mx_f,
        )
        c8, f8, u8 = census_i8(
            qb, thr_w, corpus_f, sq_f, mx_f, q8x, wscale, minsq,
            resid, lr,
        )
        rows["narrow"].append(np.asarray(cn))
        rows["mid"].append(np.asarray(cm))
        rows["wide"].append(np.asarray(cw))
        rows["int8"].append(np.asarray(c8))
        fl["narrow"].append(np.asarray(fn_))
        fl["mid"].append(np.asarray(fm))
        fl["wide"].append(np.asarray(fw))
        fl["int8"].append(np.asarray(f8))
        unions["wide"].append(int(np.asarray(uw)))
        unions["int8"].append(int(np.asarray(u8)))
    for name in ("narrow", "mid", "wide", "int8"):
        c = np.concatenate(rows[name])
        f = np.stack(fl[name])  # (batches, B) cert_b flag counts
        extra = ""
        if name in unions:
            u = np.mean(unions[name])
            extra = f", batch-union {u:,.0f}/{nw} ({100*u/nw:.1f}%)"
        print(
            f"band {name}: qualifying windows/query mean {c.mean():.1f} "
            f"p99 {np.percentile(c, 99):.0f} max {c.max()}"
            f" (cert_a needs max <= C){extra}",
            flush=True,
        )
        print(
            f"  cert_b {name}: flags/query mean {f.mean():.2f} max "
            f"{f.max()}; flagged-queries/batch{b} mean "
            f"{(f > 0).sum(axis=1).mean():.1f} max {(f > 0).sum(axis=1).max()}"
            f" (budget: <=2 flags/query AND <=F flagged queries)",
            flush=True,
        )


def section_widesweep(q, corpus, sq, mx, lr, iters, b, k, cfs,
                      regime="wide"):
    """Timed (C, F) budget sweep for the wider margin regimes:

      wide  f32 queries / bf16 scan / f32 refine (store_dtype=f32)
      mid   f32 queries / bf16 scan == refine (bf16 store, f32 queries
            — the common serving regime)

    cert_b's flagged-query budget F binds at the BATCH level, so C and
    F must clear the band TOGETHER or every batch pays the 4x
    escalation tier (measured: C=96/F=32 is strictly slower than
    C=48/F=32 because tier-2's 4C gather scales with C)."""
    from qrag_tpu.ops.bounded_topk import (
        bounded_exact_topk,
        window_maxnorms_device,
    )

    if regime == "wide":
        corpus_f = corpus.astype(jnp.float32)
        corpus_f = corpus_f * (
            1.0
            + 3e-4
            * jax.random.normal(
                jax.random.PRNGKey(7), (corpus.shape[0], 1)
            )
        )
        corpus_f = jax.jit(
            lambda x: x / jnp.linalg.norm(x, axis=1, keepdims=True)
        )(corpus_f)
        scan_w = corpus_f.astype(jnp.bfloat16)
        sq_f = jnp.sum(corpus_f * corpus_f, axis=1)
        mx_f = window_maxnorms_device(sq_f)
    else:  # mid: bf16 store, scan aliases refine
        corpus_f, scan_w, sq_f, mx_f = corpus, corpus, sq, mx
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    q0 = q.astype(jnp.float32)

    for C, F in cfs:
        @jax.jit
        def loop(q0, scan_, corpus_, sq_, mx_, lr_, C=C, F=F):
            def body(carry, _):
                vals, idx, fb, npatch, esc = bounded_exact_topk(
                    carry, scan_, corpus_, sq_, mx_, lr_, k,
                    metric="l2", candidates=C, patch_queries=F,
                    backend=backend,
                )
                carry = carry + 1e-9 * vals[:, :1]
                return carry, (vals.sum(), idx.sum(), fb, esc)

            q_out, (v, i, fbs, escs) = jax.lax.scan(
                body, q0, None, length=iters
            )
            return (
                v.sum() + q_out[0, 0],
                i.sum(),
                fbs.sum(),
                escs.sum(),
            )

        dt, r = _timed_best(loop, q0, scan_w, corpus_f, sq_f, mx_f, lr)
        print(
            f"{regime}sweep C={C} F={F}: {dt/iters*1e3:.2f} ms/batch{b} "
            f"({b*iters/dt:,.0f} QPS), fallback {int(np.asarray(r[2]))}"
            f"/{iters} escalated {int(np.asarray(r[3]))}/{iters}",
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
    p.add_argument(
        "--cfs", default="96:96,64:96,48:32",
        help="comma list of C:F budget pairs for mid/widesweep",
    )
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
    if "widesweep" in sections or "midsweep" in sections:
        cfs = [
            tuple(int(v) for v in pair.split(":"))
            for pair in args.cfs.split(",")
        ]
        if "midsweep" in sections:
            section_widesweep(
                q, corpus, sq, mx, lr, args.iters, args.b, args.k,
                cfs, regime="mid",
            )
        if "widesweep" in sections:
            section_widesweep(
                q, corpus, sq, mx, lr, args.iters, args.b, args.k,
                cfs, regime="wide",
            )
    if "int8top2" in sections:
        section_int8top2(q, corpus, lr, args.iters, args.b)


if __name__ == "__main__":
    main()
