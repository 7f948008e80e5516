"""Round-4 TPU perf lab: bounded-exact decomposition + levers.

One session, one process (CLAUDE.md: compare within a run; loop inside
one jit with full-column dependence; consume results).  Sections are
flag-selectable so iterations stay cheap:

    python scripts/r4_lab.py --sections floor,top2,int8,gather

Measures (1M x 768 / B=1024 defaults):
  floor   bf16 matmul + rowmax (the scan floor)
  top2    raw top-2 packed scan at bn=512/1024/2048 (+ no-fold probe:
          isolates the plane-transpose cost VERDICT r3 #1 names)
  int8    XLA int8 matmul rate + Mosaic int8 packed scan rate at
          bn=512/2048 (is the 2x MXU mode engaged on this toolchain?)
  gather  jnp.take candidate-row gather baseline (B*C rows), the
          ~15-30 GB/s wall VERDICT r3 #3 names
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import make_corpus, _timed_best  # noqa: E402


def section_floor(q, corpus, sq, iters, b):
    @jax.jit
    def loop(q0, corpus_, sq_):
        def body(carry, _):
            g = jax.lax.dot_general(
                carry, corpus_,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            g = 2.0 * g - sq_[None, :]
            m = jnp.max(g, axis=1, keepdims=True)
            carry = carry + (1e-9 * m[:, :1]).astype(carry.dtype)
            return carry, m.sum()

        q_out, ms = jax.lax.scan(body, q0, None, length=iters)
        return ms.sum() + q_out[0, 0].astype(jnp.float32), ms

    dt, _ = _timed_best(loop, q, corpus, sq)
    print(f"floor bf16 matmul+rowmax: {dt/iters*1e3:.2f} ms/batch{b}", flush=True)


def section_top2(q, corpus, sq, iters, b, bns, fold):
    from qrag_tpu.ops.pallas import fused_scan as fs

    for bn in bns:
        @jax.jit
        def loop(q0, corpus_, sq_, bn=bn):
            ra = -sq_[None, :]

            def body(carry, _):
                ca = -jnp.sum(
                    carry.astype(jnp.float32) ** 2, axis=1, keepdims=True
                )
                pk1, pk2 = fs.pallas_packed_window_scan_top2(
                    carry, corpus_, bn=bn, row_add=ra, col_add=ca, alpha=2.0
                )
                carry = carry + (
                    1e-9 * pk1[:, :1].astype(jnp.float32)
                ).astype(carry.dtype)
                return carry, (pk1.sum(), pk2.sum())

            q_out, (p1, p2) = jax.lax.scan(body, q0, None, length=iters)
            return (
                p1.sum().astype(jnp.float32) + q_out[0, 0].astype(jnp.float32),
                p2.sum(),
            )

        try:
            dt, _ = _timed_best(loop, q, corpus, sq)
            print(f"top2 scan bn={bn}: {dt/iters*1e3:.2f} ms/batch{b}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"top2 scan bn={bn}: FAILED {type(e).__name__}: {e}", flush=True)

    if not fold:
        return
    # no-fold probe: same kernel, consume the tile-leading output
    # directly (sum reduces IN the bad layout but is tiny) — the delta
    # vs the folded number is the two plane transposes
    import qrag_tpu.ops.pallas.fused_scan as fsm

    real_fold = fsm._fold_planes
    try:
        fsm._fold_planes = lambda out, b_, nw: jax.lax.optimization_barrier(
            out.reshape(out.shape[0] * out.shape[1], nw)[: b_]
        )

        @jax.jit
        def loop_nf(q0, corpus_, sq_):
            ra = -sq_[None, :]

            def body(carry, _):
                ca = -jnp.sum(
                    carry.astype(jnp.float32) ** 2, axis=1, keepdims=True
                )
                pk1, pk2 = fs.pallas_packed_window_scan_top2(
                    carry, corpus_, bn=512, row_add=ra, col_add=ca, alpha=2.0
                )
                carry = carry + (
                    1e-9 * pk1[:1, :1].astype(jnp.float32)
                ).astype(carry.dtype)
                return carry, (pk1.sum(), pk2.sum())

            q_out, (p1, p2) = jax.lax.scan(body, q0, None, length=iters)
            return (
                p1.sum().astype(jnp.float32) + q_out[0, 0].astype(jnp.float32),
                p2.sum(),
            )

        dt, _ = _timed_best(loop_nf, q, corpus, sq)
        print(
            f"top2 scan bn=512 NO-FOLD probe: {dt/iters*1e3:.2f} ms/batch{b}",
            flush=True,
        )
    finally:
        fsm._fold_planes = real_fold


def section_top2t(q, corpus, sq, iters, b, bns, bms=(1024,)):
    from qrag_tpu.ops.pallas import fused_scan as fs

    for bn in bns:
        for bm in bms:
            @jax.jit
            def loop(q0, corpus_, sq_, bn=bn, bm=bm):
                ra = -sq_[None, :]

                def body(carry, _):
                    ca = -jnp.sum(
                        carry.astype(jnp.float32) ** 2, axis=1, keepdims=True
                    )
                    pk1, pk2 = fs.pallas_packed_window_scan_top2_t(
                        carry, corpus_, bm=bm, bn=bn,
                        row_add=ra, col_add=ca, alpha=2.0,
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

            try:
                dt, _ = _timed_best(loop, q, corpus, sq)
                print(
                    f"top2 TRANSPOSED bn={bn} bm={bm}: {dt/iters*1e3:.2f} "
                    f"ms/batch{b}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(
                    f"top2 TRANSPOSED bn={bn} bm={bm}: FAILED "
                    f"{type(e).__name__}: {str(e)[:200]}",
                    flush=True,
                )


def section_int8(q, corpus, sq, iters, b, bns):
    from qrag_tpu.ops.pallas import fused_scan as fs
    from qrag_tpu.ops.window_scan import quantize_block_rows_device

    c8, wscale = jax.jit(quantize_block_rows_device)(
        corpus.astype(jnp.float32)
    )
    np.asarray(wscale[0])
    q8 = jnp.clip(
        jnp.round(q.astype(jnp.float32) * 127.0), -127, 127
    ).astype(jnp.int8)

    @jax.jit
    def xla_loop(q0, c8_):
        def body(carry, _):
            dots = jax.lax.dot_general(
                carry, c8_,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            m = jnp.max(dots, axis=1, keepdims=True)
            # full-column data dependence that cannot constant-fold:
            # a data-dependent select (m is the rowmax over ALL cols)
            carry = jnp.where(m > jnp.int32(2**30), -carry, carry)
            return carry, m.sum()

        q_out, ms = jax.lax.scan(body, q0, None, length=iters)
        return ms.sum() + q_out[0, 0].astype(jnp.int32), ms

    dt, _ = _timed_best(xla_loop, q8, c8)
    print(f"int8 XLA matmul+rowmax: {dt/iters*1e3:.2f} ms/batch{b}", flush=True)

    for bn in bns:
        @jax.jit
        def loop(q0, c8_, bn=bn):
            def body(carry, _):
                pk = fs.pallas_packed_window_scan(carry, c8_, bn=bn)
                carry = jnp.where(pk[:, :1] > jnp.int32(2**30), -carry, carry)
                return carry, pk.sum()

            q_out, ps = jax.lax.scan(body, q0, None, length=iters)
            return ps.sum() + q_out[0, 0].astype(jnp.int32), ps

        try:
            dt, _ = _timed_best(loop, q8, c8)
            print(
                f"int8 Mosaic packed scan bn={bn}: {dt/iters*1e3:.2f} "
                f"ms/batch{b}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"int8 Mosaic bn={bn}: FAILED {type(e).__name__}: {e}", flush=True)


def section_gather(q, corpus, sq, iters, b, cands):
    n = corpus.shape[0]
    key = jax.random.PRNGKey(3)
    idx = jax.random.randint(key, (b, cands), 0, n, dtype=jnp.int32)
    # sorted per query (the kernel-friendly form; cost of the sort is
    # measured separately below)
    idx_sorted = jnp.sort(idx, axis=1)

    for name, ids in (("random", idx), ("sorted", idx_sorted)):
        @jax.jit
        def loop(ids_, corpus_):
            def body(carry, _):
                rows = jnp.take(corpus_, carry, axis=0)  # (B, C, d)
                s = jnp.sum(rows.astype(jnp.float32), axis=(1, 2))
                carry = (carry + (s[:, None] > 1e30).astype(jnp.int32)) % n
                return carry, s.sum()

            ids_out, ss = jax.lax.scan(body, ids_, None, length=iters)
            return ss.sum() + ids_out[0, 0].astype(jnp.float32), ss

        dt, _ = _timed_best(loop, ids, corpus)
        nbytes = b * cands * corpus.shape[1] * corpus.dtype.itemsize
        print(
            f"jnp.take {name} ({b}x{cands} rows, {nbytes/1e6:.0f} MB): "
            f"{dt/iters*1e3:.2f} ms = {nbytes/(dt/iters)/1e9:.1f} GB/s",
            flush=True,
        )


def section_gatherk(q, corpus, sq, iters, b, cands):
    """Pallas DMA gather kernel vs jnp.take (VERDICT r4 item 3:
    >=3x on a ~40k-row x 1.5 KB f32 same-session microbench)."""
    from qrag_tpu.ops.pallas.gather_rows import gather_rows

    n = corpus.shape[0]
    key = jax.random.PRNGKey(3)
    m = b * cands
    idx = jax.random.randint(key, (m,), 0, n, dtype=jnp.int32)

    for name, corp in (("bf16", corpus), ("f32", corpus.astype(jnp.float32))):
        nbytes = m * corp.shape[1] * corp.dtype.itemsize

        @jax.jit
        def take_loop(ids_, corpus_):
            def body(carry, _):
                rows = jnp.take(corpus_, carry, axis=0)
                s = jnp.sum(rows.astype(jnp.float32), axis=1)
                carry = (carry + (s > 1e30).astype(jnp.int32)) % n
                return carry, s.sum()

            ids_out, ss = jax.lax.scan(body, ids_, None, length=iters)
            return ss.sum() + ids_out[0].astype(jnp.float32), ss

        dt, _ = _timed_best(take_loop, idx, corp)
        base = dt / iters * 1e3
        print(
            f"take {name} ({m} rows, {nbytes/1e6:.0f} MB): {base:.2f} ms "
            f"= {nbytes/(dt/iters)/1e9:.1f} GB/s",
            flush=True,
        )
        for rpb in (128, 256, 512):
            @jax.jit
            def k_loop(ids_, corpus_, rpb=rpb):
                def body(carry, _):
                    rows = gather_rows(corpus_, carry, rows_per_block=rpb)
                    s = jnp.sum(rows.astype(jnp.float32), axis=1)
                    carry = (carry + (s > 1e30).astype(jnp.int32)) % n
                    return carry, s.sum()

                ids_out, ss = jax.lax.scan(body, ids_, None, length=iters)
                return ss.sum() + ids_out[0].astype(jnp.float32), ss

            try:
                dt, _ = _timed_best(k_loop, idx, corp)
                ms = dt / iters * 1e3
                print(
                    f"gather_rows {name} rpb={rpb}: {ms:.2f} ms "
                    f"= {nbytes/(dt/iters)/1e9:.1f} GB/s "
                    f"({base/ms:.2f}x take)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(
                    f"gather_rows {name} rpb={rpb}: FAILED "
                    f"{type(e).__name__}: {str(e)[:200]}",
                    flush=True,
                )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--b", type=int, default=1024)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--cands", type=int, default=32)
    p.add_argument("--sections", default="floor,top2,int8,gather")
    p.add_argument("--bns", default="512,1024,2048")
    args = p.parse_args()
    n = -(-args.n // 4096) * 4096
    bns = [int(x) for x in args.bns.split(",")]

    t0 = time.time()
    corpus = make_corpus(n, args.d, jnp.bfloat16)
    sq = jnp.sum(
        corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=1
    )
    np.asarray(sq[0])
    q = jax.random.normal(jax.random.PRNGKey(7), (args.b, args.d), jnp.float32)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.bfloat16)
    print(f"# setup {time.time()-t0:.1f}s  n={n}", file=sys.stderr, flush=True)

    secs = args.sections.split(",")
    if "floor" in secs:
        section_floor(q, corpus, sq, args.iters, args.b)
    if "top2" in secs:
        section_top2(q, corpus, sq, args.iters, args.b, bns, fold=True)
    if "top2t" in secs:
        section_top2t(q, corpus, sq, args.iters, args.b, bns)
    if "int8" in secs:
        section_int8(q, corpus, sq, args.iters, args.b, [512, 2048])
    if "gather" in secs:
        section_gather(q, corpus, sq, args.iters, args.b, args.cands)
    if "gatherk" in secs:
        section_gatherk(q, corpus, sq, args.iters, args.b, args.cands)


if __name__ == "__main__":
    main()
