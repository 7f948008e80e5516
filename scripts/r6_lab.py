"""Round-4 (final session) TPU perf lab: where the remaining
bounded-exact fat lives, and the small-batch latency profile.

One session, one process (CLAUDE.md rules: loop inside one jit with
full-column dependence; consume results; compare within a run).

    python scripts/r6_lab.py --sections floor,scan,stages,latency

Sections (1M x 768 bf16 / B=1024 / k=10 defaults):
  floor     bf16 matmul + rowmax — the scan's physical floor
  scan      transposed packed kernel, planes=1/2/3, bn=1024/2048:
            epilogue cost per extra plane (the masked sublane maxes)
  stages    bounded pipeline decomposition measured as deltas:
            front-end (scan+margins) alone, +selection, +gather,
            +refine, full op — names the ms each stage adds
  latency   full bounded_exact_topk at B in {1, 8, 32, 128}:
            the single-query latency profile (HBM-bound regime)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from qrag_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_corpus, _timed_best, bench_matmul_floor  # noqa: E402
from qrag_tpu.ops.window_scan import WINDOW, make_lane_rank  # noqa: E402


def _setup(n, d, b, dtype=jnp.bfloat16):
    corpus = make_corpus(n, d, jnp.bfloat16)
    sq = jnp.sum(
        corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=1
    )
    mx = jnp.sqrt(jnp.max(sq.reshape(-1, WINDOW), axis=1))
    lr = jnp.asarray(make_lane_rank(n))
    q = jax.random.normal(jax.random.PRNGKey(11), (b, d), jnp.float32)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(dtype)
    np.asarray(sq[0])
    return q, corpus, sq, mx, lr


def section_scan(q, corpus, iters, b):
    from qrag_tpu.ops.pallas.fused_scan import (
        pallas_packed_window_scan_top2_t,
    )

    for bn in (1024, 2048):
        for planes in (1, 2, 3):
            @jax.jit
            def loop(q0, x, bn=bn, planes=planes):
                def body(carry, _):
                    pks = pallas_packed_window_scan_top2_t(
                        carry, x, bn=bn, planes=planes
                    )
                    carry = carry + (
                        1e-9 * (pks[0][:, :1] & 1).astype(jnp.float32)
                    ).astype(carry.dtype)
                    return carry, pks[0][0, 0]

                q_out, v = jax.lax.scan(body, q0, None, length=iters)
                return (
                    v.sum().astype(jnp.float32)
                    + q_out[0, 0].astype(jnp.float32),
                    v,
                )

            dt, _ = _timed_best(loop, q, corpus)
            print(
                f"scan transposed bn={bn} planes={planes}: "
                f"{dt/iters*1e3:.2f} ms/batch{b}",
                flush=True,
            )


def section_stages(q, corpus, sq, mx, lr, iters, b, k, C=16):
    from qrag_tpu.ops.bounded_topk import (
        bounded_exact_topk,
        window_bounds_bf16,
    )

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    # ---- stage A: front-end alone (scan + margins + bounds)
    @jax.jit
    def loop_front(q0, x, sq_, mx_, lr_):
        def body(carry, _):
            out = window_bounds_bf16(
                carry, x, x, sq_, mx_, lr_, metric="l2", backend=backend
            )
            ub = out[2]
            carry = carry + (1e-30 * ub[:, :1]).astype(carry.dtype)
            return carry, ub[0, 0]

        q_out, v = jax.lax.scan(body, q0, None, length=iters)
        return v.sum() + q_out[0, 0].astype(jnp.float32), v

    dt_a, _ = _timed_best(loop_front, q, corpus, sq, mx, lr)
    print(f"stages A front-end (scan+bounds): {dt_a/iters*1e3:.2f} ms/batch{b}",
          flush=True)

    # ---- stage B: + top-C selection (approx_max_k over the plane)
    @jax.jit
    def loop_sel(q0, x, sq_, mx_, lr_):
        def body(carry, _):
            out = window_bounds_bf16(
                carry, x, x, sq_, mx_, lr_, metric="l2", backend=backend
            )
            ub, lane1 = out[2], out[5]
            _, wsel = jax.lax.approx_max_k(ub, C, recall_target=0.999)
            cand_idx = wsel * WINDOW + jnp.take_along_axis(
                lane1, wsel, axis=1
            )
            carry = carry + (
                1e-9 * (cand_idx[:, :1] & 1).astype(jnp.float32)
            ).astype(carry.dtype)
            return carry, cand_idx[0, 0]

        q_out, v = jax.lax.scan(body, q0, None, length=iters)
        return v.sum().astype(jnp.float32) + q_out[0, 0].astype(jnp.float32), v

    dt_b, _ = _timed_best(loop_sel, q, corpus, sq, mx, lr)
    print(f"stages B +selection (C={C}): {dt_b/iters*1e3:.2f} ms/batch{b} "
          f"(delta {(dt_b-dt_a)/iters*1e3:+.2f})", flush=True)

    # ---- stage C: + candidate gather (jnp.take)
    @jax.jit
    def loop_gather(q0, x, sq_, mx_, lr_):
        def body(carry, _):
            out = window_bounds_bf16(
                carry, x, x, sq_, mx_, lr_, metric="l2", backend=backend
            )
            ub, lane1 = out[2], out[5]
            _, wsel = jax.lax.approx_max_k(ub, C, recall_target=0.999)
            cand_idx = wsel * WINDOW + jnp.take_along_axis(
                lane1, wsel, axis=1
            )
            rows = jnp.take(x, cand_idx, axis=0)  # (B, C, d)
            carry = carry + (
                1e-9 * rows[:, 0, :1].astype(jnp.float32)
            ).astype(carry.dtype)
            return carry, rows[0, 0, 0]

        q_out, v = jax.lax.scan(body, q0, None, length=iters)
        return v.sum().astype(jnp.float32) + q_out[0, 0].astype(jnp.float32), v

    dt_c, _ = _timed_best(loop_gather, q, corpus, sq, mx, lr)
    print(f"stages C +gather: {dt_c/iters*1e3:.2f} ms/batch{b} "
          f"(delta {(dt_c-dt_b)/iters*1e3:+.2f})", flush=True)

    # ---- stage D: full op
    @jax.jit
    def loop_full(q0, x, sq_, mx_, lr_):
        def body(carry, _):
            vals, idx, fb, npatch, esc = bounded_exact_topk(
                carry, x, x, sq_, mx_, lr_, k, metric="l2",
                backend=backend,
            )
            carry = carry + (1e-9 * vals[:, :1]).astype(carry.dtype)
            return carry, (vals.sum(), fb)

        q_out, (v, fbs) = jax.lax.scan(body, q0, None, length=iters)
        return v.sum() + q_out[0, 0].astype(jnp.float32), fbs.sum()

    dt_d, r = _timed_best(loop_full, q, corpus, sq, mx, lr)
    print(f"stages D full bounded: {dt_d/iters*1e3:.2f} ms/batch{b} "
          f"(delta {(dt_d-dt_c)/iters*1e3:+.2f} = refine+certs+patch; "
          f"fallbacks {int(np.asarray(r[1]))}/{iters})", flush=True)


def section_latency(corpus, sq, mx, lr, k, d):
    from qrag_tpu.ops.bounded_topk import bounded_exact_topk

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    for b in (1, 8, 32, 128):
        q = jax.random.normal(jax.random.PRNGKey(3), (b, d), jnp.float32)
        q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(
            jnp.bfloat16
        )
        iters = 8

        @jax.jit
        def loop(q0, x, sq_, mx_, lr_):
            def body(carry, _):
                vals, idx, fb, npatch, esc = bounded_exact_topk(
                    carry, x, x, sq_, mx_, lr_, k, metric="l2",
                    backend=backend,
                )
                carry = carry + (1e-9 * vals[:, :1]).astype(carry.dtype)
                return carry, (vals.sum(), fb)

            q_out, (v, fbs) = jax.lax.scan(body, q0, None, length=iters)
            return v.sum() + q_out[0, 0].astype(jnp.float32), fbs.sum()

        dt, r = _timed_best(loop, q, corpus, sq, mx, lr)
        print(
            f"latency B={b}: {dt/iters*1e3:.2f} ms/query-batch "
            f"(fallbacks {int(np.asarray(r[1]))}/{iters})",
            flush=True,
        )


def section_accel(n, d, k):
    """Small-batch latency: cluster-pruned exact vs the bounded scan
    on a CLUSTERED corpus (mixture of Gaussians on the sphere — the
    geometry real embedding corpora have; uniform corpora defeat the
    bounds by construction and ride the fallback)."""
    from qrag_tpu.ops.bounded_topk import bounded_exact_topk
    from qrag_tpu.ops.cluster_topk import (
        build_clustered_groups,
        cluster_pruned_topk,
    )
    from qrag_tpu.ops.window_scan import WINDOW, make_lane_rank

    n = -(-n // 2048) * 2048
    # ~8 groups per natural cluster: the 512-row groups must subdivide
    # the mixture components, not span several (a group spanning two
    # centers has radius ~ the inter-center distance and prunes
    # nothing — the first cut of this lab made that mistake with
    # n_centers >> n_groups and measured 100% fallbacks)
    n_centers = max(16, n // (512 * 8))

    # within-cluster noise NORM ~0.25 (spread scales 1/sqrt(d): a
    # constant per-coordinate sigma at d=768 would swamp the unit
    # centers and the "clusters" would cover the sphere)
    spread = 0.25 / float(np.sqrt(d))

    @jax.jit
    def gen():
        kc, kw, kn = jax.random.split(jax.random.PRNGKey(42), 3)
        centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
        centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
        which = jax.random.randint(kw, (n,), 0, n_centers)
        x = centers[which] + spread * jax.random.normal(
            kn, (n, d), jnp.float32
        )
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(jnp.bfloat16), which

    t0 = time.time()
    corpus, which = gen()
    np.asarray(which[0])
    print(f"accel: clustered corpus gen {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    groups = build_clustered_groups(corpus, group_rows=512, kmeans_iters=6)
    np.asarray(groups.radii[0])
    print(f"accel: build {time.time()-t0:.1f}s "
          f"(G={groups.centroids.shape[0]})", flush=True)

    sq = jnp.sum(
        corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=1
    )
    mx = jnp.sqrt(jnp.max(sq.reshape(-1, WINDOW), axis=1))
    lr = jnp.asarray(make_lane_rank(corpus.shape[0]))
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    for b in (1, 8, 32):
        kq = jax.random.PRNGKey(b)
        q = corpus[jax.random.randint(kq, (b,), 0, n)].astype(jnp.float32)
        q = q + (0.1 / float(np.sqrt(d))) * jax.random.normal(
            kq, (b, d), jnp.float32
        )
        iters = 32

        @jax.jit
        def loop_cluster(q0, *g):
            cg = type(groups)(*g, groups.group_rows)

            def body(carry, _):
                vals, idx, fb, esc = cluster_pruned_topk(
                    carry, cg, k, metric="l2"
                )
                carry = carry + (1e-9 * vals[:, :1]).astype(carry.dtype)
                return carry, (vals.sum(), fb, esc)

            q_out, (v, fbs, escs) = jax.lax.scan(body, q0, None, length=iters)
            return (
                v.sum() + q_out[0, 0].astype(jnp.float32),
                fbs.sum(), escs.sum(),
            )

        dt, r = _timed_best(loop_cluster, q, *groups[:-1])
        print(
            f"accel B={b}: clustered {dt/iters*1e3:.3f} ms/query-batch "
            f"(fb {int(np.asarray(r[1]))}/{iters}, "
            f"esc {int(np.asarray(r[2]))}/{iters})",
            flush=True,
        )

        @jax.jit
        def loop_bounded(q0, x, sq_, mx_, lr_):
            def body(carry, _):
                vals, idx, fb, npatch, esc = bounded_exact_topk(
                    carry, x, x, sq_, mx_, lr_, k, metric="l2",
                    backend=backend,
                )
                carry = carry + (1e-9 * vals[:, :1]).astype(carry.dtype)
                return carry, vals.sum()

            q_out, v = jax.lax.scan(body, q0, None, length=iters)
            return v.sum() + q_out[0, 0].astype(jnp.float32), v

        dt_b, _ = _timed_best(loop_bounded, q.astype(jnp.bfloat16),
                              corpus, sq, mx, lr)
        print(
            f"accel B={b}: bounded   {dt_b/iters*1e3:.3f} ms/query-batch "
            f"({dt_b/max(dt,1e-12):.1f}x)",
            flush=True,
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sections", default="floor,scan,stages")
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--b", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=16)
    args = p.parse_args()
    sections = args.sections.split(",")

    n = -(-args.n // 2048) * 2048
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    t0 = time.time()
    q, corpus, sq, mx, lr = _setup(n, args.d, args.b)
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    if "floor" in sections:
        fl = bench_matmul_floor(n, args.d, args.b, args.iters)
        print(f"floor matmul+rowmax: {fl*1e3:.2f} ms/batch{args.b}",
              flush=True)
    if "scan" in sections:
        section_scan(q, corpus, args.iters, args.b)
    if "stages" in sections:
        section_stages(q, corpus, sq, mx, lr, args.iters, args.b, args.k)
    if "latency" in sections:
        section_latency(corpus, sq, mx, lr, args.k, args.d)
    if "accel" in sections:
        section_accel(args.n, args.d, args.k)


if __name__ == "__main__":
    main()
