#!/usr/bin/env python
"""Headline benchmark: exact top-10 dense retrieval throughput on a
1M x 768 corpus, one TPU chip (BASELINE.json configs[2] / north star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}

vs_baseline is measured QPS / 1e6 — the north-star target of >=1M QPS
exact top-10 on 1M x 768 per chip (the reference itself publishes no
numbers; BASELINE.md `published: {}`).

The recorded VALUE is the PROVABLY-EXACT retrieval mode ("bounded":
norm-bounded window pruning, ops/bounded_topk.py — exact identity and
tie order, certified on device), matching the metric's literal "exact
top-10" name.  The approx-mode number (recall@10 ~0.999, the serving
default's throughput class) is recorded in extra.

Methodology notes (measured on v5e via the axon tunnel):
  * per-dispatch tunnel latency is tens of ms, so the benched loop runs
    ITERS dependent retrieval steps inside ONE jit (lax.scan) and is
    timed with forced host consumption of the (tiny) outputs;
  * the corpus is generated directly on device (no 3 GB host transfer);
  * every companion metric shares the headline's chip session
    (sessions drift 10-18%; docs/PERFORMANCE.md).

Usage: python bench.py [--small] [--mode approx|exact] [--all]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

# ----------------------------------------------------------------- preflight
# Round-4 shipped blind: the axon tunnel wedged inside
# enable_compilation_cache()'s backend init and bench.py burned the
# driver's whole timeout emitting ZERO JSON (BENCH_r04 rc=124,
# parsed=null).  Everything here runs BEFORE jax is imported:
#   * a subprocess probe (tiny timed matmul) fails FAST with a
#     diagnostic JSON line if the tunnel is wedged;
#   * a watchdog thread prints whatever has been measured so far and
#     force-exits if the deadline passes (a hung RPC blocks the main
#     thread in C, so only another thread can still emit output).

RESULTS: dict = {}  # progressively filled; watchdog flushes on wedge
_SECTION = ["startup"]
_JSON_PRINTED = threading.Event()

# a healthy-but-cold tunnel takes 60-75 s to first-touch (measured
# r5); 150 s false-positived under transient load — 240 s still fails
# fast relative to the driver's ~25 min budget
PROBE_TIMEOUT_S = float(os.environ.get("QRAG_BENCH_PROBE_TIMEOUT_S", 240))
DEADLINE_S = float(os.environ.get("QRAG_BENCH_DEADLINE_S", 1320))

_PROBE_CODE = (
    "import time; t0=time.time()\n"
    "import jax, numpy as np, jax.numpy as jnp\n"
    "x = jnp.ones((256, 256), jnp.bfloat16)\n"
    "v = float(np.asarray(jax.jit(lambda a: a @ a)(x))[0, 0])\n"
    "print(f'probe ok v={v} backend={jax.default_backend()} "
    "t={time.time()-t0:.1f}s')\n"
)


def _emit_json(payload: dict) -> None:
    if _JSON_PRINTED.is_set():
        return
    _JSON_PRINTED.set()
    print(json.dumps(payload), flush=True)


def _diagnostic_payload(error: str, extra: dict) -> dict:
    base = {
        "metric": "retrieval_qps_exact_top10_1000000x768_1chip",
        "value": RESULTS.get("value", 0.0),
        "unit": "qps",
        "vs_baseline": RESULTS.get("vs_baseline", 0.0),
        "error": error,
        "extra": {**RESULTS.get("extra", {}), **extra},
    }
    if "metric" in RESULTS:
        base["metric"] = RESULTS["metric"]
    return base


def _probe_tunnel() -> None:
    """Tiny timed matmul in a SUBPROCESS (a wedged tunnel hangs the
    interpreter itself — only a killable child can be timed out)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            capture_output=True,
            text=True,
            timeout=PROBE_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired as e:
        _emit_json(
            _diagnostic_payload(
                f"tpu_tunnel_probe_timeout_{int(PROBE_TIMEOUT_S)}s",
                {"probe_stderr_tail": str(e.stderr or "")[-400:]},
            )
        )
        sys.exit(0)
    if r.returncode != 0:
        _emit_json(
            _diagnostic_payload(
                f"tpu_tunnel_probe_failed_rc{r.returncode}",
                {"probe_stderr_tail": (r.stderr or "")[-400:]},
            )
        )
        sys.exit(0)
    print(f"# {r.stdout.strip()}", file=sys.stderr, flush=True)


def _start_watchdog() -> None:
    deadline = time.time() + DEADLINE_S

    def fire():
        remaining = deadline - time.time()
        while remaining > 0:
            time.sleep(min(remaining, 5.0))
            if _JSON_PRINTED.is_set():
                return
            remaining = deadline - time.time()
        if _JSON_PRINTED.is_set():
            return
        payload = _diagnostic_payload(
            f"bench_deadline_{int(DEADLINE_S)}s_exceeded_in_"
            f"{_SECTION[0]}",
            {"completed_sections": sorted(RESULTS.get("extra", {}))},
        )
        # stdout may be block-buffered under the driver: write the
        # line with os.write so it lands even as we force-exit
        os.write(1, (json.dumps(payload) + "\n").encode())
        os._exit(0)

    threading.Thread(target=fire, daemon=True, name="bench-watchdog").start()


def _parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--small", action="store_true", help="CPU-sized run")
    parser.add_argument(
        "--mode", default="approx", choices=["approx", "exact", "verified"]
    )
    parser.add_argument("--all", action="store_true", help="extra metrics to stderr")
    parser.add_argument(
        "--no-probe", action="store_true",
        help="skip the tunnel probe subprocess",
    )
    return parser.parse_args(argv)


if __name__ == "__main__":
    _ARGS = _parse_args()
    _start_watchdog()
    if not (_ARGS.no_probe or os.environ.get("QRAG_BENCH_NO_PROBE")):
        _SECTION[0] = "tunnel_probe"
        _probe_tunnel()
    _SECTION[0] = "jax_import"

from qrag_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qrag_tpu.ops.topk import (  # noqa: E402
    _goodness,
    goodness_topk,
    scan_topk_verified_jit,
)

NORTH_STAR_QPS = 1_000_000.0
BEST_OF = 3  # steady-state throughput: best of N timed passes
# (single-shot readings include 10-15% straggler noise on the tunnel;
# docs/PERFORMANCE.md round-3 methodology note)


_CORPUS_CACHE = {}


def make_corpus(n: int, d: int, dtype) -> jax.Array:
    """Unit-norm random corpus generated on device in ONE dispatch
    (per-dispatch tunnel latency dominates; vmapped chunk generation
    keeps peak memory at one f32 chunk while emitting dtype)."""
    key = (n, d, np.dtype(dtype).name)
    if key in _CORPUS_CACHE:
        return _CORPUS_CACHE[key]

    n_chunks = max(1, -(-n // 131072))
    rows = -(-n // n_chunks)

    @functools.partial(jax.jit, static_argnames=("rows", "d"))
    def gen(keys, rows, d):
        def one(k):
            x = jax.random.normal(k, (rows, d), dtype=jnp.float32)
            return (x / jnp.linalg.norm(x, axis=1, keepdims=True)).astype(dtype)

        return jax.lax.map(one, keys)  # sequential: bounds f32 temps

    keys = jax.random.split(jax.random.PRNGKey(0), n_chunks)
    corpus = gen(keys, rows, d).reshape(n_chunks * rows, d)[:n]
    _CORPUS_CACHE[key] = corpus
    return corpus


@functools.partial(
    jax.jit, static_argnames=("k", "iters", "metric", "mode")
)
def retrieval_loop(queries, corpus, corpus_sqnorms, k, iters, metric, mode):
    """ITERS dependent retrieval steps on-device (defeats dispatch
    overhead and lazy-execution elision)."""

    def body(carry, _):
        q = carry
        g = _goodness(q, corpus, metric, corpus_sqnorms, None)
        vals, idx = goodness_topk(g, k, mode=mode)
        q = q + (1e-9 * vals[:, :1]).astype(q.dtype)
        return q, (vals[0, 0], idx[0, 0])

    q_out, (v, i) = jax.lax.scan(body, queries, None, length=iters)
    # tiny outputs that still depend on every iteration
    return v.sum() + q_out[0, 0].astype(jnp.float32), i.sum()


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def verified_loop(queries, corpus, corpus_sqnorms, k, iters):
    """ITERS dependent VERIFIED-exact retrieval steps on-device
    (ops.topk.scan_topk_verified_jit: deep-oversample approx + per-row
    exactness certificate + cond'd exact fallback — exact top-10
    VALUES, the north star's literal metric)."""

    def body(carry, _):
        vals, idx, n_bad = scan_topk_verified_jit(
            carry, corpus, k, metric="l2", corpus_sqnorms=corpus_sqnorms
        )
        carry = carry + (1e-9 * vals[:, :1]).astype(carry.dtype)
        return carry, (vals[0, 0], idx[0, 0], n_bad)

    q_out, (v, i, nb) = jax.lax.scan(body, queries, None, length=iters)
    return v.sum() + q_out[0, 0].astype(jnp.float32), i.sum(), nb.sum()


def _timed_best(fn, *args, reps=BEST_OF):
    """Compile+warm once, then best-of-reps wall time; returns
    (best_seconds, last_result_tuple)."""
    r = fn(*args)
    np.asarray(r[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        r = fn(*args)
        np.asarray(r[0])
        best = min(best, time.time() - t0)
    return best, r


def run(n, d, b, k, iters, mode, dtype=jnp.bfloat16, verbose=False):
    t0 = time.time()
    corpus = make_corpus(n, d, dtype)
    sq = jnp.sum(
        corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=1
    )
    np.asarray(sq[0])
    if verbose:
        print(f"# corpus gen {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    q = jax.random.normal(jax.random.PRNGKey(7), (b, d), dtype=jnp.float32)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(dtype)
    t0 = time.time()
    if mode == "verified":
        dt, r = _timed_best(verified_loop, q, corpus, sq, k, iters)
        if verbose:
            print(
                f"# verified fallback rows: {int(np.asarray(r[2]))}/{b*iters}",
                file=sys.stderr, flush=True,
            )
        return b * iters / dt, dt / iters, int(np.asarray(r[2]))
    dt, _ = _timed_best(retrieval_loop, q, corpus, sq, k, iters, "l2", mode)
    if verbose:
        print(f"# compile+timed {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    return b * iters / dt, dt / iters, 0


def bench_int8(n, d, b, iters, k=10):
    """Int8 scan + exact bf16 refinement (index/quantized_index.py)."""
    from qrag_tpu.ops.quantize import (
        int8_scan_topk,
        quantize_rows,
        refine_candidates,
    )

    corpus = make_corpus(n, d, jnp.bfloat16)
    sq = jnp.sum(
        corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=1
    )
    x8, xs = jax.jit(quantize_rows)(corpus.astype(jnp.float32))
    q0 = jax.random.normal(jax.random.PRNGKey(5), (b, d), dtype=jnp.float32)
    q0 = q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)

    @jax.jit
    def loop(q, corpus_, sq_, x8_, xs_):
        def body(carry, _):
            q8, q_scale = quantize_rows(carry)
            qsq = jnp.sum(carry * carry, axis=-1)
            g, idx = int8_scan_topk(
                q8, q_scale, x8_, xs_, 4 * k, metric="l2",
                corpus_sqnorms=sq_, query_sqnorms=qsq,
            )
            vals, fidx = refine_candidates(
                carry, corpus_, idx, g, k, metric="l2", corpus_sqnorms=sq_
            )
            return carry + 1e-9 * vals[:, :1], (vals[0, 0], fidx[0, 0])

        q_out, (v, i) = jax.lax.scan(body, q, None, length=iters)
        return v.sum() + q_out[0, 0], i.sum()

    r = loop(q0, corpus, sq, x8, xs)
    np.asarray(r[0])
    t0 = time.time()
    r = loop(q0, corpus, sq, x8, xs)
    np.asarray(r[0])
    dt = (time.time() - t0) / iters
    print(
        f"# int8 scan + exact refine: {dt*1e3:.2f} ms/batch{b} "
        f"({b/dt:,.0f} QPS)",
        file=sys.stderr,
    )


def bench_matmul_floor(n, d, b, iters, dtype=jnp.bfloat16):
    """The scan's physical floor: bf16 matmul + row-max (full-column
    dependence — nothing folds or slice-propagates away)."""
    corpus = make_corpus(n, d, dtype)
    q = jax.random.normal(jax.random.PRNGKey(11), (b, d), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)

    @jax.jit
    def loop(qq, x):
        def body(c, _):
            dots = jax.lax.dot_general(
                c.astype(dtype), x,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(dots, axis=1, keepdims=True)
            return c + 1e-9 * m, m[0, 0]
        qo, v = jax.lax.scan(body, qq, None, length=iters)
        return v.sum() + qo[0, 0]

    r = loop(q, corpus)
    np.asarray(r)
    best = float("inf")
    for _ in range(BEST_OF):
        t0 = time.time()
        r = loop(q, corpus)
        np.asarray(r)
        best = min(best, time.time() - t0)
    return best / iters


def bench_fused_rerank(n, d, b, mode, dtype=jnp.bfloat16, cands=100,
                       iters=8):
    """Quantum-rerank overhead (north star: 10-qubit fidelity over the
    candidates at <5%% added query latency): retrieval of C candidates
    vs retrieval + feature-gather fidelity + final top-k, same C.
    cands=1000 covers BASELINE configs[3] (1k candidates/query).
    Returns (base_ms, fused_ms, overhead_pct)."""
    from qrag_tpu.ops.statevector import (
        fidelity_from_features,
        rotation_features,
    )

    corpus = make_corpus(n, d, dtype)
    sq = jnp.sum(
        corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=1
    )
    q0 = jax.random.normal(jax.random.PRNGKey(3), (b, d), dtype=jnp.float32)
    q0 = (q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)).astype(dtype)
    k, n_qubits = 10, 10
    feats = jax.jit(rotation_features, static_argnames="n_qubits")(
        corpus.astype(jnp.float32), n_qubits, sqnorms=sq
    )

    @functools.partial(jax.jit, static_argnames=("fused",))
    def loop(q, corpus_, sq_, feats_, fused):
        def body(carry, _):
            g = _goodness(carry, corpus_, "l2", sq_, None)
            vals, idx = goodness_topk(g, cands, mode=mode, oversample=1)
            if fused:
                q_feat = rotation_features(carry.astype(jnp.float32), n_qubits)
                cand = jnp.take(feats_, idx, axis=0)  # (B, C, n_qubits)
                fid = fidelity_from_features(q_feat, cand)
                vals, sel = jax.lax.top_k(fid, k)
                idx = jnp.take_along_axis(idx, sel, axis=1)
            return (
                carry + (1e-9 * vals[:, :1]).astype(carry.dtype),
                (vals[0, 0], idx[0, 0]),
            )

        q_out, (v, i) = jax.lax.scan(body, q, None, length=iters)
        return v.sum() + q_out[0, 0].astype(jnp.float32), i.sum()

    times = {}
    for fused in (False, True):
        # best-of-3 like every other number here: the overhead is a
        # DIFFERENCE of two measurements, so single-shot straggler
        # noise (10-15%) can swamp the ~2-3% quantity being measured
        dt, _ = _timed_best(loop, q0, corpus, sq, feats, fused)
        times[fused] = dt / iters
    overhead = (times[True] - times[False]) / times[False] * 100
    print(
        f"# fused {n_qubits}-qubit fidelity rerank of {cands} candidates: "
        f"{times[False]*1e3:.2f} -> {times[True]*1e3:.2f} ms/batch{b} "
        f"(+{overhead:.1f}% latency; target <5%)",
        file=sys.stderr,
    )
    return times[False] * 1e3, times[True] * 1e3, overhead


def bench_bounded_mode(n, d, b, k, iters, query_dtype=jnp.bfloat16):
    """Bounded-exact top-k (ops/bounded_topk.py: norm-bounded window
    pruning — provably exact identity + tie order, one scan pass).
    The Mosaic scan tiles N by 512, so the corpus rounds UP (extra
    rows do real work; QPS understated if anything).  Returns
    (qps, ms_per_batch, n_fallback_batches)."""
    from qrag_tpu.ops.bounded_topk import bounded_exact_topk
    from qrag_tpu.ops.window_scan import WINDOW, make_lane_rank

    n = -(-n // 512) * 512
    corpus = make_corpus(n, d, jnp.bfloat16)
    sq = jnp.sum(
        corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=1
    )
    mx = jnp.sqrt(jnp.max(sq.reshape(-1, WINDOW), axis=1))
    lr = jnp.asarray(make_lane_rank(n))
    q = jax.random.normal(jax.random.PRNGKey(11), (b, d), jnp.float32)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(query_dtype)

    @jax.jit
    def loop(q0, corpus_, sq_, mx_, lr_):
        def body(carry, _):
            vals, idx, fb, npatch, esc = bounded_exact_topk(
                carry, corpus_, corpus_, sq_, mx_, lr_, k, metric="l2",
                backend="pallas" if jax.default_backend() == "tpu" else "xla",
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
    return b * iters / dt, dt / iters, int(np.asarray(r[2]))


def bench_accel_latency(n, d, k=10):
    """Small-batch latency: cluster-pruned exact search vs the bounded
    scan, on a CLUSTERED corpus (mixture of Gaussians — the geometry
    real embedding corpora have; the accelerator exists for exactly
    this structure, and uniform corpora ride its exact fallback)."""
    from qrag_tpu.ops.bounded_topk import bounded_exact_topk
    from qrag_tpu.ops.cluster_topk import (
        build_clustered_groups,
        cluster_pruned_topk,
    )
    from qrag_tpu.ops.window_scan import WINDOW, make_lane_rank

    n = -(-n // 2048) * 2048
    n_centers = max(16, n // (512 * 8))
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
        return x.astype(jnp.bfloat16)

    corpus = gen()
    np.asarray(corpus[0, 0])
    t0 = time.time()
    groups = build_clustered_groups(corpus, group_rows=512)
    np.asarray(groups.radii[0])
    build_s = time.time() - t0
    sq = jnp.sum(
        corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=1
    )
    mx = jnp.sqrt(jnp.max(sq.reshape(-1, WINDOW), axis=1))
    lr = jnp.asarray(make_lane_rank(corpus.shape[0]))
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    out = {"accel_build_s": round(build_s, 1)}

    for b in (1, 8):
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
                return carry, (vals.sum(), fb)

            q_out, (v, fbs) = jax.lax.scan(body, q0, None, length=iters)
            return v.sum() + q_out[0, 0].astype(jnp.float32), fbs.sum()

        dt_c, r = _timed_best(loop_cluster, q, *groups[:-1])

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

        dt_b, _ = _timed_best(
            loop_bounded, q.astype(jnp.bfloat16), corpus, sq, mx, lr
        )
        out[f"accel_b{b}_ms"] = round(dt_c / iters * 1e3, 3)
        out[f"accel_b{b}_vs_bounded"] = round(dt_b / dt_c, 2)
        out[f"accel_b{b}_fallbacks"] = int(np.asarray(r[1]))
        print(
            f"# small-batch exact latency B={b}: clustered "
            f"{dt_c/iters*1e3:.3f} ms vs bounded {dt_b/iters*1e3:.3f} ms "
            f"({dt_b/dt_c:.1f}x; fallbacks {int(np.asarray(r[1]))}/{iters})",
            file=sys.stderr,
        )
    return out


def _section(name: str):
    """Context manager: tracks the running section for the watchdog's
    diagnostics and isolates section crashes (a late companion metric
    must never cost the already-measured headline — the r5 accel
    section crash class)."""

    class _Ctx:
        def __enter__(self):
            _SECTION[0] = name
            return self

        def __exit__(self, et, ev, tb):
            if et is not None:
                msg = f"{et.__name__}: {str(ev)[:200]}"
                RESULTS.setdefault("extra", {}).setdefault(
                    "section_errors", {}
                )[name] = msg
                print(f"# SECTION FAILED {name}: {msg}", file=sys.stderr)
                return True  # swallow; later sections still run
            return False

    return _Ctx()


def main(args=None) -> None:
    args = args if args is not None else _parse_args()

    on_tpu = jax.default_backend() == "tpu"
    if args.small or not on_tpu:
        n, d, b, iters = 100_000, 768, 256, 5
    else:
        # iters = length of the dependent lax.scan each metric times.
        # The ~26 ms per-dispatch tunnel latency amortizes as 1/iters:
        # at 16 it added ~1.6 ms/batch to every wall number (round-5
        # profiler trace: bounded device-busy 10.9 ms vs wall 12.5);
        # 48 prices steady-state throughput (production serves
        # continuously) while keeping the verified mode's timed leg
        # under ~10 s.  Recorded in extra.iters — r1-r4 numbers used
        # 16 (r1-r3: 4-16), so cross-round walls carry different
        # dispatch shares; exact_over_floor is the comparable ratio.
        n, d, b, iters = 1_000_000, 768, 1024, 48

    extra = RESULTS.setdefault("extra", {})

    # ---- the HEADLINE measurement runs FIRST (bounded-exact: norm-
    # bounded window pruning — provably exact identity AND tie order),
    # so a wedge/crash in any companion section can never lose it.
    # Same iteration count for every companion: the ~30-90 ms tunnel
    # dispatch latency amortizes identically across metrics.
    _SECTION[0] = "bounded_headline"
    qps_b, per_b, fb_b = bench_bounded_mode(n, d, b, 10, iters)
    print(
        f"# bounded-exact top-10: {per_b*1e3:.2f} ms/batch{b} "
        f"({qps_b:,.0f} QPS), cert fallback batches {fb_b}",
        file=sys.stderr, flush=True,
    )
    RESULTS.update(
        metric=f"retrieval_qps_exact_top10_{n}x{d}_1chip",
        value=round(qps_b, 1),
        vs_baseline=round(qps_b / NORTH_STAR_QPS, 4),
    )
    extra["bounded_exact_ms_per_batch"] = round(per_b * 1e3, 2)
    extra["bounded_fallback_batches"] = int(fb_b)
    extra["iters"] = iters  # dispatch amortization length (see source)

    with _section("approx"):
        qps, per_batch, _ = run(
            n, d, b, 10, iters, args.mode, verbose=args.all
        )
        extra["approx_qps"] = round(qps, 1)
        extra["approx_ms_per_batch"] = round(per_batch * 1e3, 2)

    with _section("verified"):
        # the north star's literal metric measured in the on-device
        # verified mode (VERDICT r2 #2); recorded every run alongside
        # the headline, same session
        qps_v, per_v, fb_v = run(
            n, d, b, 10, iters, "verified", verbose=args.all
        )
        print(
            f"# verified-exact top-10: {per_v*1e3:.2f} ms/batch{b} "
            f"({qps_v:,.0f} QPS), certificate fallback rows {fb_v}",
            file=sys.stderr, flush=True,
        )
        extra["verified_qps"] = round(qps_v, 1)
        extra["verified_ms_per_batch"] = round(per_v * 1e3, 2)
        extra["verified_fallback_rows"] = int(fb_v)

    with _section("bounded_k100"):
        # rerank-width exactness: k=100 engages the large-k design
        # (third bound plane + runner-up-row patches) — pre-design
        # this shape full-sorted every batch at 380 ms
        qps_b100, per_b100, fb_b100 = bench_bounded_mode(
            n, d, b, 100, max(2, iters // 2)
        )
        print(
            f"# bounded-exact top-100 (large-k design): "
            f"{per_b100*1e3:.2f} ms/batch{b} ({qps_b100:,.0f} QPS), "
            f"cert fallback batches {fb_b100}",
            file=sys.stderr, flush=True,
        )
        extra["bounded_exact_k100_qps"] = round(qps_b100, 1)
        extra["bounded_exact_k100_ms_per_batch"] = round(per_b100 * 1e3, 2)
        extra["bounded_k100_fallback_batches"] = int(fb_b100)

    with _section("matmul_floor"):
        # within-session companions (chip sessions drift ±10-18% —
        # these share the headline's session)
        floor_ms = bench_matmul_floor(n, d, b, iters)
        extra["matmul_rowmax_ms_per_batch"] = round(floor_ms * 1e3, 2)
        # clock-invariant efficiency: exact cost over the same-session
        # floor (absolute QPS moves with the session's chip clock; a
        # throttled session measured 24x slow across the board — this
        # ratio stays comparable; healthy ~1.25-1.35)
        extra["exact_over_floor"] = round(per_b / floor_ms, 3)
        print(
            f"# bf16 matmul+rowmax reference: {floor_ms*1e3:.2f} "
            f"ms/batch{b} ({b/floor_ms:,.0f} QPS at this session's "
            "clock)",
            file=sys.stderr, flush=True,
        )

    with _section("fused_rerank"):
        base_ms, fused_ms, overhead_pct = bench_fused_rerank(
            n, d, b, args.mode, iters=iters
        )
        extra["rerank_overhead_pct"] = round(overhead_pct, 2)
        extra["rerank_base_ms"] = round(base_ms, 2)
        extra["rerank_fused_ms"] = round(fused_ms, 2)

    if on_tpu and not args.all:
        # the clustered small-batch accelerator rows belong in the
        # driver-captured JSON (VERDICT r4 #1/#5: accel_b{1,8} in
        # BENCH_r05), and the driver runs WITHOUT --all; ~1 min
        with _section("accel_latency"):
            extra.update(bench_accel_latency(n, d))

    if args.all:
        with _section("all_approx_exact"):
            print(
                f"# {args.mode} top-10 on {n}x{d}: "
                f"{extra.get('approx_ms_per_batch')} ms/batch{b} "
                f"({extra.get('approx_qps'):,} QPS) "
                f"backend={jax.default_backend()}",
                file=sys.stderr,
            )
            qps_e, _, _ = run(n, d, b, 10, max(2, iters // 4), "exact")
            print(
                f"# exact mode (full sort): {qps_e:,.0f} QPS",
                file=sys.stderr,
            )
            extra["full_sort_qps"] = round(qps_e, 1)
        with _section("all_mid_regime"):
            # the production serving regime: f32 user queries against
            # the bf16 store (MID margin tier); exact w.r.t. the f32
            # query
            qps_m, per_m, fb_m = bench_bounded_mode(
                n, d, b, 10, iters, query_dtype=jnp.float32
            )
            print(
                f"# bounded-exact MID regime (f32 queries, bf16 "
                f"store): {per_m*1e3:.2f} ms/batch{b} "
                f"({qps_m:,.0f} QPS), cert fallback batches {fb_m}",
                file=sys.stderr, flush=True,
            )
            extra["bounded_mid_qps"] = round(qps_m, 1)
            extra["bounded_mid_fallback_batches"] = int(fb_m)
        with _section("all_int8"):
            bench_int8(n, d, b, iters)
        with _section("all_rerank_1k"):
            # BASELINE configs[3]: 10-qubit fidelity over 1k
            # candidates/query
            bench_fused_rerank(n, d, b, args.mode, cands=1000)
        with _section("all_accel"):
            # small-batch exact latency (cluster-pruned accelerator)
            # on a clustered corpus of the same scale
            extra.update(bench_accel_latency(n, d))

    _SECTION[0] = "emit"
    _emit_json(
        {
            # the recorded VALUE is the PROVABLY-EXACT mode
            # (bounded), matching the metric's "exact top-10" name.
            # NOTE the r1-r3 metric name was retrieval_qps_top10_*
            # and recorded the APPROX number (r3: 100,209 QPS) — the
            # r4+ exact headline is a strictly harder quantity; the
            # approx companion stays in extra.approx_qps
            "metric": RESULTS["metric"],
            "value": RESULTS["value"],
            "unit": "qps",
            "vs_baseline": RESULTS["vs_baseline"],
            # extra carries every companion measured this session —
            # approx_qps (the r1-r3 headline quantity), verified_*,
            # k100, MID regime, floor, exact_over_floor, rerank
            # overhead, plus any section_errors
            "extra": {
                **extra,
                "roofline_context": (
                    "north star (>=1M QPS exact top-10, 1Mx768/chip) "
                    "assumes TPU v5p (459 TF/s bf16); this chip is a "
                    "v5e (197 TF/s bf16). 1.57 TFLOP/batch1024 -> "
                    "8.0 ms at 100% MXU = 128k QPS absolute v5e "
                    "ceiling. Best-of-3 timing. The bounded-exact "
                    "value runs the r4 TRANSPOSED Mosaic top-2 scan "
                    "(within ~8% of the matmul+rowmax floor) plus "
                    "~2.7 ms of selection + candidate gather "
                    "(jnp.take; the Pallas DMA gather kernel is "
                    "blocked by the axon AOT compiler — "
                    "docs/PERFORMANCE.md round-4). int8 bounded "
                    "exists and is exact, but at this shape its "
                    "quantization band (~0.5 sigma of the dot "
                    "distribution) forces >100 candidate windows "
                    "per query, so bf16 bounded stays the exact "
                    "headline (round-4 decomposition)."
                ),
            },
        }
    )


if __name__ == "__main__":
    main(_ARGS)
