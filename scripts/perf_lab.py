#!/usr/bin/env python
"""Single-session perf lab for the headline scan (VERDICT r2 #1).

Measures, within ONE chip session (numbers drift 10-18% between
sessions — docs/PERFORMANCE.md), the levers the round-2 verdict left
on the table:

  * batch amortization: B = 1024 / 2048 / 4096 (B=4096 measured
    138 TF/s in r2 — the best recorded point, unexploited)
  * oversample 1 vs 2 at each B
  * pre-transposed corpus layout for the XLA matmul
  * matmul+rowmax floor at each B (the session's physical anchor)
  * the fully-on-device "verified" escalation (approx + certificate +
    cond'd exact fallback) and its observed fallback rate

Every timed loop keeps FULL-COLUMN data dependence (CLAUDE.md: int
x*0 folds; consuming one element lets XLA slice-propagate the matmul).

Usage:  python scripts/perf_lab.py [--small] [--iters 16]
Optionally set XLA_FLAGS before launch to A/B scheduler flags; the
baseline variant is re-measured in every process as the anchor.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from qrag_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_corpus  # noqa: E402
from qrag_tpu.ops.topk import _goodness  # noqa: E402


@functools.partial(
    jax.jit, static_argnames=("k", "iters", "oversample", "mode", "transposed")
)
def loop(queries, corpus, corpus_sqnorms, k, iters, oversample, mode,
         transposed=False):
    def goodness(q):
        if transposed:
            dots = jax.lax.dot_general(
                q, corpus,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            q32 = q.astype(jnp.float32)
            return (
                2.0 * dots
                - jnp.sum(q32 * q32, axis=-1, keepdims=True)
                - corpus_sqnorms[None, :]
            )
        return _goodness(q, corpus, "l2", corpus_sqnorms, None)

    def body(carry, _):
        g = goodness(carry)
        if mode == "exact":
            vals, idx = jax.lax.top_k(g, k)
        else:
            kk = k * oversample
            sv, si = jax.lax.approx_max_k(g, kk, recall_target=0.99)
            vals, ri = jax.lax.top_k(sv, k)
            idx = jnp.take_along_axis(si, ri, axis=1)
        carry = carry + (1e-9 * vals[:, :1]).astype(carry.dtype)
        return carry, (vals[0, 0], idx[0, 0])

    q_out, (v, i) = jax.lax.scan(body, queries, None, length=iters)
    return v.sum() + q_out[0, 0].astype(jnp.float32), i.sum()


@functools.partial(jax.jit, static_argnames=("k", "iters", "oversample"))
def loop_verified(queries, corpus, corpus_sqnorms, k, iters, oversample):
    """On-device verified: approx + per-row certificate; if ANY row's
    certificate fails, lax.cond runs the exact top-k for the batch.
    Returns the fallback count so the observed rate is recorded."""

    def body(carry, _):
        g = _goodness(carry, corpus, "l2", corpus_sqnorms, None)
        kk = k * oversample
        sv, si = jax.lax.approx_max_k(g, kk, recall_target=0.99)
        vals, ri = jax.lax.top_k(sv, k)
        idx = jnp.take_along_axis(si, ri, axis=1)
        bad = jnp.sum(g > vals[:, -1:], axis=1) > (k - 1)
        n_bad = jnp.sum(bad)
        vals, idx = jax.lax.cond(
            n_bad > 0,
            lambda: tuple(jax.lax.top_k(g, k)),
            lambda: (vals, idx),
        )
        carry = carry + (1e-9 * vals[:, :1]).astype(carry.dtype)
        return carry, (vals[0, 0], idx[0, 0], n_bad)

    q_out, (v, i, nb) = jax.lax.scan(body, queries, None, length=iters)
    return v.sum() + q_out[0, 0].astype(jnp.float32), i.sum(), nb.sum()


def timeit(fn, *args):
    r = fn(*args)
    np.asarray(r[0])  # compile+warm
    t0 = time.time()
    r = fn(*args)
    out = [np.asarray(x) for x in r]
    return time.time() - t0, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--skip-transposed", action="store_true")
    args = p.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    n, d = (100_000, 768) if (args.small or not on_tpu) else (1_000_000, 768)
    k = 10
    corpus = make_corpus(n, d, jnp.bfloat16)
    sq = jnp.sum(corpus.astype(jnp.float32) ** 2, axis=1)
    np.asarray(sq[0])
    corpus_t = None
    if not args.skip_transposed:
        # materialized (d, N) layout on device
        corpus_t = jax.jit(lambda x: x.T)(corpus)
        np.asarray(corpus_t[0, 0])

    results = {}
    print(f"# perf lab: {n}x{d} k={k} iters={args.iters} "
          f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    for b in (1024, 2048, 4096):
        it = max(4, args.iters * 1024 // b)
        q = jax.random.normal(jax.random.PRNGKey(7), (b, d), jnp.float32)
        q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.bfloat16)
        for mode, o in (("approx", 1), ("approx", 2)):
            dt, _ = timeit(loop, q, corpus, sq, k, it, o, mode)
            per = dt / it
            key = f"B{b}_o{o}"
            results[key] = per
            tf = 2 * b * n * d / per / 1e12
            print(f"# {key}: {per*1e3:.2f} ms/batch  {b/per:,.0f} QPS  "
                  f"{tf:.0f} TF/s", file=sys.stderr, flush=True)
        if corpus_t is not None and b in (1024, 4096):
            dt, _ = timeit(loop, q, corpus_t, sq, k, it, 2, "approx", True)
            per = dt / it
            results[f"B{b}_o2_T"] = per
            print(f"# B{b}_o2_transposed: {per*1e3:.2f} ms/batch  "
                  f"{b/per:,.0f} QPS", file=sys.stderr, flush=True)
        # verified escalation at this batch
        for o in (2, 4):
            dt, out = timeit(loop_verified, q, corpus, sq, k, it, o)
            per = dt / it
            fb = int(out[2])
            results[f"B{b}_verified_o{o}"] = per
            print(f"# B{b}_verified_o{o}: {per*1e3:.2f} ms/batch  "
                  f"{b/per:,.0f} QPS  fallback_rows={fb}/{b*it}",
                  file=sys.stderr, flush=True)

    print(json.dumps({k2: round(v * 1e3, 3) for k2, v in results.items()}))


if __name__ == "__main__":
    main()
