"""Isolated probe: does the index_map-driven (BlockSpec) gather form
compile on this toolchain, and how fast is it vs jnp.take?

Run in its OWN process (a crashed/hung Pallas compile can wedge the
axon tunnel until the client process exits — CLAUDE.md):

    timeout 600 python scripts/probe_gather_bs.py [--m 16384] [--n 1000000]

Prints one line per step so a hang is attributable to a specific
compile.  The in-kernel dynamic-DMA form (gather_rows) is probed last
for completeness — it is expected to crash the AOT helper (exit 1),
which is fine in an isolated process.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16384)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--skip-inkernel", action="store_true")
    args = p.parse_args()

    from bench import make_corpus
    from qrag_tpu.ops.pallas.gather_rows import (
        gather_rows,
        gather_rows_blockspec,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    corpus = make_corpus(args.n, args.d, jnp.bfloat16)
    np.asarray(corpus[0, 0])
    print("corpus ready", flush=True)

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (args.m,), 0, args.n, dtype=jnp.int32)

    def timed(fn, label):
        t0 = time.time()
        r = fn(corpus, idx)
        np.asarray(r[0])
        print(f"{label}: compiled+first in {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            r = fn(corpus, idx)
            np.asarray(r[0])
            best = min(best, time.time() - t0)
        gb = args.m * args.d * 2 / 1e9
        print(
            f"{label}: {best/args.iters*1e3:.3f} ms/gather of "
            f"{args.m}x{args.d} bf16 ({gb/(best/args.iters):.1f} GB/s)",
            flush=True,
        )
        return r

    iters = args.iters

    def _dep_body(gather_fn, n):
        # FULL dependence (the CLAUDE.md bench rule): every gathered
        # row feeds the next iteration's indices through a DATA-
        # dependent term XLA cannot fold (int `* 0` folds and
        # consuming only rows[0, 0] lets the gather slice-propagate
        # to one element — the first cut of this probe measured
        # nothing), and the emitted per-step value sums the WHOLE
        # gather output.
        def body(c, _):
            rows = gather_fn(c)
            sums = jnp.sum(rows.astype(jnp.float32), axis=1)  # (M,)
            bump = (sums * 1e-20).astype(jnp.int32)  # data-dep, ~0
            c2 = (c + 1 + bump) % n
            return c2, sums.sum()

        return body

    @jax.jit
    def take_loop(x, idx0):
        body = _dep_body(lambda c: jnp.take(x, c, axis=0), x.shape[0])
        c, v = jax.lax.scan(body, idx0, None, length=iters)
        return v.sum() + c[0].astype(jnp.float32), c

    r_take = timed(take_loop, "jnp.take")

    @jax.jit
    def bs_loop(x, idx0):
        body = _dep_body(
            lambda c: gather_rows_blockspec(x, c), x.shape[0]
        )
        c, v = jax.lax.scan(body, idx0, None, length=iters)
        return v.sum() + c[0].astype(jnp.float32), c

    try:
        r_bs = timed(bs_loop, "blockspec")
        # parity check (single shot, outside the loop)
        a = np.asarray(jnp.take(corpus, idx, axis=0).astype(jnp.float32))
        b = np.asarray(gather_rows_blockspec(corpus, idx).astype(jnp.float32))
        print(f"parity: {'OK' if np.array_equal(a, b) else 'MISMATCH'}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"blockspec FAILED: {type(e).__name__}: {e}", flush=True)

    if not args.skip_inkernel:
        try:
            t0 = time.time()
            out = gather_rows(corpus, idx[:256], rows_per_block=256)
            np.asarray(out[0, 0])
            print(f"in-kernel DMA form compiled in {time.time()-t0:.1f}s "
                  "(toolchain fixed?)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"in-kernel DMA form still fails: {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()
