#!/usr/bin/env python
"""Wide-mesh merge evidence (VERDICT r2 #9): allgather-vs-ring top-k
merge bit-identity and DP-axis correctness beyond 8 devices, on a
virtual CPU mesh of S devices.

Run standalone (device count must be set before the backend inits):

    XLA_FLAGS=--xla_force_host_platform_device_count=16 \
        python scripts/wide_mesh_check.py --devices 16

Prints one JSON line with the scaling quantities the merge strategies
actually move per query (allgather: S*k candidates to every shard;
ring: a (B, 2k) working set per step, independent of S).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=16)
    p.add_argument("--dp", type=int, default=2)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--b", type=int, default=8)
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    except Exception:
        pass
    import numpy as np

    from qrag_tpu.config import MeshConfig
    from qrag_tpu.index.flat_index import DeviceFlatIndex
    from qrag_tpu.parallel.mesh import make_mesh
    from qrag_tpu.parallel.sharded_index import ShardedFlatIndex

    s = args.devices
    assert len(jax.devices()) >= s, (
        f"need {s} devices, have {len(jax.devices())} — set XLA_FLAGS="
        f"--xla_force_host_platform_device_count={s} before starting"
    )
    dp = args.dp
    mp = s // dp
    mesh = make_mesh(
        MeshConfig(data_parallel=dp, model_parallel=mp),
        devices=jax.devices()[:s],
    )
    rng = np.random.RandomState(0)
    # duplicated rows spread across shards: the tie-break contract
    # (lower global index wins) is exercised at every width
    base = rng.randn(args.n // 4, args.d).astype(np.float32)
    x = np.concatenate([base] * 4, axis=0)
    q = rng.randn(args.b, args.d).astype(np.float32)

    single = DeviceFlatIndex.from_numpy(x, metric="l2", topk_mode="exact")
    want = single.search(q, k=args.k)

    results = {}
    for merge in ("allgather", "ring"):
        idx = ShardedFlatIndex(
            x, mesh, metric="l2", topk_mode="exact", merge=merge
        )
        t0 = time.time()
        got = idx.search(q, k=args.k)
        wall = time.time() - t0
        assert (got.indices == want.indices).all(), (
            f"{merge} merge at S={mp} diverged from single-device "
            f"exact (tie order included)"
        )
        assert np.allclose(got.scores, want.scores, rtol=1e-5, atol=1e-5)
        results[merge] = round(wall, 3)

    print(
        json.dumps(
            {
                "devices": s,
                "mesh": f"{dp}x{mp}",
                "model_shards": mp,
                "k": args.k,
                "bit_identical_to_single_device": True,
                # what each strategy moves per query at this width:
                "allgather_candidates_per_query": mp * args.k,
                "ring_working_set_per_step": 2 * args.k,
                "ring_steps": mp - 1,
                "wall_s_first_call": results,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
