"""Two-process ELASTIC test (VERDICT r4 #7): kill one worker, verify
the survivor localizes the dead peer's device, re-shards over its own
devices, and serves exact results from the reduced mesh.

Extends tests/test_multihost.py (plain 2-process sharded search) to
the failure-detection row of SURVEY.md §5: the probe → localize →
re-shard ladder of ``parallel/elastic.py`` exercised across REAL OS
processes joined via jax.distributed (Gloo on CPU), not fake devices.
"""

import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys, time
    sys.path.insert(0, "/root/repo")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from qrag_tpu.parallel.mesh import distributed_init
    pid = int(sys.argv[1])
    distributed_init(COORD_ADDR, num_processes=2, process_id=pid)
    import numpy as np
    from qrag_tpu.parallel.elastic import ElasticShardedIndex

    rng = np.random.RandomState(0)
    x = rng.randn(512, 32).astype(np.float32)
    idx = ElasticShardedIndex(x, probe_timeout_s=20.0)
    assert jax.process_count() == 2
    assert len(idx.devices) == 2 and idx.rebuilds == 0

    # phase 1: healthy cross-process search (both processes participate
    # in the collective)
    res = idx.search(x[7:8] + 1e-3, k=3)
    assert res.indices[0, 0] == 7, res.indices
    print("ELASTIC_PHASE1_OK", pid, flush=True)

    if pid == 1:
        # simulate worker loss: die without jax.distributed.shutdown
        time.sleep(2.0)
        os._exit(0)

    # phase 2 (survivor only): wait for the peer to die, then walk the
    # elastic ladder explicitly — probe (deadlined mesh collective),
    # localize (per-device probes), re-shard over survivors
    time.sleep(6.0)
    healthy = idx.probe()
    assert not healthy, "mesh probe should fail with a dead peer"
    bad = idx.localize_failures()
    local = {d for d in idx.devices if d.process_index == 0}
    assert bad and all(d not in local for d in bad), (
        "localization must name only the dead peer's device(s): "
        f"{bad}"
    )
    idx.remove_devices(bad)
    assert idx.rebuilds == 1 and len(idx.devices) == 1

    # reduced-mesh search: full corpus (re-sharded from the host
    # master), exact results, local-only collectives
    res2 = idx.search(x[7:8] + 1e-3, k=3)
    d2 = ((x - (x[7] + 1e-3)) ** 2).sum(-1)
    want = np.argsort(d2, kind="stable")[:3]
    assert list(res2.indices[0]) == list(want), (res2.indices, want)
    print("ELASTIC_PHASE2_OK", pid, flush=True)
    os._exit(0)  # skip atexit distributed shutdown (peer is gone)
    """
)


def test_two_process_elastic_reshards_after_worker_death():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = (
        f"COORD_ADDR = '127.0.0.1:{port}'\n" + WORKER
    )
    env = dict(
        __import__("os").environ,
        XLA_FLAGS="",  # each process gets 1 real CPU device
        JAX_PLATFORMS="cpu",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail(f"worker hung:\n{out[-2000:]}")
        outs.append(out)
    # worker 1 completes phase 1 then dies by design
    assert procs[1].returncode == 0, f"worker 1:\n{outs[1][-2000:]}"
    assert "ELASTIC_PHASE1_OK 1" in outs[1]
    # worker 0 must survive the peer loss and serve from 1 device
    assert procs[0].returncode == 0, f"worker 0:\n{outs[0][-2000:]}"
    assert "ELASTIC_PHASE1_OK 0" in outs[0]
    assert "ELASTIC_PHASE2_OK 0" in outs[0]
