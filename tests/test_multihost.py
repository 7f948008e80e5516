"""True multi-process (DCN-style) distributed test: two OS processes
join via jax.distributed (Gloo on CPU) and run the sharded index over
a cross-process mesh — the multi-host path of SURVEY.md §2/§5 that the
fake-device tests can't cover."""

import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from qrag_tpu.parallel.mesh import distributed_init
    distributed_init({addr!r}, num_processes=2, process_id=int(sys.argv[1]))
    import numpy as np
    from qrag_tpu.config import MeshConfig
    from qrag_tpu.parallel import ShardedFlatIndex, make_mesh

    rng = np.random.RandomState(0)
    x = rng.randn(512, 32).astype(np.float32)
    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=2))
    idx = ShardedFlatIndex(
        x, mesh, metric="l2", topk_mode="exact", merge={merge!r}
    )
    res = idx.search(x[7:8] + 1e-3, k=3)
    assert jax.process_count() == 2
    assert res.indices[0, 0] == 7, res.indices
    # compare against a local NumPy oracle on the full corpus
    d2 = ((x - (x[7] + 1e-3)) ** 2).sum(-1)
    want = np.argsort(d2, kind="stable")[:3]
    assert list(res.indices[0]) == list(want), (res.indices, want)
    print("MULTIHOST_OK", sys.argv[1])
    """
)


@pytest.mark.parametrize("merge", ["allgather", "ring"])
def test_two_process_sharded_search(merge, tmp_path):
    import socket

    # pick a free port for the coordinator
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = WORKER.format(
        repo="/root/repo", addr=f"127.0.0.1:{port}", merge=merge
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
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "MULTIHOST_OK" in out
