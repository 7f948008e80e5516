"""Merge correctness beyond the 8-device mesh (VERDICT r2 #9).

The in-process suite runs with 8 virtual devices (conftest); device
count is fixed per process, so the 16- and 32-device meshes run in
subprocesses via scripts/wide_mesh_check.py: allgather and ring merges
must stay bit-identical to the single-device exact scan (tie order
included) as S grows, with the DP axis widened too.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "wide_mesh_check.py")


def _run(devices: int, dp: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, SCRIPT, "--devices", str(devices), "--dp", str(dp)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, f"stderr:\n{out.stderr[-2000:]}"
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.parametrize(
    "devices,dp",
    [(16, 2), (32, 4)],
)
def test_wide_mesh_merges_bit_identical(devices, dp):
    res = _run(devices, dp)
    assert res["bit_identical_to_single_device"] is True
    assert res["devices"] == devices
    mp = devices // dp
    assert res["model_shards"] == mp
    # the scaling story: allgather traffic grows with S, ring's
    # per-step working set does not
    assert res["allgather_candidates_per_query"] == mp * res["k"]
    assert res["ring_working_set_per_step"] == 2 * res["k"]
