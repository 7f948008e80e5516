"""bench.py preflight contract (VERDICT r4 #1): the driver must get a
parseable JSON line even when the TPU tunnel is wedged — round 4
burned its whole timeout emitting nothing (rc=124, parsed=null).

Only the FAST failure paths run here (the full --small run costs
minutes); each asserts one diagnostic JSON line on stdout and a
prompt exit.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(env_extra, args=(), timeout=120):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--small", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
        env=env,
    )
    lines = [l for l in r.stdout.splitlines() if l.strip().startswith("{")]
    assert lines, f"no JSON line on stdout:\n{r.stdout}\n{r.stderr[-800:]}"
    return r, json.loads(lines[-1])


def test_probe_timeout_emits_diagnostic_json():
    r, payload = _run({"QRAG_BENCH_PROBE_TIMEOUT_S": "0.05"})
    assert r.returncode == 0
    assert "probe_timeout" in payload["error"]
    assert payload["unit"] == "qps" and payload["value"] == 0.0


def test_watchdog_flushes_partial_json_and_names_section():
    r, payload = _run(
        {"QRAG_BENCH_DEADLINE_S": "8", "QRAG_BENCH_NO_PROBE": "1"},
        timeout=180,
    )
    assert r.returncode == 0
    assert payload["error"].startswith("bench_deadline_")
    # the diagnostic names WHERE it was stuck
    assert "_in_" in payload["error"]
    assert "completed_sections" in payload["extra"]


def test_bench_importable_without_preflight():
    # scripts do `from bench import make_corpus` — importing the module
    # must not run the probe/watchdog (they are __main__-gated)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               QRAG_BENCH_PROBE_TIMEOUT_S="0.01")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-c",
         "import bench; print('imported', bench.DEADLINE_S > 0)"],
        capture_output=True, text=True, timeout=120, cwd=REPO, env=env,
    )
    assert r.returncode == 0 and "imported True" in r.stdout
