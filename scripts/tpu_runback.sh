#!/bin/bash
# One-shot TPU measurement runback for the round-4 final session.
# Run when the axon tunnel recovers (it was down the whole session):
#   bash scripts/tpu_runback.sh 2>&1 | tee /tmp/tpu_runback.log
# Each step is timeout-guarded; a wedged step must not block the rest
# (a crashed Pallas compile can wedge the tunnel until the client
# process exits — CLAUDE.md).

set -uo pipefail
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "
import jax, numpy as np, jax.numpy as jnp
a = jnp.ones((128,128), jnp.bfloat16)
assert float(np.asarray(a@a)[0,0]) == 128.0
print('tunnel OK')" 2>/dev/null
}

echo "== probe =="
probe || { echo "tunnel still down; aborting"; exit 1; }

echo "== smoke (device-dependent checks incl. the new accel) =="
timeout 1200 python scripts/tpu_smoke.py

echo "== bounded decomposition lab (floor/scan/stages) =="
timeout 1800 python scripts/r6_lab.py --sections floor,scan,stages

echo "== probe between heavy steps =="
probe || { echo "tunnel wedged mid-run; stopping"; exit 1; }

echo "== accel latency lab (1M clustered corpus) =="
timeout 1800 python scripts/r6_lab.py --sections accel

echo "== gather kernel probe (isolated; expected: blockspec form"
echo "   compiles or fails cleanly, in-kernel DMA form crashes) =="
timeout 900 python scripts/probe_gather_bs.py || true
probe || { echo "tunnel wedged after gather probe; stopping"; exit 1; }

echo "== full bench (headline JSON + --all sections) =="
timeout 2400 python bench.py --all

echo "== runback complete =="
