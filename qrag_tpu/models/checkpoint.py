"""Training-state checkpoint/resume (orbax).

The reference's "checkpointing" is its FAISS file + model weight cache
(SURVEY.md §5 checkpoint/resume); index persistence lives in
``qrag_tpu.index`` (faiss format + native manifest + C++ store).  This
module covers the trainable model: params + optimizer state + step,
saved via orbax with a JSON config sidecar.  Sharded params are
gathered to host on save and re-placed by the caller's mesh on
restore (re-shard-on-restore keeps checkpoints mesh-shape agnostic, so
a run can resume on a different device count — the elastic contract).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from qrag_tpu.models.cross_encoder import CrossEncoderConfig

CONFIG_NAME = "config.json"
STATE_DIR = "state"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_train_state(
    directory: str,
    params: Any,
    opt_state: Any,
    step: int,
    cfg: CrossEncoderConfig,
) -> None:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["dtype"] = np.dtype(cfg.dtype).name if cfg.dtype else "float32"
    with open(os.path.join(directory, CONFIG_NAME), "w") as f:
        json.dump({"step": step, "config": cfg_dict}, f, indent=2)
    state = {"params": _to_host(params), "opt_state": _to_host(opt_state)}
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(directory, STATE_DIR)
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    ckptr.close()  # join orbax's background threads (clean interpreter exit)


def load_train_state(
    directory: str,
    params_like: Any,
    opt_state_like: Any,
) -> Tuple[Any, Any, int, Dict[str, Any]]:
    """Restore (params, opt_state, step, cfg_dict).  ``*_like`` trees
    provide structure/dtypes; when their leaves are sharded jax Arrays,
    restored leaves are re-placed onto the SAME shardings, so resuming
    on a (possibly different-shaped) mesh keeps the TP/EP layout."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    with open(os.path.join(directory, CONFIG_NAME)) as f:
        meta = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": _to_host(params_like),
        "opt_state": _to_host(opt_state_like),
    }
    state = ckptr.restore(os.path.join(directory, STATE_DIR), target)
    ckptr.close()

    from jax.sharding import NamedSharding

    def _replace(template, restored):
        # re-place only mesh-sharded leaves; single-device leaves (e.g.
        # optimizer step counters) stay host-side and let jit place
        # them, avoiding mixed-device-set jit arguments
        if isinstance(template, jax.Array) and isinstance(
            template.sharding, NamedSharding
        ):
            return jax.device_put(restored, template.sharding)
        return restored

    params = jax.tree_util.tree_map(_replace, params_like, state["params"])
    opt_state = jax.tree_util.tree_map(
        _replace, opt_state_like, state["opt_state"]
    )
    return params, opt_state, int(meta["step"]), meta["config"]
