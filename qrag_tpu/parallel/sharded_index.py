"""Sharded flat index: corpus rows over ICI, allgather top-k merge.

The scale-out design of SURVEY.md §2 (TP row) and BASELINE configs[4]:
the (N, d) embedding matrix is sharded by rows across the mesh "model"
axis; each chip scans its shard with the same goodness+top-k kernel as
the single-chip path, then the per-shard (B, k) candidates are
``all_gather``'d over ICI and merged locally — k·S candidates per
query, one collective, no full-score exchange.  Queries shard across
"data" (DP).  Sharded results match the single-device exact scan
bit-for-bit at equal k (tie order included: the merge keeps shard-major
candidate order, so lower global indices win ties, same as
``lax.top_k``); tested on the 8-device CPU mesh (SURVEY.md §4.3).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from qrag_tpu.ops.topk import _goodness, goodness_topk
from qrag_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "mode", "mesh")
)
def _sharded_search(
    queries: jnp.ndarray,  # (B, d) sharded P(data, None)
    corpus: jnp.ndarray,  # (Np, d) sharded P(model, None)
    sqnorms: jnp.ndarray,  # (Np,) sharded P(model)
    valid: jnp.ndarray,  # (Np,) sharded P(model)
    k: int,
    metric: str,
    mode: str,
    mesh: Mesh,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    def local(q, x, sq, vl):
        # per-shard scan: identical kernel to the single-chip path
        g = _goodness(q, x, metric, sq, vl)
        vals, idx = goodness_topk(g, k, mode=mode)
        shard = jax.lax.axis_index(MODEL_AXIS)
        idx = idx + shard * x.shape[0]  # globalize row ids
        # one ICI collective: k candidates per shard, all-to-all-gather
        all_vals = jax.lax.all_gather(vals, MODEL_AXIS)  # (S, Bl, k)
        all_idx = jax.lax.all_gather(idx, MODEL_AXIS)
        s = all_vals.shape[0]
        bl = all_vals.shape[1]
        comb_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(bl, s * k)
        comb_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(bl, s * k)
        v, sel = jax.lax.top_k(comb_v, k)  # local k-way merge
        i = jnp.take_along_axis(comb_i, sel, axis=1)
        return v, i

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None),
            P(MODEL_AXIS, None),
            P(MODEL_AXIS),
            P(MODEL_AXIS),
        ),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        # after the all_gather+merge the outputs ARE replicated over
        # "model"; the varying-axes checker can't infer that
        check_vma=False,
    )(queries, corpus, sqnorms, valid)


class ShardedFlatIndex:
    """Row-sharded HBM-resident exact flat index over a device mesh."""

    def __init__(
        self,
        vectors: np.ndarray,
        mesh: Mesh,
        metric: str = "l2",
        metadata: Optional[Sequence[str]] = None,
        topk_mode: str = "approx",
        store_dtype: str = "float32",
    ):
        if metric not in ("l2", "ip"):
            raise ValueError(f"unknown metric {metric!r}")
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        self.mesh = mesh
        self.metric = metric
        self.topk_mode = topk_mode
        self.d = vectors.shape[1]
        self.ntotal = vectors.shape[0]
        self.metadata: List[str] = (
            [str(m) for m in metadata] if metadata is not None else [""] * self.ntotal
        )
        mp = mesh.shape[MODEL_AXIS]
        dp = mesh.shape[DATA_AXIS]
        self._dp = dp
        npad = _round_up(max(self.ntotal, mp), mp * 128)
        padded = np.zeros((npad, self.d), np.float32)
        padded[: self.ntotal] = vectors
        valid = np.zeros((npad,), bool)
        valid[: self.ntotal] = True
        dtype = jnp.bfloat16 if store_dtype == "bfloat16" else jnp.float32
        self.store_dtype = dtype
        row = NamedSharding(mesh, P(MODEL_AXIS, None))
        vec = NamedSharding(mesh, P(MODEL_AXIS))
        self._dev_matrix = jax.device_put(padded.astype(dtype), row)
        self._dev_sqnorms = jax.device_put(
            np.sum(padded * padded, axis=1, dtype=np.float32), vec
        )
        self._dev_valid = jax.device_put(valid, vec)

    def search_device(
        self, queries: jnp.ndarray, k: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return _sharded_search(
            queries.astype(self.store_dtype),
            self._dev_matrix,
            self._dev_sqnorms,
            self._dev_valid,
            k,
            self.metric,
            self.topk_mode,
            self.mesh,
        )

    def search(self, queries: np.ndarray, k: int = 10):
        """Host-level sharded search (pads the batch to the data axis)."""
        from qrag_tpu.index.flat_index import SearchResult
        from qrag_tpu.ops.topk import _finalize

        queries = np.ascontiguousarray(queries, dtype=np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        b = queries.shape[0]
        bp = _round_up(b, self._dp)
        if bp != b:
            queries = np.pad(queries, ((0, bp - b), (0, 0)))
        k_eff = min(k, max(self.ntotal, 1))
        batch_sh = NamedSharding(self.mesh, P(DATA_AXIS, None))
        qdev = jax.device_put(queries, batch_sh)
        vals, idx = self.search_device(qdev, k_eff)
        vals, idx = _finalize(vals, idx, self.metric)
        scores = np.asarray(vals)[:b]
        indices = np.asarray(idx, dtype=np.int32)[:b]
        invalid = (indices < 0) | (indices >= self.ntotal)
        indices = np.where(invalid, -1, indices)
        meta = [
            [None if i < 0 else (self.metadata[i] or None) for i in row]
            for row in indices
        ]
        return SearchResult(scores=scores, indices=indices, metadata=meta)
