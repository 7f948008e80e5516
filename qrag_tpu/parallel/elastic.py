"""Elastic sharded retrieval: failure detection + re-shard on a
reduced mesh.

The reference's resilience is all single-process (retries, fallback
models, neutral scores — SURVEY.md §5 "failure detection"); the
distributed rebuild adds the multi-host contract: detect an unhealthy
mesh (collective probe with a deadline), drop the failed devices, and
re-shard the master corpus over the survivors.  The master copy lives
on host (the index is ingestion-owned data, not training state), so
recovery is a re-shard, not a restore.

Detection here is a probe-based health check (a tiny psum across the
mesh run under a deadline) rather than XLA collective timeouts —
portable to the CPU test mesh, where tests inject failures via
`inject_search_failure`.
"""

from __future__ import annotations

import concurrent.futures
import logging
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qrag_tpu.config import MeshConfig
from qrag_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from qrag_tpu.parallel.sharded_index import ShardedFlatIndex

logger = logging.getLogger(__name__)


class ElasticShardedIndex:
    """ShardedFlatIndex wrapper that survives device loss."""

    def __init__(
        self,
        vectors: np.ndarray,
        devices: Optional[Sequence[jax.Device]] = None,
        probe_timeout_s: float = 30.0,
        **index_kwargs,
    ):
        self._vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        self._index_kwargs = index_kwargs
        self.probe_timeout_s = probe_timeout_s
        self.devices: List[jax.Device] = list(
            devices if devices is not None else jax.devices()
        )
        self._failure_injector: Optional[Callable[[], None]] = None
        self._rebuilds = 0
        self._build(self.devices)

    # ------------------------------------------------------------ lifecycle

    def _build(self, devices: Sequence[jax.Device]) -> None:
        mesh = make_mesh(
            MeshConfig(data_parallel=1, model_parallel=len(devices)),
            devices=devices,
        )
        self.mesh = mesh
        self.index = ShardedFlatIndex(
            self._vectors, mesh, **self._index_kwargs
        )
        logger.info(
            "elastic index sharded over %d devices (rebuild #%d)",
            len(devices),
            self._rebuilds,
        )

    @property
    def rebuilds(self) -> int:
        return self._rebuilds

    @property
    def ntotal(self) -> int:
        return self.index.ntotal

    # ------------------------------------------------------------ detection

    def probe(self) -> bool:
        """Health check: a tiny all-reduce over the mesh under a
        deadline.  Hung/failed collectives → unhealthy."""
        def _ping() -> float:
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.device_put(
                np.ones((len(self.devices),), np.float32),
                NamedSharding(self.mesh, P(MODEL_AXIS)),
            )
            return float(jnp.sum(x))

        with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(_ping)
            try:
                return fut.result(timeout=self.probe_timeout_s) == len(
                    self.devices
                )
            except Exception as e:  # noqa: BLE001 - any failure = unhealthy
                logger.warning("mesh probe failed: %s", e)
                return False

    # ------------------------------------------------------------- recovery

    def remove_devices(self, bad: Sequence[jax.Device]) -> None:
        """Drop devices and re-shard over the survivors."""
        bad_set = set(bad)
        survivors = [d for d in self.devices if d not in bad_set]
        if not survivors:
            raise RuntimeError("no healthy devices left")
        self.devices = survivors
        self._rebuilds += 1
        self._build(survivors)

    def inject_search_failure(self, fn: Callable[[], None]) -> None:
        """Test hook: raise inside the next search(es)."""
        self._failure_injector = fn

    # --------------------------------------------------------------- search

    def search(self, queries: np.ndarray, k: int = 10, max_retries: int = 2):
        """Search with failure-triggered recovery: on error, probe the
        mesh, drop the tail device (or all unhealthy state), re-shard,
        and retry — degraded capacity, same results."""
        last_err: Optional[Exception] = None
        for attempt in range(max_retries + 1):
            try:
                if self._failure_injector is not None:
                    injector, self._failure_injector = (
                        self._failure_injector,
                        None,
                    )
                    injector()
                return self.index.search(queries, k=k)
            except Exception as e:  # noqa: BLE001 - recovery contract
                last_err = e
                logger.warning(
                    "sharded search failed (attempt %d): %s", attempt + 1, e
                )
                if len(self.devices) <= 1:
                    break
                if not self.probe():
                    logger.warning("mesh unhealthy; shrinking by one device")
                self.remove_devices([self.devices[-1]])
        raise RuntimeError(
            f"sharded search failed after recovery attempts"
        ) from last_err
