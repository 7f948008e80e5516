"""Sharded fused search+rerank == single-device fused path
(BASELINE configs[4] query pipeline on the CPU mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from qrag_tpu.config import MeshConfig
from qrag_tpu.engine import fused_search_rerank
from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.parallel import ShardedFlatIndex, make_mesh
from qrag_tpu.parallel.mesh import DATA_AXIS


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(MeshConfig(data_parallel=2, model_parallel=4))


def test_gather_rows_across_shards(mesh8, rng):
    x = rng.randn(1024, 16).astype(np.float32)
    sharded = ShardedFlatIndex(x, mesh8, topk_mode="exact")
    idx = np.array([[0, 511, 512, 1023], [100, 600, 5, 900]], np.int32)
    idx_dev = jax.device_put(idx, NamedSharding(mesh8, P(DATA_AXIS, None)))
    rows = np.asarray(sharded.gather_rows_device(idx_dev))
    for b in range(2):
        for j in range(4):
            np.testing.assert_allclose(rows[b, j], x[idx[b, j]], rtol=1e-6)


def test_sharded_search_rerank_matches_single_device(mesh8, rng):
    n_qubits = 4
    x = rng.randn(2000, 32).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.randn(4, 32).astype(np.float32)
    sharded = ShardedFlatIndex(x, mesh8, metric="l2", topk_mode="exact")
    q_dev = jax.device_put(q, NamedSharding(mesh8, P(DATA_AXIS, None)))
    fid_s, idx_s, _ = sharded.search_rerank_device(
        q_dev, k=5, candidates=20, n_qubits=n_qubits
    )

    single = DeviceFlatIndex.from_numpy(x, metric="l2", topk_mode="exact")
    single._ensure_device()
    fid_1, idx_1, _ = fused_search_rerank(
        jnp.asarray(q),
        single._dev_matrix,
        single._dev_sqnorms,
        single._dev_valid,
        k=5,
        candidates=20,
        n_qubits=n_qubits,
        metric="l2",
        topk_mode="exact",
    )
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_1))
    np.testing.assert_allclose(
        np.asarray(fid_s), np.asarray(fid_1), atol=1e-5
    )
