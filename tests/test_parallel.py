"""Distributed paths on the 8-device CPU mesh (SURVEY.md §4.3):
sharded top-k merge == single-device top-k bit-for-bit; sharded
cross-encoder training runs and learns."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qrag_tpu.config import MeshConfig
from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.parallel import ShardedFlatIndex, make_mesh
from qrag_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(MeshConfig(data_parallel=2, model_parallel=4))


def test_mesh_shapes(mesh8):
    assert mesh8.shape[DATA_AXIS] == 2
    assert mesh8.shape[MODEL_AXIS] == 4


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_sharded_search_matches_single_device(mesh8, metric, rng):
    x = rng.randn(3000, 64).astype(np.float32)
    q = rng.randn(8, 64).astype(np.float32)
    sharded = ShardedFlatIndex(x, mesh8, metric=metric, topk_mode="exact")
    single = DeviceFlatIndex.from_numpy(x, metric=metric, topk_mode="exact")
    rs = sharded.search(q, k=10)
    r1 = single.search(q, k=10)
    np.testing.assert_array_equal(rs.indices, r1.indices)
    np.testing.assert_allclose(rs.scores, r1.scores, rtol=1e-5, atol=1e-5)


def test_sharded_search_tie_break(mesh8, rng):
    """Duplicate rows across different shards: lower global index wins,
    same as lax.top_k on one device."""
    base = rng.randn(16, 32).astype(np.float32)
    x = np.tile(base, (64, 1))  # 1024 rows, every row duplicated 64x
    q = rng.randn(4, 32).astype(np.float32)
    sharded = ShardedFlatIndex(x, mesh8, metric="ip", topk_mode="exact")
    single = DeviceFlatIndex.from_numpy(x, metric="ip", topk_mode="exact")
    rs = sharded.search(q, k=8)
    r1 = single.search(q, k=8)
    np.testing.assert_array_equal(rs.indices, r1.indices)


def test_sharded_verified_duplicate_tie_contract(mesh8, rng):
    """ADVICE r4: the verified mode's certificate used to count only
    strictly-greater scores, so a bitwise-duplicate row with a LOWER
    index that approx_max_k missed still certified — exact values,
    broken tie order.  Mass duplicates force the tie certificate to
    prove the in-set equals are the smallest-index equals (or full-
    sort); the result must equal the exact single-device tie order."""
    base = rng.randn(48, 32).astype(np.float32)
    # big enough per shard (16k/4 = 4k rows) that the approx arm runs
    # (kk*8 < n_local), every row duplicated many times
    x = np.tile(base, (352, 1))  # 16896 rows
    q = base[:4] + 0.01 * rng.randn(4, 32).astype(np.float32)
    sharded = ShardedFlatIndex(x, mesh8, metric="ip", topk_mode="verified")
    single = DeviceFlatIndex.from_numpy(x, metric="ip", topk_mode="exact")
    rs = sharded.search(q, k=8)
    r1 = single.search(q, k=8)
    np.testing.assert_array_equal(rs.indices, r1.indices)
    np.testing.assert_allclose(rs.scores, r1.scores, rtol=1e-6, atol=1e-6)


def test_sharded_search_metadata_and_odd_batch(mesh8, rng):
    x = rng.randn(500, 32).astype(np.float32)
    sharded = ShardedFlatIndex(
        x, mesh8, metadata=[f"m/{i}" for i in range(500)], topk_mode="exact"
    )
    res = sharded.search(x[7], k=1)  # batch of 1 on a dp=2 mesh
    assert res.indices.shape == (1, 1)
    assert res.indices[0, 0] == 7
    assert res.metadata[0][0] == "m/7"


def test_sharded_training_step_runs(mesh8):
    """DP x TP/EP cross-encoder training on the mesh: loss decreases."""
    from qrag_tpu.models.cross_encoder import CrossEncoderConfig
    from qrag_tpu.parallel.train import make_sharded_trainer, synthetic_batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = CrossEncoderConfig(
        dim=64, n_heads=4, n_layers=2, max_len=64, n_experts=4
    )
    params, opt_state, step, batch_sh = make_sharded_trainer(cfg, mesh8)
    rng = np.random.RandomState(0)
    losses = []
    for i in range(30):
        toks, masks, labels = synthetic_batch(rng, 16, cfg.max_len)
        toks = jax.device_put(jnp.asarray(toks), batch_sh)
        masks = jax.device_put(jnp.asarray(masks), batch_sh)
        labels = jax.device_put(
            jnp.asarray(labels), NamedSharding(mesh8, P("data"))
        )
        params, opt_state, loss = step(params, opt_state, toks, masks, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])  # it learns


def test_param_sharding_actually_shards(mesh8):
    from qrag_tpu.models.cross_encoder import CrossEncoderConfig, init_params
    from qrag_tpu.parallel.train import shard_params

    cfg = CrossEncoderConfig(dim=64, n_heads=4, n_layers=1, n_experts=4)
    params = shard_params(init_params(jax.random.PRNGKey(0), cfg), cfg, mesh8)
    qkv = params["layers"][0]["attn"]["qkv"]["w"]
    # sharded on "model" (4-way): each shard holds 1/4 of the columns
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(64, 3 * 64 // 4)}
    moe_w1 = params["layers"][0]["moe"]["w1"]
    assert {s.data.shape for s in moe_w1.addressable_shards} == {(1, 64, 256)}
