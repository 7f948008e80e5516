"""Checkpoint/resume + profiling utils + serving shape bucketing."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_train_state_checkpoint_roundtrip(tmp_path):
    import optax

    from qrag_tpu.models.checkpoint import load_train_state, save_train_state
    from qrag_tpu.models.cross_encoder import (
        CrossEncoderConfig,
        init_params,
        make_train_step,
    )
    from qrag_tpu.parallel.train import synthetic_batch

    cfg = CrossEncoderConfig(
        dim=32, n_heads=2, n_layers=1, max_len=32, n_experts=0,
        dtype=jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step_fn = jax.jit(make_train_step(cfg, opt))
    rng = np.random.RandomState(0)
    for _ in range(3):
        toks, masks, labels = synthetic_batch(rng, 8, cfg.max_len)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(toks), jnp.asarray(masks),
            jnp.asarray(labels),
        )

    d = str(tmp_path / "ckpt")
    save_train_state(d, params, opt_state, step=3, cfg=cfg)

    # resume into fresh trees
    fresh_params = init_params(jax.random.PRNGKey(42), cfg)
    fresh_opt = opt.init(fresh_params)
    r_params, r_opt, r_step, cfg_dict = load_train_state(
        d, fresh_params, fresh_opt
    )
    assert r_step == 3
    assert cfg_dict["config"]["dim"] == 32 if "config" in cfg_dict else cfg_dict["dim"] == 32
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(r_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues deterministically vs the original
    toks, masks, labels = synthetic_batch(np.random.RandomState(9), 8, cfg.max_len)
    _, _, loss_a = step_fn(
        params, opt_state, jnp.asarray(toks), jnp.asarray(masks), jnp.asarray(labels)
    )
    _, _, loss_b = step_fn(
        r_params, r_opt, jnp.asarray(toks), jnp.asarray(masks), jnp.asarray(labels)
    )
    assert abs(float(loss_a) - float(loss_b)) < 1e-6


def test_stage_timer_and_metrics():
    from qrag_tpu.utils.metrics import Metrics
    from qrag_tpu.utils.profiling import stage_timer

    with stage_timer("test_stage"):
        pass
    m = Metrics()
    with m.timer("x"):
        pass
    m.incr("hits", 3)
    snap = m.snapshot()
    assert snap["counters"]["hits"] == 3
    assert snap["latency"]["x"]["count"] == 1


def test_profiler_trace_writes_files(tmp_path):
    from qrag_tpu.utils.profiling import annotate, trace

    d = str(tmp_path / "trace")
    with trace(d):
        with annotate("unit-test-span"):
            jnp.sum(jnp.ones((128, 128))).block_until_ready()
    # xprof dumps per-run subdirectories with .pb / .json artifacts
    found = [
        os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs
    ]
    assert found, "trace produced no files"


def test_quantum_bucketed_scoring_consistency():
    """Padded bucket sizes must not change scores, and nearby doc
    counts must reuse the same compiled shape."""
    from qrag_tpu.config import QuantumConfig
    from qrag_tpu.documents import Document
    from qrag_tpu.reranker.quantum import QuantumReranker

    rr = QuantumReranker(QuantumConfig(n_qubits=4))
    docs = [Document(str(i), f"document {i}") for i in range(11)]
    s11 = rr.score_documents("q", docs)
    s9 = rr.score_documents("q", docs[:9])
    assert s11.shape == (11,)
    np.testing.assert_allclose(s9, s11[:9], atol=1e-6)


def test_device_memory_stats_optional():
    from qrag_tpu.utils.profiling import device_memory_stats

    stats = device_memory_stats()  # None is acceptable on CPU
    assert stats is None or isinstance(stats, dict)


def test_checkpoint_restore_preserves_mesh_shardings(tmp_path):
    """Review regression: restoring onto sharded templates must keep
    the NamedSharding layout (TP/EP resume)."""
    import jax
    from jax.sharding import NamedSharding

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from qrag_tpu.config import MeshConfig
    from qrag_tpu.models.checkpoint import load_train_state, save_train_state
    from qrag_tpu.models.cross_encoder import CrossEncoderConfig
    from qrag_tpu.parallel.mesh import make_mesh
    from qrag_tpu.parallel.train import make_sharded_trainer

    cfg = CrossEncoderConfig(
        dim=32, n_heads=2, n_layers=1, max_len=32, n_experts=4,
        dtype=jnp.float32,
    )
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    params, opt_state, step, _ = make_sharded_trainer(cfg, mesh)
    d = str(tmp_path / "s")
    save_train_state(d, params, opt_state, step=1, cfg=cfg)
    r_params, r_opt, r_step, _ = load_train_state(d, params, opt_state)
    qkv = r_params["layers"][0]["attn"]["qkv"]["w"]
    assert isinstance(qkv.sharding, NamedSharding)
    # still sharded 4-way on the model axis
    assert {s.data.shape for s in qkv.addressable_shards} == {(32, 3 * 32 // 4)}
    # and a train step runs on the restored state
    from qrag_tpu.parallel.train import synthetic_batch
    from jax.sharding import PartitionSpec as P

    toks, masks, labels = synthetic_batch(np.random.RandomState(0), 4, 32)
    bsh = NamedSharding(mesh, P("data", None))
    _, _, loss = step(
        r_params,
        r_opt,
        jax.device_put(jnp.asarray(toks), bsh),
        jax.device_put(jnp.asarray(masks), bsh),
        jax.device_put(jnp.asarray(labels), NamedSharding(mesh, P("data"))),
    )
    assert np.isfinite(float(loss))
