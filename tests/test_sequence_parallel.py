"""Sequence-parallel forward == dense forward (SP; SURVEY.md §2)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qrag_tpu.config import MeshConfig
from qrag_tpu.models.cross_encoder import (
    CrossEncoderConfig,
    forward,
    init_params,
    tokenize_batch,
)
from qrag_tpu.models.sequence_parallel import (
    forward_sequence_parallel,
    score_long_documents,
)
from qrag_tpu.parallel.mesh import make_mesh

CFG = CrossEncoderConfig(
    dim=64, n_heads=4, n_layers=2, max_len=128, n_experts=2, dtype=jnp.float32
)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(MeshConfig(data_parallel=2, model_parallel=4))


def test_sp_matches_dense_forward(mesh8):
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens, mask = tokenize_batch(
        "what is discussed", ["text " * 40, "other content " * 20], CFG.max_len
    )
    dense = forward(params, jnp.asarray(tokens), jnp.asarray(mask), CFG)
    sp = forward_sequence_parallel(
        params, jnp.asarray(tokens), jnp.asarray(mask), CFG, mesh8
    )
    np.testing.assert_allclose(np.asarray(sp), np.asarray(dense), atol=1e-4)


def test_sp_moe_and_dense_variants(mesh8):
    cfg = CrossEncoderConfig(
        dim=32, n_heads=2, n_layers=1, max_len=64, n_experts=0,
        dtype=jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(1), cfg)
    tokens, mask = tokenize_batch("q", ["dense ffn path", "x"], cfg.max_len)
    dense = forward(params, jnp.asarray(tokens), jnp.asarray(mask), cfg)
    sp = forward_sequence_parallel(
        params, jnp.asarray(tokens), jnp.asarray(mask), cfg, mesh8
    )
    np.testing.assert_allclose(np.asarray(sp), np.asarray(dense), atol=1e-4)


def test_score_long_documents_wrapper(mesh8):
    params = init_params(jax.random.PRNGKey(2), CFG)
    tokens, mask = tokenize_batch(
        "query", ["long transcript " * 100 for _ in range(4)], CFG.max_len
    )
    out = score_long_documents(
        params, CFG, mesh8, jnp.asarray(tokens), jnp.asarray(mask)
    )
    assert out.shape == (4,)
    dense = forward(params, jnp.asarray(tokens), jnp.asarray(mask), CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-4)


def test_remat_forward_matches():
    import dataclasses

    params = init_params(jax.random.PRNGKey(3), CFG)
    tokens, mask = tokenize_batch("q", ["abc", "def"], CFG.max_len)
    base = forward(params, jnp.asarray(tokens), jnp.asarray(mask), CFG)
    cfg_r = dataclasses.replace(CFG, remat=True)
    rem = forward(params, jnp.asarray(tokens), jnp.asarray(mask), cfg_r)
    np.testing.assert_allclose(np.asarray(rem), np.asarray(base), atol=1e-6)

    # gradients flow through the remat path
    from qrag_tpu.models.cross_encoder import bce_loss

    g = jax.grad(bce_loss)(
        params,
        jnp.asarray(tokens),
        jnp.asarray(mask),
        jnp.asarray([1.0, 0.0]),
        cfg_r,
    )
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
