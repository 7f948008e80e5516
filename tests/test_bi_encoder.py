"""Bi-encoder model family: contrastive training, retrieval quality
vs the hash baseline, embedder integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qrag_tpu.models.bi_encoder import (
    BiEncoderConfig,
    TrainedEmbedder,
    encode,
    info_nce_loss,
    init_params,
    make_train_step,
    synthetic_pairs,
    tokenize_texts,
)
from qrag_tpu.models.cross_encoder import CrossEncoderConfig

CFG = BiEncoderConfig(
    tower=CrossEncoderConfig(
        dim=64, n_heads=4, n_layers=2, max_len=64, n_experts=0,
        dtype=jnp.float32,
    ),
    out_dim=32,
)


def _train(steps=150, batch=32, seed=0):
    import optax

    params = init_params(jax.random.PRNGKey(seed), CFG)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(CFG, opt))
    rng = np.random.RandomState(seed)
    losses = []
    for _ in range(steps):
        qt, qm, dt, dm = synthetic_pairs(rng, batch, CFG.tower.max_len)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(qt), jnp.asarray(qm),
            jnp.asarray(dt), jnp.asarray(dm),
        )
        losses.append(float(loss))
    return params, losses


def test_encode_unit_norm():
    params = init_params(jax.random.PRNGKey(0), CFG)
    toks, mask = tokenize_texts(["hello world", "x"], CFG.tower.max_len)
    emb = encode(params, jnp.asarray(toks), jnp.asarray(mask), CFG)
    assert emb.shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-5
    )


def test_contrastive_training_learns():
    params, losses = _train()
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.7


def test_trained_embedder_beats_random_on_retrieval():
    """After training, queries retrieve their positive docs far better
    than with random-init weights."""
    from qrag_tpu.index.flat_index import DeviceFlatIndex

    params, _ = _train()
    rng = np.random.RandomState(42)
    from qrag_tpu.parallel.train import _WORDS

    queries, docs = [], []
    for _ in range(32):
        qw = list(rng.choice(_WORDS, size=3, replace=False))
        dw = qw + list(rng.choice(_WORDS, size=5))
        rng.shuffle(dw)
        queries.append(" ".join(qw))
        docs.append(" ".join(dw))

    def recall_at_3(embedder):
        d_emb = embedder(docs)
        idx = DeviceFlatIndex.from_numpy(d_emb, metric="ip", topk_mode="exact")
        res = idx.search(embedder(queries), k=3)
        return np.mean([i in set(res.indices[i]) for i in range(len(queries))])

    trained = TrainedEmbedder(CFG, params=params)
    random_init = TrainedEmbedder(CFG, seed=123)
    r_trained = recall_at_3(trained)
    r_random = recall_at_3(random_init)
    assert r_trained >= r_random + 0.3, (r_trained, r_random)
    assert r_trained >= 0.6


def test_trained_embedder_save_load(tmp_path):
    emb = TrainedEmbedder(CFG, seed=7)
    v1 = emb(["some text"])
    d = str(tmp_path / "w")
    emb.save(d)
    other = TrainedEmbedder(CFG, seed=99)
    assert not np.allclose(other(["some text"]), v1)
    other.load(d)
    np.testing.assert_allclose(other(["some text"]), v1, atol=1e-6)


def test_trained_embedder_batching():
    emb = TrainedEmbedder(CFG, seed=0, batch_size=4)
    texts = [f"text number {i}" for i in range(11)]  # crosses batches
    all_at_once = emb(texts)
    assert all_at_once.shape == (11, 32)
    np.testing.assert_allclose(all_at_once[7], emb([texts[7]])[0], atol=1e-5)


def test_get_embedder_trained_provider():
    from qrag_tpu.config import EmbeddingConfig
    from qrag_tpu.pipeline.embeddings import get_embedder

    e = get_embedder(EmbeddingConfig(provider="trained", model="nonexistent"))
    out = e(["abc"])
    assert out.shape[0] == 1 and abs(np.linalg.norm(out[0]) - 1) < 1e-5


def test_engine_with_trained_embedder():
    from qrag_tpu.config import QragConfig
    from qrag_tpu.engine import QragEngine

    params, _ = _train(steps=30)
    embedder = TrainedEmbedder(CFG, params=params)
    cfg = QragConfig.from_dict(
        {"embedding": {"provider": "hash", "dim": 32}}  # overridden below
    )
    eng = QragEngine(config=cfg, embedder=embedder)
    eng.add_texts(
        ["podcast advert sponsor", "sport news debate", "music health money"],
        ["d0", "d1", "d2"],
    )
    res = eng.search("advert sponsor podcast", k=1)
    assert res.metadata[0][0] == "d0"


def test_trained_provider_respects_config_dim():
    """Review regression: provider='trained' must emit config.dim-sized
    vectors so the engine index and embedder agree."""
    from qrag_tpu.config import EmbeddingConfig, QragConfig
    from qrag_tpu.engine import QragEngine
    from qrag_tpu.pipeline.embeddings import get_embedder

    e = get_embedder(EmbeddingConfig(provider="trained", dim=64, model="none"))
    assert e(["abc"]).shape == (1, 64)
    eng = QragEngine(
        config=QragConfig.from_dict(
            {"embedding": {"provider": "trained", "dim": 64, "model": "none"}}
        )
    )
    eng.add_texts(["hello world"], ["m/0"])
    assert eng.search("hello world", k=1).metadata[0][0] == "m/0"
