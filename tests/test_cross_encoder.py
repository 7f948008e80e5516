"""Cross-encoder model: tokenizer, forward, training, scorer wiring
into the classical reranker (reference: ``classical.py:45-77``)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qrag_tpu.models.cross_encoder import (
    CLS_ID,
    PAD_ID,
    SEP_ID,
    CrossEncoderConfig,
    CrossEncoderScorer,
    bce_loss,
    forward,
    init_params,
    tokenize_batch,
    tokenize_pair,
)

CFG = CrossEncoderConfig(
    dim=64, n_heads=4, n_layers=2, max_len=64, n_experts=2, dtype=jnp.float32
)


def test_tokenize_pair_layout():
    ids, mask = tokenize_pair("ab", "cd", max_len=16)
    assert ids[0] == CLS_ID
    assert list(ids[1:3]) == [ord("a"), ord("b")]
    assert ids[3] == SEP_ID
    assert list(ids[4:6]) == [ord("c"), ord("d")]
    assert ids[6] == SEP_ID
    assert (ids[7:] == PAD_ID).all()
    assert mask[:7].sum() == 7 and mask[7:].sum() == 0


def test_tokenize_truncation():
    ids, mask = tokenize_pair("q" * 500, "d" * 500, max_len=64)
    assert len(ids) == 64
    assert int(mask.sum()) == 64


def test_forward_shapes_and_determinism():
    params = init_params(jax.random.PRNGKey(0), CFG)
    toks, mask = tokenize_batch("query", ["doc a", "doc b", "doc c"], CFG.max_len)
    out1 = forward(params, jnp.asarray(toks), jnp.asarray(mask), CFG)
    out2 = forward(params, jnp.asarray(toks), jnp.asarray(mask), CFG)
    assert out1.shape == (3,)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_padding_invariance():
    """Scores must not depend on padded positions."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    t1, m1 = tokenize_batch("query", ["short doc"], 64)
    t2, m2 = t1.copy(), m1.copy()
    t2[0, int(m2[0].sum()):] = 17  # garbage in padded region
    o1 = forward(params, jnp.asarray(t1), jnp.asarray(m1), CFG)
    o2 = forward(params, jnp.asarray(t2), jnp.asarray(m2), CFG)
    # pad tokens are masked out of attention; only their own (ignored)
    # positions differ
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_single_device_training_learns():
    import optax

    from qrag_tpu.models.cross_encoder import make_train_step
    from qrag_tpu.parallel.train import synthetic_batch

    params = init_params(jax.random.PRNGKey(1), CFG)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(CFG, opt))
    rng = np.random.RandomState(0)
    losses = []
    for _ in range(40):
        toks, masks, labels = synthetic_batch(rng, 16, CFG.max_len)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(toks), jnp.asarray(masks), jnp.asarray(labels)
        )
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9


def test_scorer_batch_padding_and_range():
    scorer = CrossEncoderScorer(CFG)
    scores = scorer.score("my query", [f"doc {i}" for i in range(5)])
    assert scores.shape == (5,)
    assert np.all((scores >= 0) & (scores <= 1))  # sigmoid outputs


def test_scorer_save_load_roundtrip(tmp_path):
    scorer = CrossEncoderScorer(CFG, seed=3)
    s1 = scorer.score("q", ["a", "b"])
    d = str(tmp_path / "model")
    scorer.save(d)
    other = CrossEncoderScorer(CFG, seed=99)  # different init
    assert not np.allclose(other.score("q", ["a", "b"]), s1)
    other.load(d)
    np.testing.assert_allclose(other.score("q", ["a", "b"]), s1, atol=1e-6)


def test_classical_reranker_cross_encoder_method():
    """ClassicalReranker(method='cross-encoder') end-to-end."""
    from qrag_tpu.config import ClassicalConfig
    from qrag_tpu.documents import Document
    from qrag_tpu.reranker.classical import ClassicalReranker

    rr = ClassicalReranker(ClassicalConfig(method="cross-encoder"))
    docs = [Document(str(i), f"some document text {i}") for i in range(4)]
    out = rr.rerank("a query", docs, top_k=3)
    assert len(out) == 3
    scores = [s for _, s in out]
    assert scores == sorted(scores, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_dense_ffn_variant():
    cfg = CrossEncoderConfig(
        dim=32, n_heads=2, n_layers=1, max_len=32, n_experts=0, dtype=jnp.float32
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "mlp" in params["layers"][0] and "moe" not in params["layers"][0]
    toks, mask = tokenize_batch("q", ["d"], cfg.max_len)
    out = forward(params, jnp.asarray(toks), jnp.asarray(mask), cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_chunk_pool_long_doc_strategy():
    """chunk_pool scores windows and max-pools; a relevant passage
    buried beyond the truncation limit must still be seen."""
    from qrag_tpu.config import ClassicalConfig
    from qrag_tpu.documents import Document
    from qrag_tpu.reranker.classical import ClassicalReranker

    calls = []

    def spy_scorer(query, contents):
        calls.append(list(contents))
        # score 1.0 for pieces containing the marker, else 0.0
        return np.asarray(
            [1.0 if "XMARKERX" in c else 0.0 for c in contents], np.float32
        )

    long_prefix = "padding words " * 400  # ~5600 chars > 2048 truncation
    docs = [
        Document("buried", long_prefix + " XMARKERX"),
        Document("plain", "irrelevant short text"),
    ]
    # truncate mode: marker dropped -> both score 0, original order kept
    rr_t = ClassicalReranker(
        ClassicalConfig(long_doc_strategy="truncate", enable_cache=False),
        scorer=spy_scorer,
    )
    out_t = rr_t.rerank("q", docs)
    assert [d.id for d, _ in out_t] == ["buried", "plain"]
    assert all(s == 0.0 for _, s in out_t)

    # chunk_pool: marker window scores 1.0 -> buried doc wins
    rr_c = ClassicalReranker(
        ClassicalConfig(long_doc_strategy="chunk_pool", enable_cache=False,
                        method="cross-encoder"),
        scorer=None,
    )
    rr_c._scorer_override = None
    # patch the cross-encoder scorer boundary with the spy
    rr_c._score_cross_encoder_orig = rr_c._score_cross_encoder

    class FakeCE:
        def score(self, query, pieces):
            return spy_scorer(query, pieces)

    rr_c._cross_encoder = FakeCE()
    out_c = rr_c.rerank("q", docs)
    assert out_c[0][0].id == "buried"
    assert out_c[0][1] == 1.0
    # the long doc was split into multiple scored windows
    assert any(len(c) > 2 for c in calls[1:])
