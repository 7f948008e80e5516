"""Learned-embedding recall evidence (VERDICT round-1 item 10): the
trained bi-encoder provider must beat the string-hash embedder on
recall@10 over episode-held-out chunks of the deterministic transcript
corpus.  Fixed tiny dataset + seeds; ~45 s on CPU."""

import numpy as np
import pytest

from qrag_tpu.models.recall_eval import RecallEvalConfig, run_eval
from qrag_tpu.pipeline.corpus_gen import (
    SYNONYMS,
    TOPICS,
    generate_corpus,
    make_query,
    split_by_episode,
)


def test_corpus_deterministic_and_split_disjoint():
    a = generate_corpus(8, 4, seed=3)
    b = generate_corpus(8, 4, seed=3)
    assert [c.text for c in a] == [c.text for c in b]
    assert [c.metadata for c in a] == [c.metadata for c in b]
    train, hold = split_by_episode(a, 0.25, seed=1)
    assert set(train).isdisjoint(hold)
    train_eps = {a[i].episode for i in train}
    hold_eps = {a[i].episode for i in hold}
    assert train_eps.isdisjoint(hold_eps)


def test_queries_paraphrase_not_copy():
    """Queries must use the synonym vocabulary (hash embeddings cannot
    bridge paraphrase; that is the point of the benchmark)."""
    chunks = generate_corpus(4, 2, seed=5)
    rng = np.random.RandomState(0)
    doc_vocab = set(w for ws in TOPICS.values() for w in ws)
    syn_vocab = set(SYNONYMS.values())
    hits = 0
    for c in chunks:
        q = make_query(c, rng)
        words = set(q.split())
        if words & syn_vocab:
            hits += 1
        # rare chunk token must appear for disambiguation
        assert any(r in q for r in c.rare)
    assert hits >= len(chunks) // 2


@pytest.mark.slow
def test_trained_embedder_beats_hash_on_heldout_recall():
    cfg = RecallEvalConfig(
        n_episodes=8,
        chunks_per_episode=4,
        steps=120,
        batch=24,
        dim=48,
        layers=1,
        heads=2,
        out_dim=48,
        max_len=96,
        k=10,
        queries_per_chunk=2,
    )
    out = run_eval(cfg)
    # fixed seeds: measured trained=0.56 / hash=0.25 — assert with margin
    assert out["trained"] > out["hash"], out
    assert out["trained"] >= 0.4, out
    # training actually descended
    losses = dict(out["loss_trace"])
    assert losses[0] > losses[max(losses)] + 0.5, out["loss_trace"]
