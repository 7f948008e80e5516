"""Reranker + controller behavior: routing truth table, fidelity
ranking parity, graceful-degradation contract (SURVEY.md §4.1, §5)."""

import numpy as np
import pytest

from qrag_tpu.config import ClassicalConfig, QragConfig, QuantumConfig
from qrag_tpu.documents import Document
from qrag_tpu.reranker import (
    ClassicalReranker,
    QuantumReranker,
    RerankerController,
)
from qrag_tpu.reranker.classical import sanitize_text
from qrag_tpu.reranker.controller import rerank_response_dict

from oracle_qiskit import oracle_fidelity, oracle_mock_embedding


def _docs(n=5):
    return [Document(id=str(i), content=f"document number {i} text") for i in range(n)]


# ---------------------------------------------------------------- routing


@pytest.mark.parametrize(
    "query,expected",
    [
        # <= 8 words, no keywords -> classical
        ("what is the weather today", "classical"),
        # > 8 words -> quantum (complexity)
        ("one two three four five six seven eight nine", "quantum"),
        # exactly 8 words, no keyword -> classical (strict >)
        ("one two three four five six seven eight", "classical"),
        # keyword hit -> quantum
        ("find the sponsor segment", "quantum"),
        # substring quirk: "add" contains "ad" (Appendix A.7)
        ("please add numbers", "quantum"),
        ("brand new show", "quantum"),
        ("discount codes here", "quantum"),
    ],
)
def test_controller_routing_truth_table(query, expected):
    ctl = RerankerController()
    assert ctl.select_reranker(query) == expected


def test_controller_explicit_type_overrides_routing():
    ctl = RerankerController()
    out = ctl.rerank("short query", _docs(3), top_k=2, reranker_type="quantum")
    assert out["reranker_used"] == "quantum"
    assert len(out["documents"]) == 2


def test_controller_response_shape():
    ctl = RerankerController()
    out = ctl.rerank("what is this", _docs(4), top_k=3)
    assert set(out.keys()) == {"documents", "reranker_used", "query"}
    assert out["query"] == "what is this"
    doc, score = out["documents"][0]
    assert isinstance(doc, Document) and isinstance(score, float)
    # explicit JSON schema (Appendix A.3)
    js = rerank_response_dict(out)
    import json

    json.dumps(js)  # must be serializable
    assert js["documents"][0]["document"]["id"] == doc.id


# ---------------------------------------------------------------- quantum


def test_quantum_scores_match_oracle():
    """End-to-end: mock embeddings -> fidelity must equal the
    Qiskit-convention oracle to 1e-6 (BASELINE north star)."""
    cfg = QuantumConfig(n_qubits=4)
    rr = QuantumReranker(cfg)
    docs = _docs(6)
    query = "detect the advertisement"
    scores = rr.score_documents(query, docs)
    q_vec = oracle_mock_embedding(query, 8)
    for doc, got in zip(docs, scores):
        d_vec = oracle_mock_embedding(doc.content, 8)
        want = oracle_fidelity(q_vec, d_vec, 4)
        assert abs(float(got) - want) < 1e-6


def test_quantum_rerank_sorts_descending():
    rr = QuantumReranker(QuantumConfig(n_qubits=4))
    out = rr.rerank("find ads", _docs(8), top_k=5)
    scores = [s for _, s in out]
    assert scores == sorted(scores, reverse=True)
    assert len(out) == 5


def test_quantum_statevector_path_agrees_with_analytic():
    docs = _docs(6)
    q = "some query about sponsors"
    a = QuantumReranker(QuantumConfig(n_qubits=4, use_analytic_fidelity=True))
    b = QuantumReranker(QuantumConfig(n_qubits=4, use_analytic_fidelity=False))
    sa = a.score_documents(q, docs)
    sb = b.score_documents(q, docs)
    np.testing.assert_allclose(sa, sb, atol=1e-6)


def test_quantum_empty_documents():
    rr = QuantumReranker()
    assert rr.rerank("query", []) == []


def test_quantum_fallback_on_scoring_failure():
    """Scoring failure → classical fallback (``quantum.py:59-61``
    contract)."""

    def broken_embedder(texts):
        raise RuntimeError("boom")

    fallback_calls = []

    class SpyClassical(ClassicalReranker):
        def rerank(self, query, documents, top_k=None):
            fallback_calls.append(query)
            return super().rerank(query, documents, top_k)

    rr = QuantumReranker(
        embedder=broken_embedder, classical_fallback=SpyClassical()
    )
    out = rr.rerank("query text", _docs(3))
    assert fallback_calls == ["query text"]
    assert len(out) == 3


def test_quantum_non_fidelity_method_neutral_scores():
    """Non-state_fidelity method → flat 0.5 (``quantum.py:134-136``)."""
    rr = QuantumReranker(QuantumConfig(method="other"))
    out = rr.rerank("query", _docs(3))
    assert all(s == 0.5 for _, s in out)


# --------------------------------------------------------------- classical


def test_classical_cosine_ranking(rng):
    """Cosine scorer ranks by embedding similarity."""
    embeds = {
        "q": np.array([1.0, 0.0, 0.0], np.float32),
        "близко": np.array([0.9, 0.1, 0.0], np.float32),
        "далеко": np.array([0.0, 0.0, 1.0], np.float32),
    }

    def embedder(texts):
        return np.stack([embeds[t] for t in texts])

    rr = ClassicalReranker(embedder=embedder)
    docs = [Document("far", "далеко"), Document("near", "близко")]
    out = rr.rerank("q", docs)
    assert out[0][0].id == "near"
    assert out[0][1] > out[1][1]


def test_classical_invalid_input_neutral():
    rr = ClassicalReranker()
    docs = _docs(3)
    out = rr.rerank("", docs)
    assert [d.id for d, _ in out] == [d.id for d in docs]  # original order
    assert all(s == 0.5 for _, s in out)
    assert rr.rerank("ok", []) == []


def test_classical_scorer_failure_neutral_after_retries():
    calls = []

    def failing_scorer(query, contents):
        calls.append(1)
        raise RuntimeError("down")

    cfg = ClassicalConfig(max_retries=2)
    rr = ClassicalReranker(cfg, scorer=failing_scorer)
    import time as _time

    t0 = _time.time()
    out = rr.rerank("query", _docs(2))
    assert len(calls) == 2  # retried max_retries times
    assert all(s == 0.5 for _, s in out)


def test_classical_score_cache():
    calls = []

    def counting_scorer(query, contents):
        calls.append(len(contents))
        return np.linspace(0.1, 0.9, len(contents))

    rr = ClassicalReranker(scorer=counting_scorer)
    docs = _docs(4)
    rr.rerank("q", docs)
    rr.rerank("q", docs)  # second call fully served from cache
    assert calls == [4]


def test_classical_stable_sort_ties():
    """Equal scores preserve original order (Python stable sort, as in
    the reference)."""
    rr = ClassicalReranker(scorer=lambda q, c: np.full(len(c), 0.7))
    docs = _docs(5)
    out = rr.rerank("q", docs)
    assert [d.id for d, _ in out] == [d.id for d in docs]


def test_classical_batching(rng):
    sizes = []

    def scorer(query, contents):
        sizes.append(len(contents))
        return rng.rand(len(contents))

    cfg = ClassicalConfig(batch_size=3, enable_cache=False)
    rr = ClassicalReranker(cfg, scorer=scorer)
    rr.rerank("q", _docs(8))
    assert sizes == [3, 3, 2]


def test_sanitize_text():
    assert sanitize_text("  a \n\t b  ") == "a b"
    long = "x" * 5000
    assert len(sanitize_text(long, max_sequence_length=512)) == 2048
    assert sanitize_text(12345) == "12345"


def test_classical_scorer_fallback_chain(rng):
    """VERDICT round-1 missing #2: cross-encoder failure falls back to
    the cosine scorer (reference: 3-model chain, classical.py:134-153)
    BEFORE neutral scores; cosine failure still degrades to neutral."""
    from qrag_tpu.config import ClassicalConfig
    from qrag_tpu.reranker.classical import ClassicalReranker

    cfg = ClassicalConfig(method="cross-encoder", max_retries=1, enable_cache=False)
    rr = ClassicalReranker(config=cfg)
    rr._score_cross_encoder = lambda q, c: (_ for _ in ()).throw(
        RuntimeError("broken model")
    )
    docs = [Document(id="a", content="alpha beta gamma"),
            Document(id="b", content="totally different words here")]
    out = rr.rerank("alpha beta gamma", docs, top_k=2)
    # fell back to cosine, NOT neutral: scores differ and the
    # lexically-identical doc wins
    scores = [s for _, s in out]
    assert scores[0] != scores[1]
    assert out[0][0].id == "a"
    assert rr._active_method == "cosine"
    # cosine scores match a pure-cosine reranker
    direct = ClassicalReranker(
        config=ClassicalConfig(method="cosine", enable_cache=False)
    ).rerank("alpha beta gamma", docs, top_k=2)
    assert [(d.id, round(s, 6)) for d, s in out] == [
        (d.id, round(s, 6)) for d, s in direct
    ]
    # a second request uses the fallback directly (sticky)
    out2 = rr.rerank("alpha beta gamma", docs, top_k=2)
    assert [d.id for d, _ in out2] == ["a", "b"]


def test_classical_fallback_exhausted_goes_neutral(rng):
    from qrag_tpu.config import ClassicalConfig
    from qrag_tpu.reranker.classical import ClassicalReranker

    cfg = ClassicalConfig(method="cosine", max_retries=1, enable_cache=False)
    rr = ClassicalReranker(
        config=cfg,
        scorer=lambda q, c: (_ for _ in ()).throw(RuntimeError("down")),
    )
    docs = [Document(id="a", content="x"), Document(id="b", content="y")]
    out = rr.rerank("query", docs, top_k=2)
    # original order, neutral 0.5 (classical.py:218-229 contract)
    assert [(d.id, s) for d, s in out] == [("a", 0.5), ("b", 0.5)]


def test_fallback_rescores_whole_request_on_one_scale(rng):
    """A mid-request cross-encoder failure must not mix score scales:
    the request rescorest entirely on the fallback scorer and stale
    cached cross-encoder-scale scores are dropped (regression)."""
    from qrag_tpu.config import ClassicalConfig
    from qrag_tpu.reranker.classical import (
        ClassicalReranker,
        _stable_key,
        sanitize_text,
    )

    cfg = ClassicalConfig(
        method="cross-encoder", max_retries=1, batch_size=2, enable_cache=True
    )
    rr = ClassicalReranker(config=cfg)
    rr._score_cross_encoder = lambda q, c: (_ for _ in ()).throw(
        RuntimeError("down")
    )
    docs = [
        Document(id=str(i), content=f"words number {i} " * (i + 1))
        for i in range(5)
    ]
    # poison the cache with a cross-encoder-scale score for doc 0
    q_s = sanitize_text("the query", cfg.max_sequence_length)
    d_s = sanitize_text(docs[0].content, cfg.max_sequence_length)
    rr.score_cache[_stable_key(q_s, d_s)] = 9.99
    out = rr.rerank("the query", docs, top_k=5)
    pure = ClassicalReranker(
        config=ClassicalConfig(method="cosine", enable_cache=False)
    ).rerank("the query", docs, top_k=5)
    assert [(d.id, round(s, 6)) for d, s in out] == [
        (d.id, round(s, 6)) for d, s in pure
    ]
    assert all(s <= 1.0 for _, s in out)  # no 9.99-scale leftovers
