"""Fidelity-kernel parity vs. the independent Qiskit-convention oracle
(SURVEY.md §4.1: 1e-6 tolerance, the BASELINE north-star requirement)."""

import numpy as np
import pytest
import jax.numpy as jnp

from qrag_tpu.ops.statevector import (
    batched_fidelity,
    encode_statevector,
    fidelity_analytic,
    fidelity_statevector,
)
from qrag_tpu.pipeline.embeddings import MockEmbedder

from oracle_qiskit import (
    oracle_fidelity,
    oracle_mock_embedding,
    oracle_statevector,
)


@pytest.mark.parametrize("n_qubits", [2, 3, 4, 6, 8])
def test_encode_statevector_matches_oracle(n_qubits, rng):
    for _ in range(5):
        v = rng.randn(n_qubits * 2).astype(np.float32)
        got = np.asarray(encode_statevector(jnp.asarray(v), n_qubits))
        want = oracle_statevector(v, n_qubits)
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("n_qubits", [2, 4, 6, 10])
def test_statevector_fidelity_matches_oracle(n_qubits, rng):
    q = rng.rand(n_qubits * 2).astype(np.float32)
    docs = rng.rand(8, n_qubits * 2).astype(np.float32)
    got = np.asarray(
        fidelity_statevector(jnp.asarray(q), jnp.asarray(docs), n_qubits)
    )
    want = np.array([oracle_fidelity(q, d, n_qubits) for d in docs])
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("n_qubits", [2, 4, 6, 10])
def test_analytic_fidelity_matches_oracle(n_qubits, rng):
    """The O(n) product-form path must agree with the O(2^n) oracle:
    the shared CX ladder cancels inside the overlap."""
    q = rng.rand(n_qubits * 2).astype(np.float32)
    docs = rng.rand(16, n_qubits * 2).astype(np.float32)
    got = np.asarray(
        fidelity_analytic(jnp.asarray(q), jnp.asarray(docs), n_qubits)
    )
    want = np.array([oracle_fidelity(q, d, n_qubits) for d in docs])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_analytic_equals_statevector_path(rng):
    n_qubits = 5
    q = rng.rand(n_qubits * 2).astype(np.float32)
    docs = rng.rand(32, n_qubits * 2).astype(np.float32)
    a = np.asarray(batched_fidelity(jnp.asarray(q), jnp.asarray(docs), n_qubits, True))
    b = np.asarray(batched_fidelity(jnp.asarray(q), jnp.asarray(docs), n_qubits, False))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_short_vector_pads_with_identity(rng):
    """Vectors shorter than n_qubits leave trailing qubits in |0>
    (``quantum.py:158`` uses min(len(v), n_qubits))."""
    n_qubits = 6
    q = rng.rand(3).astype(np.float32)
    d = rng.rand(3).astype(np.float32)
    got = float(
        fidelity_analytic(jnp.asarray(q), jnp.asarray(d)[None, :], n_qubits)[0]
    )
    want = oracle_fidelity(q, d, n_qubits)
    assert abs(got - want) < 1e-6


def test_self_fidelity_is_one(rng):
    n_qubits = 4
    v = rng.rand(8).astype(np.float32)
    f = float(fidelity_analytic(jnp.asarray(v), jnp.asarray(v)[None, :], n_qubits)[0])
    assert abs(f - 1.0) < 1e-6


def test_fidelity_bounded(rng):
    n_qubits = 8
    q = rng.rand(16).astype(np.float32)
    docs = rng.rand(64, 16).astype(np.float32)
    f = np.asarray(fidelity_analytic(jnp.asarray(q), jnp.asarray(docs), n_qubits))
    assert np.all(f >= -1e-6) and np.all(f <= 1 + 1e-6)


def test_mock_embedder_reference_parity():
    """MockEmbedder must reproduce ``quantum.py:169-185`` bit-for-bit."""
    emb = MockEmbedder(dim=8)
    for text in ["hello world", "advertisement detection", "a", "Piers Morgan"]:
        got = emb.embed_one(text)
        want = oracle_mock_embedding(text, 8)
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)


def test_zero_vector_passthrough():
    """Zero vectors skip normalization (``quantum.py:149-151``)."""
    n_qubits = 3
    z = np.zeros(6, dtype=np.float32)
    got = np.asarray(encode_statevector(jnp.asarray(z), n_qubits))
    want = oracle_statevector(z, n_qubits)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rotation_features_fidelity_matches_analytic(rng):
    """Feature-based path (what the fused rerank gathers) == direct
    analytic fidelity on raw vectors."""
    from qrag_tpu.ops.statevector import (
        fidelity_from_features,
        rotation_features,
    )

    n_qubits = 10
    q = rng.randn(768).astype(np.float32) * 3.0
    docs = rng.randn(32, 768).astype(np.float32)
    want = np.asarray(fidelity_analytic(jnp.asarray(q), jnp.asarray(docs), n_qubits))
    qf = rotation_features(jnp.asarray(q), n_qubits)
    df = rotation_features(jnp.asarray(docs), n_qubits)
    got = np.asarray(fidelity_from_features(qf, df))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rotation_features_short_vector(rng):
    from qrag_tpu.ops.statevector import (
        fidelity_from_features,
        rotation_features,
    )

    n_qubits = 6
    q = rng.randn(3).astype(np.float32)
    d = rng.randn(4, 3).astype(np.float32)
    want = np.asarray(fidelity_analytic(jnp.asarray(q), jnp.asarray(d), n_qubits))
    got = np.asarray(
        fidelity_from_features(
            rotation_features(jnp.asarray(q), n_qubits),
            rotation_features(jnp.asarray(d), n_qubits),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
