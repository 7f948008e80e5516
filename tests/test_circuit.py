"""Circuit API vs the Qiskit-convention oracle and the fused paths."""

import numpy as np
import pytest
import jax.numpy as jnp

from qrag_tpu.ops.circuit import Circuit
from qrag_tpu.ops.statevector import encode_statevector

from oracle_qiskit import cx, gate_1q, oracle_statevector, ry, rz


def test_single_gates_match_oracle(rng):
    n = 3
    c = Circuit(n).ry(0.7, 0).rz(-1.2, 1).h(2).x(0).z(1)
    got = np.asarray(c.simulate())
    state = np.zeros(2 ** n, complex)
    state[0] = 1
    H = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    X = np.array([[0, 1], [1, 0]])
    Z = np.diag([1, -1])
    for u, q in [(ry(0.7), 0), (rz(-1.2), 1), (H, 2), (X, 0), (Z, 1)]:
        state = gate_1q(np.asarray(u, complex), q, n) @ state
    np.testing.assert_allclose(got, state, atol=1e-6)


def test_cx_matches_oracle():
    n = 3
    got = np.asarray(Circuit(n).h(0).cx(0, 2).simulate())
    state = np.zeros(2 ** n, complex)
    state[0] = 1
    H = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    state = gate_1q(H, 0, n) @ state
    state = cx(0, 2, n) @ state
    np.testing.assert_allclose(got, state, atol=1e-6)
    # Bell-pair probabilities on qubits 0,2
    probs = np.abs(got) ** 2
    np.testing.assert_allclose(probs[0b000], 0.5, atol=1e-6)
    np.testing.assert_allclose(probs[0b101], 0.5, atol=1e-6)


def test_encoding_circuit_equals_fused_encoder(rng):
    """Circuit-built reference encoding == the fused encode_statevector."""
    n = 4
    v = rng.randn(8).astype(np.float32)
    circuit_state = np.asarray(
        Circuit(n).encode_rotations(v).cx_ladder().simulate()
    )
    fused_state = np.asarray(encode_statevector(jnp.asarray(v), n))
    np.testing.assert_allclose(circuit_state, fused_state, atol=1e-6)
    oracle = oracle_statevector(v, n)
    np.testing.assert_allclose(circuit_state, oracle, atol=1e-6)


def test_batched_simulation(rng):
    n = 2
    states = jnp.zeros((5, 4), jnp.complex64).at[:, 0].set(1.0)
    out = Circuit(n).h(0).simulate(states)
    assert out.shape == (5, 4)
    np.testing.assert_allclose(np.abs(np.asarray(out[0])) ** 2, [0.5, 0.5, 0, 0], atol=1e-6)


def test_measure_probability():
    # |+> on qubit 0: P(1) = 0.5; after X on qubit 1: P(q1=1) = 1
    assert abs(float(Circuit(2).h(0).measure_probability(0)) - 0.5) < 1e-6
    assert abs(float(Circuit(2).x(1).measure_probability(1)) - 1.0) < 1e-6
    assert abs(float(Circuit(2).measure_probability(1, value=0)) - 1.0) < 1e-6
