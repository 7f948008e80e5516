"""Independent NumPy oracle for the reference's quantum semantics.

Implements the encoding circuit of ``/root/reference/src/reranker/
quantum.py:138-167`` (ry/rz per qubit then a CX ladder) and
``state_fidelity`` with Qiskit's conventions — as full dense gate
matrices in complex128, a deliberately different algorithm from the
JAX implementation under test (which uses product-state contraction
and an analytic overlap formula).

Conventions:
  * little-endian qubit ordering: statevector index bit k == qubit k
  * RY(t) = [[cos t/2, -sin t/2], [sin t/2, cos t/2]]
  * RZ(t) = diag(e^{-it/2}, e^{+it/2})
  * CX(c, t): flips bit t where bit c == 1
  * initial state |0...0>
"""

import numpy as np


def ry(theta: float) -> np.ndarray:
    c, s = np.cos(theta / 2), np.sin(theta / 2)
    return np.array([[c, -s], [s, c]], dtype=complex)


def rz(phi: float) -> np.ndarray:
    return np.diag([np.exp(-1j * phi / 2), np.exp(1j * phi / 2)])


def gate_1q(u: np.ndarray, qubit: int, n: int) -> np.ndarray:
    """Full 2^n operator applying u to `qubit` (little-endian)."""
    op = np.eye(1, dtype=complex)
    for k in range(n - 1, -1, -1):
        op = np.kron(op, u if k == qubit else np.eye(2, dtype=complex))
    return op


def cx(control: int, target: int, n: int) -> np.ndarray:
    """Full 2^n CX permutation matrix."""
    dim = 2 ** n
    op = np.zeros((dim, dim), dtype=complex)
    for i in range(dim):
        j = i ^ (1 << target) if (i >> control) & 1 else i
        op[j, i] = 1.0
    return op


def oracle_statevector(vector: np.ndarray, n_qubits: int) -> np.ndarray:
    """Statevector of the reference encoding circuit."""
    v = np.asarray(vector, dtype=float)
    norm = np.linalg.norm(v)
    if norm > 0:
        v = v / norm
    state = np.zeros(2 ** n_qubits, dtype=complex)
    state[0] = 1.0
    for i in range(min(len(v), n_qubits)):
        state = gate_1q(ry(v[i] * np.pi), i, n_qubits) @ state
        state = gate_1q(rz(v[i] * np.pi / 2), i, n_qubits) @ state
    for i in range(n_qubits - 1):
        state = cx(i, i + 1, n_qubits) @ state
    return state


def oracle_fidelity(vec_a: np.ndarray, vec_b: np.ndarray, n_qubits: int) -> float:
    """state_fidelity(|psi_a>, |psi_b>) = |<psi_a|psi_b>|^2."""
    psi_a = oracle_statevector(vec_a, n_qubits)
    psi_b = oracle_statevector(vec_b, n_qubits)
    return float(np.abs(np.vdot(psi_a, psi_b)) ** 2)


def oracle_mock_embedding(text: str, dim: int) -> np.ndarray:
    """Reference mock embedding (``quantum.py:169-185``)."""
    seed = sum(ord(c) for c in text)
    np.random.seed(seed % (2 ** 32))
    v = np.random.random(dim)
    return v / np.linalg.norm(v)
