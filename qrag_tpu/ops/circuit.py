"""Minimal quantum circuit API over the batched statevector ops.

The reference builds circuits with Qiskit's ``QuantumCircuit``
(``quantum.py:154-165``: ry/rz/cx).  This module provides the same
construction surface natively — gates append to a program, ``simulate``
folds them over the JAX statevector ops — so circuit *variants* (other
entanglers, extra layers, Hadamard test probes) can be expressed
without Qiskit while reusing the tested gate kernels.

All gates match Qiskit conventions (little-endian, RY/RZ/H/X/CX
matrices as in ``tests/oracle_qiskit.py``); batched simulation via
vmap.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from qrag_tpu.ops.statevector import apply_1q_gate, apply_cx

_SQRT1_2 = 1.0 / math.sqrt(2.0)


def _ry(theta) -> jnp.ndarray:
    c, s = jnp.cos(theta / 2), jnp.sin(theta / 2)
    return jnp.array([[c, -s], [s, c]], jnp.complex64)


def _rz(phi) -> jnp.ndarray:
    return jnp.array(
        [[jnp.exp(-1j * phi / 2), 0], [0, jnp.exp(1j * phi / 2)]],
        jnp.complex64,
    )


_H = jnp.array([[_SQRT1_2, _SQRT1_2], [_SQRT1_2, -_SQRT1_2]], jnp.complex64)
_X = jnp.array([[0, 1], [1, 0]], jnp.complex64)
_Z = jnp.array([[1, 0], [0, -1]], jnp.complex64)


@dataclass
class Circuit:
    """Gate program on ``n_qubits`` (Qiskit-convention semantics)."""

    n_qubits: int
    _ops: List[Tuple] = field(default_factory=list)

    # -- construction (chainable) --------------------------------------

    def ry(self, theta: float, qubit: int) -> "Circuit":
        self._ops.append(("1q", _ry(theta), qubit))
        return self

    def rz(self, phi: float, qubit: int) -> "Circuit":
        self._ops.append(("1q", _rz(phi), qubit))
        return self

    def h(self, qubit: int) -> "Circuit":
        self._ops.append(("1q", _H, qubit))
        return self

    def x(self, qubit: int) -> "Circuit":
        self._ops.append(("1q", _X, qubit))
        return self

    def z(self, qubit: int) -> "Circuit":
        self._ops.append(("1q", _Z, qubit))
        return self

    def gate(self, matrix, qubit: int) -> "Circuit":
        """Arbitrary 2x2 unitary."""
        self._ops.append(("1q", jnp.asarray(matrix, jnp.complex64), qubit))
        return self

    def cx(self, control: int, target: int) -> "Circuit":
        self._ops.append(("cx", control, target))
        return self

    def cx_ladder(self) -> "Circuit":
        """The reference's entangler: cx(i, i+1) for all i
        (``quantum.py:164-165``)."""
        for i in range(self.n_qubits - 1):
            self.cx(i, i + 1)
        return self

    def encode_rotations(self, vector) -> "Circuit":
        """The reference's data encoding (``quantum.py:158-161``):
        ry(v[i]·π) then rz(v[i]·π/2) on qubit i for the first
        min(len(v), n) NORMALIZED components."""
        v = np.asarray(vector, np.float64)
        norm = np.linalg.norm(v)
        if norm > 0:
            v = v / norm
        for i in range(min(len(v), self.n_qubits)):
            self.ry(float(v[i]) * math.pi, i)
            self.rz(float(v[i]) * math.pi / 2, i)
        return self

    # -- simulation ----------------------------------------------------

    def simulate(self, state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Statevector after the program; batched over leading dims of
        ``state`` when given ((..., 2**n); defaults to |0...0>)."""
        n = self.n_qubits
        if state is None:
            state = jnp.zeros((2 ** n,), jnp.complex64).at[0].set(1.0)
        for op in self._ops:
            if op[0] == "1q":
                _, u, q = op
                state = apply_1q_gate(state, u, q, n)
            else:
                _, c, t = op
                state = apply_cx(state, c, t, n)
        return state

    def probabilities(self, state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        psi = self.simulate(state)
        return jnp.abs(psi) ** 2

    def measure_probability(
        self, qubit: int, value: int = 1, state: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """P(measuring ``qubit`` = value)."""
        probs = self.probabilities(state)
        n = self.n_qubits
        idx = jnp.arange(2 ** n)
        mask = ((idx >> qubit) & 1) == value
        return jnp.sum(jnp.where(mask, probs, 0.0), axis=-1)
