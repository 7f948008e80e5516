from qrag_tpu.reranker.classical import ClassicalReranker
from qrag_tpu.reranker.quantum import QuantumReranker
from qrag_tpu.reranker.controller import RerankerController

__all__ = ["ClassicalReranker", "QuantumReranker", "RerankerController"]
