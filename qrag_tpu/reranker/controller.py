"""Quantum-vs-classical routing controller.

Preserves the reference's observable routing semantics exactly
(``src/reranker/controller.py:42-67``): a query routes to "quantum"
iff its word count exceeds ``complexity_threshold`` (default 8) OR any
lower-cased whitespace-token *contains* one of the 10 ad keywords as a
substring (so "add" fires on "ad" — documented quirk, SURVEY.md
Appendix A.7).

The response shape matches ``controller.py:100-104``
(``{"documents": [(Document, score), ...], "reranker_used", "query"}``)
with an additional explicit JSON schema via ``rerank_response_dict``
(the reference leaked raw Document objects through FastAPI; A.3).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from qrag_tpu.config import ControllerConfig, QragConfig
from qrag_tpu.documents import Document
from qrag_tpu.reranker.classical import ClassicalReranker
from qrag_tpu.reranker.quantum import QuantumReranker


class RerankerController:
    """Routes queries between the quantum and classical rerankers."""

    def __init__(
        self,
        config: Optional[QragConfig] = None,
        classical: Optional[ClassicalReranker] = None,
        quantum: Optional[QuantumReranker] = None,
    ):
        self.config = config or QragConfig()
        self.controller_config: ControllerConfig = self.config.controller
        self.classical_reranker = classical or ClassicalReranker(
            self.config.classical
        )
        # share one classical fallback instance (drop the reference's
        # double CrossEncoder construction; SURVEY.md A.2)
        self.quantum_reranker = quantum or QuantumReranker(
            self.config.quantum, classical_fallback=self.classical_reranker
        )

    def select_reranker(self, query: str) -> str:
        """Routing truth table of ``controller.py:42-67``."""
        words = query.lower().split()
        complexity = len(words)
        keyword_matches = sum(
            1
            for word in words
            if any(kw in word for kw in self.controller_config.quantum_keywords)
        )
        if (
            complexity > self.controller_config.complexity_threshold
            or keyword_matches > 0
        ):
            return "quantum"
        return "classical"

    def rerank(
        self,
        query: str,
        documents: List[Document],
        top_k: Optional[int] = None,
        reranker_type: str = "auto",
    ) -> Dict[str, Any]:
        if reranker_type == "auto":
            selected = self.select_reranker(query)
        else:
            selected = reranker_type

        if selected == "quantum":
            reranked = self.quantum_reranker.rerank(query, documents, top_k)
            used = "quantum"
        else:
            reranked = self.classical_reranker.rerank(query, documents, top_k)
            used = "classical"

        return {
            "documents": reranked,
            "reranker_used": used,
            "query": query,
        }


def rerank_response_dict(result: Dict[str, Any]) -> Dict[str, Any]:
    """Explicit JSON-serializable response schema."""
    return {
        "documents": [
            {"document": doc.to_dict(), "score": float(score)}
            for doc, score in result["documents"]
        ],
        "reranker_used": result["reranker_used"],
        "query": result["query"],
    }
