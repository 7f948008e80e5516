"""Document model for retrieval and reranking.

Mirrors the semantics of the reference's ``Document`` class
(``src/reranker/classical.py:29-42``): id, content, optional source and
metadata dict — but as a frozen-ish dataclass with an explicit
JSON-serializable schema (the reference returned raw objects through the
API and relied on FastAPI's ``__dict__`` serialization; SURVEY.md
Appendix A.3 drops that quirk).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional


@dataclass
class Document:
    """A retrievable/rerankable document."""

    id: str
    content: str
    source: Optional[str] = None
    metadata: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "id": self.id,
            "content": self.content,
            "source": self.source,
            "metadata": self.metadata,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Document":
        return cls(
            id=str(d["id"]),
            content=str(d["content"]),
            source=d.get("source"),
            metadata=dict(d.get("metadata") or {}),
        )


def validate_documents(query: str, documents) -> bool:
    """Input validation mirroring ``classical.py:169-187``.

    Returns False (rather than raising) on invalid input; callers fall
    back to neutral scoring, preserving the reference's
    graceful-degradation contract.
    """
    if not isinstance(query, str) or not query.strip():
        return False
    if not isinstance(documents, list) or not documents:
        return False
    for doc in documents:
        if not isinstance(doc, Document):
            return False
        if not doc.content:
            return False
    return True
