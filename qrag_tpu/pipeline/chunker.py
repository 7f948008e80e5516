"""Text chunking for embedding ingestion.

Reproduces the chunking semantics of the reference's embedding tool
(``mcp/server/tools/fetch_embeddings.py:67-104``): ~4 chars per token,
chunks of at most ``max_tokens * 4`` characters, preferring to break at
a sentence end (``.``), then newline, then space, searched within the
last 500 characters of the window; chunks are stripped.  These exact
boundary rules are observable pipeline behavior (chunk counts determine
index row counts), so they are preserved including edge cases.
"""

from __future__ import annotations

from typing import List

BREAK_WINDOW = 500


def chunk_text(text: str, max_tokens: int = 8000) -> List[str]:
    """Split ``text`` into chunks of at most ``max_tokens * 4`` chars."""
    max_chars = max_tokens * 4
    if len(text) <= max_chars:
        return [text]

    chunks: List[str] = []
    start = 0
    while start < len(text):
        end = start + max_chars
        if end < len(text):
            lo = start + max_chars - BREAK_WINDOW
            break_point = text.rfind(".", lo, end)
            if break_point == -1:
                break_point = text.rfind("\n", lo, end)
            if break_point == -1:
                break_point = text.rfind(" ", lo, end)
            if break_point > start:
                end = break_point + 1
        chunks.append(text[start:end].strip())
        start = end
    return chunks
