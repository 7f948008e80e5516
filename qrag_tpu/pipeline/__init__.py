from qrag_tpu.pipeline.chunker import chunk_text
from qrag_tpu.pipeline.embeddings import (
    MockEmbedder,
    HashEmbedder,
    OpenAIEmbedder,
    get_embedder,
)

__all__ = [
    "chunk_text",
    "MockEmbedder",
    "HashEmbedder",
    "OpenAIEmbedder",
    "get_embedder",
]
