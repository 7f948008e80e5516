from qrag_tpu.tools.interface import (
    BaseToolInput,
    Tool,
    ToolContent,
    ToolResponse,
)
from qrag_tpu.tools.service import ToolService
from qrag_tpu.tools.ingest_tools import (
    FetchEmbeddingsTool,
    ProcessTranscriptsToEmbeddingsTool,
    ReadFromS3Tool,
    StoreInFaissTool,
    default_tools,
)

__all__ = [
    "BaseToolInput",
    "Tool",
    "ToolContent",
    "ToolResponse",
    "ToolService",
    "FetchEmbeddingsTool",
    "ReadFromS3Tool",
    "StoreInFaissTool",
    "ProcessTranscriptsToEmbeddingsTool",
    "default_tools",
]
