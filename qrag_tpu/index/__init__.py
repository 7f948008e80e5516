from qrag_tpu.index.faiss_io import (
    FlatIndexData,
    read_flat_index,
    write_flat_index,
    append_flat_index,
    read_metadata,
    append_metadata,
    metadata_path_for,
)
from qrag_tpu.index.flat_index import DeviceFlatIndex, SearchResult

__all__ = [
    "FlatIndexData",
    "read_flat_index",
    "write_flat_index",
    "append_flat_index",
    "read_metadata",
    "append_metadata",
    "metadata_path_for",
    "DeviceFlatIndex",
    "SearchResult",
]
