"""Tool layer: registry, schemas, the four ingestion tools, pipeline
composition + fault contracts (SURVEY.md §2 components 5-12, §4.4)."""

import asyncio
import json
import os

import numpy as np
import pytest

from qrag_tpu.config import EmbeddingConfig
from qrag_tpu.index import faiss_io
from qrag_tpu.pipeline.storage import LocalTranscriptStore
from qrag_tpu.tools import (
    FetchEmbeddingsTool,
    ProcessTranscriptsToEmbeddingsTool,
    ReadFromS3Tool,
    StoreInFaissTool,
    ToolService,
    default_tools,
)
from qrag_tpu.tools.ingest_tools import extract_texts
from qrag_tpu.tools.interface import ToolResponse


def run(coro):
    return asyncio.run(coro)


@pytest.fixture()
def transcripts_dir(tmp_path):
    """A local store shaped like the reference's S3 layout:
    <show>/<subdir>/<episode>_transcript.json (>=3 path segments)."""
    root = tmp_path / "transcripts"
    for show, episodes in {
        "Piers_Morgan_Uncensored": ["ep1", "ep2"],
        "Other_Show": ["a"],
    }.items():
        d = root / show / "2024"
        d.mkdir(parents=True)
        for ep in episodes:
            (d / f"{ep}_transcript.json").write_text(
                json.dumps({"text": f"content of {show} {ep} " * 20})
            )
    return str(root)


@pytest.fixture()
def service(transcripts_dir):
    svc = ToolService()
    svc.register_tools(
        default_tools(
            store=LocalTranscriptStore(transcripts_dir),
            config=EmbeddingConfig(provider="hash", dim=64),
        )
    )
    return svc


# ------------------------------------------------------------------ registry


def test_registry_and_schemas(service):
    names = [t.name for t in service.tools]
    assert names == [
        "FetchEmbeddings",
        "ReadFromS3",
        "StoreInFaiss",
        "ProcessTranscriptsToEmbeddings",
        "SearchIndex",
    ]
    schema = service.tools[0].get_schema()
    assert schema["name"] == "FetchEmbeddings"
    assert "texts" in schema["input"]["properties"]


def test_unknown_tool_error(service):
    resp = service.execute_tool_sync("Nope", {})
    assert not resp.success
    assert "unknown tool" in resp.error
    assert resp.first_json()["available_tools"][0] == "FetchEmbeddings"


def test_input_validation_extra_field_rejected(service):
    resp = service.execute_tool_sync("FetchEmbeddings", {"texts": ["x"], "bogus": 1})
    assert not resp.success and "invalid input" in resp.error


def test_duplicate_registration_rejected(service):
    with pytest.raises(ValueError):
        service.register_tool(FetchEmbeddingsTool())


# --------------------------------------------------------------------- tools


def test_fetch_embeddings(service):
    resp = service.execute_tool_sync(
        "FetchEmbeddings", {"texts": ["hello", "world"]}
    )
    assert resp.success
    out = resp.first_json()
    assert out["count"] == 2 and out["dimension"] == 64
    v = np.asarray(out["embeddings"][0])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_fetch_embeddings_chunks_long_text(service):
    long_text = ("sentence one. " * 5000)  # > 32k chars → multiple chunks
    resp = service.execute_tool_sync("FetchEmbeddings", {"texts": [long_text]})
    assert resp.success
    assert resp.first_json()["count"] == 1  # chunk embeddings averaged


def test_read_lists_shows(service):
    resp = service.execute_tool_sync("ReadFromS3", {})
    out = resp.first_json()
    assert out["available_shows"] == ["Other_Show", "Piers_Morgan_Uncensored"]
    assert out["count"] == 0


def test_read_show_transcripts(service):
    resp = service.execute_tool_sync(
        "ReadFromS3", {"show_name": "Piers_Morgan_Uncensored"}
    )
    out = resp.first_json()
    assert out["count"] == 2
    t = out["transcripts"][0]
    assert set(t) == {"show_name", "episode_id", "file_path", "data"}
    assert t["episode_id"].startswith("ep")


def test_read_unknown_show_error_with_available(service):
    resp = service.execute_tool_sync("ReadFromS3", {"show_name": "nope"})
    assert not resp.success
    assert "available_shows" in (resp.first_json() or {})


def test_store_in_faiss_append(tmp_path, service, rng):
    path = str(tmp_path / "t.faiss")
    embs = rng.randn(3, 16).astype(np.float32).tolist()
    r1 = service.execute_tool_sync(
        "StoreInFaiss",
        {"embeddings": embs, "index_path": path, "metadata": ["a", "b", "c"]},
    )
    assert r1.success and r1.first_json()["total_vectors"] == 3
    r2 = service.execute_tool_sync(
        "StoreInFaiss", {"embeddings": embs[:1], "index_path": path}
    )
    assert r2.first_json()["total_vectors"] == 4
    assert faiss_io.read_metadata(path) == ["a", "b", "c"]


def test_store_dimension_mismatch_error(tmp_path, service, rng):
    path = str(tmp_path / "t.faiss")
    service.execute_tool_sync(
        "StoreInFaiss",
        {"embeddings": rng.randn(2, 8).tolist(), "index_path": path},
    )
    resp = service.execute_tool_sync(
        "StoreInFaiss",
        {"embeddings": rng.randn(2, 16).tolist(), "index_path": path},
    )
    assert not resp.success and "dimension mismatch" in resp.error


def test_metadata_length_mismatch_error(tmp_path, service, rng):
    resp = service.execute_tool_sync(
        "StoreInFaiss",
        {
            "embeddings": rng.randn(2, 8).tolist(),
            "index_path": str(tmp_path / "x.faiss"),
            "metadata": ["only-one"],
        },
    )
    assert not resp.success


# ------------------------------------------------------------------ pipeline


def test_process_pipeline_end_to_end(tmp_path, service):
    path = str(tmp_path / "pipe.faiss")
    resp = service.execute_tool_sync(
        "ProcessTranscriptsToEmbeddings",
        {"show_name": "Piers_Morgan_Uncensored", "index_path": path},
    )
    assert resp.success, resp.error
    out = resp.first_json()
    assert out["transcripts_processed"] == 2
    assert out["embeddings_created"] == 2
    assert out["total_vectors"] == 2
    # artifact is loadable by the index layer
    data = faiss_io.read_flat_index(path)
    assert data.ntotal == 2 and data.metric == "l2"
    meta = faiss_io.read_metadata(path)
    assert meta[0].startswith("Piers_Morgan_Uncensored/ep")


def test_process_case_insensitive_retry(tmp_path, service):
    resp = service.execute_tool_sync(
        "ProcessTranscriptsToEmbeddings",
        {
            "show_name": "piers_morgan_uncensored",  # wrong case
            "index_path": str(tmp_path / "c.faiss"),
        },
    )
    assert resp.success
    assert resp.first_json()["show_name"] == "Piers_Morgan_Uncensored"


def test_process_unknown_show(tmp_path, service):
    resp = service.execute_tool_sync(
        "ProcessTranscriptsToEmbeddings",
        {"show_name": "does-not-exist", "index_path": str(tmp_path / "n.faiss")},
    )
    assert not resp.success
    assert "available_shows" in (resp.first_json() or {})


def test_process_max_transcripts(tmp_path, service):
    resp = service.execute_tool_sync(
        "ProcessTranscriptsToEmbeddings",
        {
            "show_name": "Piers_Morgan_Uncensored",
            "index_path": str(tmp_path / "m.faiss"),
            "max_transcripts": 1,
        },
    )
    assert resp.first_json()["transcripts_processed"] == 1


def test_extract_texts_payload_shapes():
    ts = [
        {"data": "plain string"},
        {"data": {"text": "from text key"}},
        {"data": {"transcript": "from transcript key"}},
        {"data": {"content": "from content key"}},
        {"data": ["list", "of", "strings"]},
        {"data": {"unrelated": 1}},  # dropped
        {"data": 42},  # dropped
    ]
    texts, sources = extract_texts(ts)
    assert texts == [
        "plain string",
        "from text key",
        "from transcript key",
        "from content key",
        "list\nof\nstrings",
    ]
    assert sources == [0, 1, 2, 3, 4]  # positions 5, 6 were skipped


def test_pipeline_metadata_alignment_with_skips(tmp_path):
    """Un-extractable transcripts must not shift metadata onto the
    wrong vectors (review finding: skipped entries misaligned labels)."""
    import asyncio

    from qrag_tpu.config import EmbeddingConfig
    from qrag_tpu.tools.ingest_tools import (
        ProcessTranscriptsInput,
        ProcessTranscriptsToEmbeddingsTool,
    )

    class FakeStore:
        def list_shows(self):
            return ["S"]

        def read_show(self, show):
            return [
                {"show_name": "S", "episode_id": "bad", "file_path": "x",
                 "data": 42},  # un-extractable -> skipped
                {"show_name": "S", "episode_id": "good1", "file_path": "y",
                 "data": "text one"},
                {"show_name": "S", "episode_id": "good2", "file_path": "z",
                 "data": {"text": "text two"}},
            ]

    tool = ProcessTranscriptsToEmbeddingsTool(
        store=FakeStore(), config=EmbeddingConfig(provider="hash", dim=16)
    )
    path = str(tmp_path / "a.faiss")
    resp = asyncio.run(
        tool.execute(ProcessTranscriptsInput(show_name="S", index_path=path))
    )
    assert resp.success, resp.error
    meta = faiss_io.read_metadata(path)
    assert meta == ["S/good1", "S/good2"]  # NOT ["S/bad", "S/good1"]


def test_search_index_tool(tmp_path, service):
    """SearchIndex closes the retrieval gap (SURVEY.md §0 gap 1):
    ingest a show, then search it through the tool registry."""
    path = str(tmp_path / "s.faiss")
    r = service.execute_tool_sync(
        "ProcessTranscriptsToEmbeddings",
        {"show_name": "Piers_Morgan_Uncensored", "index_path": path},
    )
    assert r.success
    out = service.execute_tool_sync(
        "SearchIndex",
        {"index_path": path, "query": "content of Piers_Morgan_Uncensored ep2 " * 20, "k": 2},
    )
    assert out.success, out.error
    payload = out.first_json()
    assert payload["count"] == 2
    assert payload["hits"][0]["metadata"].startswith("Piers_Morgan_Uncensored/ep2")
    # reranked variant
    out2 = service.execute_tool_sync(
        "SearchIndex", {"index_path": path, "query": "anything", "k": 1, "rerank": True}
    )
    assert out2.success and out2.first_json()["reranked"]


def test_search_index_tool_errors(tmp_path, service):
    out = service.execute_tool_sync(
        "SearchIndex", {"index_path": str(tmp_path / "none.faiss"), "query": "x"}
    )
    assert not out.success and "not found" in out.error
    # embedding dim mismatch
    path = str(tmp_path / "d.faiss")
    service.execute_tool_sync(
        "ProcessTranscriptsToEmbeddings",
        {"show_name": "Other_Show", "index_path": path},
    )
    out = service.execute_tool_sync(
        "SearchIndex", {"index_path": path, "embedding": [0.1, 0.2]}
    )
    assert not out.success and "dim" in out.error


def test_fetch_embeddings_skip_on_error_reports_indices():
    """A text whose every chunk fails embeds nothing and is reported in
    skipped_indices (fetch_embeddings.py:153-155 skip contract)."""

    class FlakyEmbedder:
        dim = 8

        def __call__(self, texts):
            if any("poison" in t for t in texts):
                raise RuntimeError("embed failure")
            return np.ones((len(texts), 8), np.float32)

    tool = FetchEmbeddingsTool(embedder=FlakyEmbedder())
    resp = tool_run(tool, {"texts": ["ok one", "poison text", "ok two"]})
    assert resp.success
    out = resp.first_json()
    assert out["count"] == 2
    assert out["skipped_indices"] == [1]


def tool_run(tool, args):
    return asyncio.run(tool.execute(tool.input_model(**args)))


def test_openai_embedder_gated_error():
    from qrag_tpu.pipeline.embeddings import OpenAIEmbedder

    emb = OpenAIEmbedder()
    with pytest.raises(RuntimeError, match="openai|API key"):
        emb(["text"])


def test_unknown_provider_error():
    from qrag_tpu.pipeline.embeddings import get_embedder

    with pytest.raises(ValueError, match="unknown embedding provider"):
        get_embedder(EmbeddingConfig(provider="bogus"))


def test_tool_response_helpers():
    from pydantic import BaseModel

    class Out(BaseModel):
        a: int

    r = ToolResponse.from_model(Out(a=3))
    assert r.success and r.first_json() == {"a": 3}
    t = ToolResponse.from_text("hello")
    assert t.content[0].type == "text" and t.first_json() is None
    e = ToolResponse.from_error("bad", hint="x")
    assert not e.success and e.first_json() == {"hint": "x"}
