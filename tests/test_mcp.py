"""MCP server + client round-trip over real HTTP (SURVEY.md components
7 and 13)."""

import json

import pytest

from qrag_tpu.config import EmbeddingConfig
from qrag_tpu.pipeline.storage import LocalTranscriptStore
from qrag_tpu.serving.mcp_client import McpClient, RuleBasedOrchestrator
from qrag_tpu.serving.mcp_server import create_tool_service, serve_in_thread


@pytest.fixture()
def mcp_setup(tmp_path):
    root = tmp_path / "transcripts"
    d = root / "My_Show" / "2024"
    d.mkdir(parents=True)
    for ep in ("one", "two", "three"):
        (d / f"{ep}_transcript.json").write_text(
            json.dumps({"transcript": f"episode {ep} talks about things " * 10})
        )
    service = create_tool_service(
        store=LocalTranscriptStore(str(root)),
        config=EmbeddingConfig(provider="hash", dim=32),
    )
    server = serve_in_thread(service)
    url = f"http://127.0.0.1:{server.server_address[1]}/mcp"
    yield McpClient(url), str(tmp_path)
    server.shutdown()


def test_initialize(mcp_setup):
    client, _ = mcp_setup
    info = client.initialize()
    assert info["serverInfo"]["name"] == "qrag-mcp-server"
    assert "tools" in info["capabilities"]


def test_tools_list(mcp_setup):
    client, _ = mcp_setup
    tools = client.list_tools()
    names = [t["name"] for t in tools]
    assert names == [
        "FetchEmbeddings",
        "ReadFromS3",
        "StoreInFaiss",
        "ProcessTranscriptsToEmbeddings",
        "SearchIndex",
    ]
    assert "properties" in tools[0]["inputSchema"]


def test_tools_call_roundtrip(mcp_setup):
    client, _ = mcp_setup
    ok, payload = client.call_tool("ReadFromS3", {})
    assert ok and payload["available_shows"] == ["My_Show"]


def test_tools_call_error_payload(mcp_setup):
    client, _ = mcp_setup
    ok, payload = client.call_tool("ReadFromS3", {"show_name": "ghost"})
    assert not ok
    assert "error" in payload
    assert payload["available_shows"] == ["My_Show"]


def test_unknown_method(mcp_setup):
    client, _ = mcp_setup
    with pytest.raises(RuntimeError, match="method not found"):
        client._rpc("bogus/method")


def test_orchestrator_list_shows(mcp_setup):
    client, _ = mcp_setup
    orch = RuleBasedOrchestrator(client)
    assert "My_Show" in orch.run("list shows")


def test_orchestrator_index_show_with_fuzzy_retry(mcp_setup):
    client, tmp = mcp_setup
    orch = RuleBasedOrchestrator(client, index_path=f"{tmp}/o.faiss")
    # wrong case + underscores as spaces — error-driven retry fixes it
    out = orch.run("index my show")
    assert "Indexed show 'My_Show'" in out
    assert "3 embeddings" in out
    from qrag_tpu.index import faiss_io

    assert faiss_io.read_flat_index(f"{tmp}/o.faiss").ntotal == 3


def test_orchestrator_unknown_intent(mcp_setup):
    client, _ = mcp_setup
    out = RuleBasedOrchestrator(client).run("make me a sandwich")
    assert "list shows" in out


def test_full_loop_ingest_then_serve(mcp_setup):
    """Ingest via MCP, then load the produced artifact into the engine
    and query it — the full reference workflow, end to end."""
    import numpy as np

    client, tmp = mcp_setup
    ok, payload = client.call_tool(
        "ProcessTranscriptsToEmbeddings",
        {"show_name": "My_Show", "index_path": f"{tmp}/full.faiss"},
    )
    assert ok
    from qrag_tpu.config import QragConfig
    from qrag_tpu.engine import QragEngine

    eng = QragEngine.from_faiss(
        f"{tmp}/full.faiss",
        config=QragConfig.from_dict({"embedding": {"provider": "hash", "dim": 32}}),
    )
    res = eng.search("episode two talks about things " * 10, k=1)
    assert res.metadata[0][0] == "My_Show/two_transcript"


def test_orchestrator_preserves_path_case(mcp_setup):
    """Review regression: the index path must keep its casing."""
    client, tmp = mcp_setup
    orch = RuleBasedOrchestrator(client)
    out = orch.run(f"index My_Show into {tmp}/CamelCase.faiss")
    assert "Indexed show" in out
    import os

    assert os.path.exists(f"{tmp}/CamelCase.faiss")
    assert not os.path.exists(f"{tmp}/camelcase.faiss")


def test_resources_and_prompts_stubs(mcp_setup):
    client, _ = mcp_setup
    assert client._rpc("resources/list") == {"resources": []}
    assert client._rpc("prompts/list") == {"prompts": []}


def test_orchestrator_search_intent(mcp_setup):
    client, tmp = mcp_setup
    orch = RuleBasedOrchestrator(client, index_path=f"{tmp}/s.faiss")
    orch.run("index My_Show")
    out = orch.run("search episode two talks in " + f"{tmp}/s.faiss")
    assert "Top" in out and "My_Show/two_transcript" in out
