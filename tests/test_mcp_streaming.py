"""MCP streamable-HTTP transport (VERDICT round-1 missing #1): SSE
framing, progress notifications during tools/call, JSON fallback,
session handshake — against the reference's FastMCP streamable app
surface (``mcp/server/server.py:34-51``)."""

import json
import urllib.request

import pytest

from qrag_tpu.config import EmbeddingConfig
from qrag_tpu.pipeline.storage import LocalTranscriptStore
from qrag_tpu.serving.mcp_client import McpClient
from qrag_tpu.serving.mcp_server import create_tool_service, serve_in_thread


@pytest.fixture()
def mcp_url(tmp_path):
    root = tmp_path / "transcripts"
    d = root / "My_Show" / "2024"
    d.mkdir(parents=True)
    for ep in ("one", "two", "three", "four"):
        (d / f"{ep}_transcript.json").write_text(
            json.dumps({"transcript": f"episode {ep} content " * 20})
        )
    service = create_tool_service(
        store=LocalTranscriptStore(str(root)),
        config=EmbeddingConfig(provider="hash", dim=16),
    )
    server = serve_in_thread(service)
    yield f"http://127.0.0.1:{server.server_address[1]}/mcp", str(tmp_path)
    server.shutdown()


def _raw_post(url, payload, accept):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json", "Accept": accept},
        method="POST",
    )
    return urllib.request.urlopen(req)


def _parse_sse(resp):
    """Return the list of decoded SSE data payloads, in order."""
    msgs, data_lines = [], []
    for raw in resp:
        line = raw.decode().rstrip("\r\n")
        if line.startswith("data:"):
            data_lines.append(line[5:].strip())
        elif not line and data_lines:
            msgs.append(json.loads("\n".join(data_lines)))
            data_lines = []
    return msgs


def test_sse_stream_with_progress(mcp_url):
    """A tools/call with Accept: text/event-stream and a progressToken
    streams notifications/progress BEFORE the final response."""
    url, tmp = mcp_url
    payload = {
        "jsonrpc": "2.0",
        "id": 42,
        "method": "tools/call",
        "params": {
            "name": "ProcessTranscriptsToEmbeddings",
            "arguments": {
                "show_name": "My_Show",
                "index_path": f"{tmp}/stream.faiss",
            },
            "_meta": {"progressToken": 42},
        },
    }
    resp = _raw_post(url, payload, "application/json, text/event-stream")
    assert "text/event-stream" in resp.headers.get("Content-Type", "")
    msgs = _parse_sse(resp)
    notes = [m for m in msgs if m.get("method") == "notifications/progress"]
    finals = [m for m in msgs if "id" in m]
    assert len(notes) >= 3, f"expected progressive notifications, got {msgs}"
    assert all(n["params"]["progressToken"] == 42 for n in notes)
    # progress is monotonically non-decreasing and precedes the result
    progs = [n["params"]["progress"] for n in notes]
    assert progs == sorted(progs)
    assert msgs[-1] is finals[-1]
    assert finals[-1]["id"] == 42
    result = finals[-1]["result"]
    assert not result["isError"]
    body = json.loads(result["content"][0]["text"])
    assert body["embeddings_created"] == 4


def test_sse_without_token_still_streams_response(mcp_url):
    url, _ = mcp_url
    payload = {
        "jsonrpc": "2.0",
        "id": 7,
        "method": "tools/list",
        "params": {},
    }
    resp = _raw_post(url, payload, "text/event-stream")
    assert "text/event-stream" in resp.headers.get("Content-Type", "")
    msgs = _parse_sse(resp)
    assert len(msgs) == 1 and msgs[0]["id"] == 7
    assert len(msgs[0]["result"]["tools"]) == 5


def test_json_fallback_unchanged(mcp_url):
    url, _ = mcp_url
    payload = {"jsonrpc": "2.0", "id": 1, "method": "ping", "params": {}}
    resp = _raw_post(url, payload, "application/json")
    assert "application/json" in resp.headers.get("Content-Type", "")
    assert json.loads(resp.read())["result"] == {}


def test_session_id_assigned_on_initialize(mcp_url):
    url, _ = mcp_url
    resp = _raw_post(
        url,
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
        "application/json",
    )
    sid = resp.headers.get("Mcp-Session-Id")
    assert sid and len(sid) == 32


def test_get_mcp_is_405(mcp_url):
    url, _ = mcp_url
    try:
        urllib.request.urlopen(url)
        raise AssertionError("expected 405")
    except urllib.error.HTTPError as e:
        assert e.code == 405


def test_client_surfaces_progress(mcp_url):
    url, tmp = mcp_url
    seen = []
    client = McpClient(
        url, stream=True, on_progress=lambda p, t, m: seen.append((p, t, m))
    )
    client.initialize()
    assert client.session_id  # captured from the handshake
    ok, payload = client.call_tool(
        "ProcessTranscriptsToEmbeddings",
        {"show_name": "My_Show", "index_path": f"{tmp}/cli.faiss"},
    )
    assert ok and payload["embeddings_created"] == 4
    assert len(seen) >= 3
    assert any("embedding" in (m or "") for _, _, m in seen)


def test_nonstream_client_against_streaming_server(mcp_url):
    url, _ = mcp_url
    client = McpClient(url, stream=False)
    ok, payload = client.call_tool("ReadFromS3", {})
    assert ok and payload["available_shows"] == ["My_Show"]


def test_streamed_dispatch_error_keeps_jsonrpc_contract(mcp_url):
    """A dispatch exception on the SSE arm must surface as a JSON-RPC
    error event, not an empty final message (regression)."""
    url, _ = mcp_url
    payload = {
        "jsonrpc": "2.0",
        "id": 9,
        "method": "tools/call",
        "params": ["not", "a", "dict"],  # params.get(...) will raise
    }
    resp = _raw_post(url, payload, "text/event-stream")
    msgs = _parse_sse(resp)
    final = msgs[-1]
    assert final["id"] == 9
    assert final["error"]["code"] == -32603
