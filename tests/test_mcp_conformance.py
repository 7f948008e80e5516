"""MCP wire conformance against the golden transcript
(tests/fixtures/mcp_golden.json) — VERDICT r3 weak/missing #2: the
from-scratch streamable-HTTP transport was only ever tested against
its own client; these fixtures pin the observable wire format
(initialize capability shape, tools/list entries, tools/call result
shape, JSON-RPC error codes, SSE event framing, session header) to the
2024-11-05 spec shapes so third-party interop is evidence, not
inference.  Any shape drift FAILS here."""

import http.client
import json
import os
import re

import pytest

from qrag_tpu.config import EmbeddingConfig
from qrag_tpu.pipeline.storage import LocalTranscriptStore
from qrag_tpu.serving.mcp_server import create_tool_service, serve_in_thread

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "mcp_golden.json")
_HEX32 = re.compile(r"^[0-9a-f]{32}$")


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("transcripts")
    d = root / "My_Show" / "2024"
    d.mkdir(parents=True)
    for ep in ("one", "two"):
        (d / f"{ep}_transcript.json").write_text(
            json.dumps({"transcript": f"episode {ep} talks about things " * 8})
        )
    service = create_tool_service(
        store=LocalTranscriptStore(str(root)),
        config=EmbeddingConfig(provider="hash", dim=32),
    )
    srv = serve_in_thread(service)
    yield srv.server_address
    srv.shutdown()


def _post(addr, body: bytes, headers=None):
    conn = http.client.HTTPConnection(*addr, timeout=30)
    h = {"Content-Type": "application/json"}
    h.update(headers or {})
    conn.request("POST", "/mcp", body=body, headers=h)
    resp = conn.getresponse()
    data = resp.read()
    out = (resp.status, dict(resp.getheaders()), data)
    conn.close()
    return out


def _match(expected, actual, path="$"):
    """Exact-match with placeholders: '<ANY>' matches anything,
    '<HEX32>' a 32-char hex string, '<SCHEMA>' a JSON-schema-ish
    object.  Everything else must be EQUAL — extra or missing dict
    keys fail (shape drift is the thing being detected)."""
    if expected == "<ANY>":
        return
    if expected == "<HEX32>":
        assert isinstance(actual, str) and _HEX32.match(actual), (
            f"{path}: expected 32-hex, got {actual!r}"
        )
        return
    if expected == "<SCHEMA>":
        assert isinstance(actual, dict) and "properties" in actual, (
            f"{path}: expected a JSON schema object, got {actual!r}"
        )
        return
    if isinstance(expected, dict):
        assert isinstance(actual, dict), f"{path}: expected object"
        assert set(expected) == set(actual), (
            f"{path}: key drift — expected {sorted(expected)}, "
            f"got {sorted(actual)}"
        )
        for k in expected:
            _match(expected[k], actual[k], f"{path}.{k}")
        return
    if isinstance(expected, list):
        assert isinstance(actual, list) and len(expected) == len(actual), (
            f"{path}: length {len(actual)} != {len(expected)}"
        )
        for i, (e, a) in enumerate(zip(expected, actual)):
            _match(e, a, f"{path}[{i}]")
        return
    assert expected == actual, f"{path}: {actual!r} != {expected!r}"


def test_golden_exchanges(server, golden):
    for ex in golden["exchanges"]:
        status, headers, data = _post(
            server, json.dumps(ex["request"]).encode()
        )
        assert status == 200, f"{ex['name']}: HTTP {status}"
        body = json.loads(data)
        _match(ex["response"], body, f"$({ex['name']})")
        for hk, hv in (ex.get("response_headers") or {}).items():
            got = headers.get(hk)
            assert got is not None, f"{ex['name']}: missing header {hk}"
            _match(hv, got if hk != "Content-Type" else got.split(";")[0])


def test_parse_error_contract(server, golden):
    spec = golden["parse_error"]
    status, _, data = _post(server, spec["raw_request_body"].encode())
    assert status == spec["response_status"]
    _match(spec["response"], json.loads(data))


def test_http_transport_contract(server, golden):
    spec = golden["http"]
    conn = http.client.HTTPConnection(*server, timeout=30)
    conn.request("GET", "/mcp")
    r = conn.getresponse()
    r.read()
    assert r.status == spec["get_mcp_status"]
    assert r.getheader("Allow") == spec["get_mcp_allow"]
    conn.close()
    conn = http.client.HTTPConnection(*server, timeout=30)
    conn.request("OPTIONS", "/mcp")
    r = conn.getresponse()
    r.read()
    assert r.status == spec["options_status"]
    assert (
        r.getheader("Access-Control-Allow-Origin")
        == spec["cors_allow_origin"]
    )
    conn.close()


def test_sse_framing_contract(server, golden):
    """Raw SSE bytes: Content-Type, per-event framing
    'event: message\\r\\ndata: <json>\\r\\n\\r\\n', progress
    notifications (valid JSON-RPC notifications, token echoed,
    monotone progress), final event = the JSON-RPC response."""
    spec = golden["sse"]
    import tempfile

    tmp = tempfile.mkdtemp(prefix="mcp_golden_")
    req_body = json.dumps(spec["request"]).replace("<TMPDIR>", tmp)
    conn = http.client.HTTPConnection(*server, timeout=60)
    conn.request(
        "POST",
        "/mcp",
        body=req_body.encode(),
        headers={
            "Content-Type": "application/json",
            "Accept": "text/event-stream",
        },
    )
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    raw = resp.read()  # http.client de-chunks
    conn.close()
    # frame grammar: every event is exactly 'event: <name>\r\ndata: ...'
    frames = [f for f in raw.split(b"\r\n\r\n") if f]
    events = []
    for fr in frames:
        lines = fr.split(b"\r\n")
        assert lines[0] == f"event: {spec['event_name']}".encode(), lines[0]
        assert lines[1].startswith(b"data: ")
        events.append(json.loads(lines[1][len(b"data: "):]))
    assert len(events) >= spec["min_progress_events"] + 1
    token = spec["request"]["params"]["_meta"]["progressToken"]
    last = -1.0
    for note in events[:-1]:
        assert note["jsonrpc"] == "2.0"
        assert note["method"] == "notifications/progress"
        assert "id" not in note  # notifications carry no id
        p = note["params"]
        assert p["progressToken"] == token
        assert p["progress"] >= last
        last = p["progress"]
    _match(spec["final_response"], events[-1], "$final")


def test_sse_initialize_session_header(server):
    conn = http.client.HTTPConnection(*server, timeout=30)
    conn.request(
        "POST",
        "/mcp",
        body=json.dumps(
            {"jsonrpc": "2.0", "id": 0, "method": "initialize", "params": {}}
        ).encode(),
        headers={
            "Content-Type": "application/json",
            "Accept": "text/event-stream",
        },
    )
    resp = conn.getresponse()
    sid = resp.getheader("Mcp-Session-Id")
    assert sid and _HEX32.match(sid)
    body = resp.read()
    conn.close()
    final = json.loads(
        [f for f in body.split(b"\r\n\r\n") if f][-1].split(b"\r\n")[1][6:]
    )
    assert final["result"]["protocolVersion"] == "2024-11-05"
