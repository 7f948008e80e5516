"""Execute the image-gated production paths with fakes (VERDICT r2 #6).

The three modules that need openai/boto3 run against stub modules
installed in sys.modules, exercising the exact semantics the
reference defines:

  * OpenAIOrchestrator — full tool loop with the unknown-show
    error-driven retry (``/root/reference/mcp/client/main.py:194-217``)
  * S3TranscriptStore — SSM bucket lookup + paginated scan + the
    >=3-segment "*transcript*.json" key filter + per-key
    skip-on-error (``read_from_s3.py:86-163``)
  * OpenAIEmbedder — SSM key lookup, chunk-and-average happy path,
    per-chunk skip-on-error (``fetch_embeddings.py:115-165``)
"""

import json
import sys
import types

import numpy as np
import pytest

# --------------------------------------------------------------- fakes


class _FakeBody:
    def __init__(self, payload: bytes):
        self._payload = payload

    def read(self) -> bytes:
        return self._payload


class FakeS3:
    """Paginated bucket with a deliberately messy key set."""

    def __init__(self, objects, pages=2):
        self.objects = objects  # key -> bytes (None => get_object raises)
        self.pages = pages
        self.get_calls = []

    def get_paginator(self, op):
        assert op == "list_objects_v2"
        objects, pages = self.objects, self.pages

        class _Paginator:
            def paginate(self, Bucket):
                keys = sorted(objects)
                per = max(1, -(-len(keys) // pages))
                for i in range(0, len(keys), per):
                    yield {
                        "Contents": [
                            {"Key": k} for k in keys[i : i + per]
                        ]
                    }

        return _Paginator()

    def get_object(self, Bucket, Key):
        self.get_calls.append(Key)
        payload = self.objects[Key]
        if payload is None:
            raise RuntimeError("simulated S3 GET failure")
        return {"Body": _FakeBody(payload)}


class FakeSSM:
    def __init__(self, params):
        self.params = params
        self.calls = []

    def get_parameter(self, Name, WithDecryption=False):
        self.calls.append((Name, WithDecryption))
        return {"Parameter": {"Value": self.params[Name]}}


def _install_fake_boto3(monkeypatch, s3, ssm):
    boto3 = types.ModuleType("boto3")

    def client(kind):
        return {"s3": s3, "ssm": ssm}[kind]

    boto3.client = client
    monkeypatch.setitem(sys.modules, "boto3", boto3)
    return boto3


class FakeChatCompletions:
    """Scripted LLM: returns the next canned JSON each call."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []  # messages snapshots

    def create(self, model, messages, response_format=None):
        assert response_format == {"type": "json_object"}
        self.calls.append([dict(m) for m in messages])
        content = json.dumps(self.script.pop(0))
        msg = types.SimpleNamespace(content=content)
        choice = types.SimpleNamespace(message=msg)
        return types.SimpleNamespace(choices=[choice])


def _install_fake_openai(monkeypatch, script=None, embed_fn=None):
    openai_mod = types.ModuleType("openai")
    chat_api = FakeChatCompletions(script or [])
    created = {}

    class OpenAI:
        def __init__(self, api_key=None):
            created["api_key"] = api_key
            self.chat = types.SimpleNamespace(completions=chat_api)

            class _Embeddings:
                def create(self, model, input):
                    vec = embed_fn(input)
                    data = [types.SimpleNamespace(embedding=vec)]
                    return types.SimpleNamespace(data=data)

            self.embeddings = _Embeddings()

    openai_mod.OpenAI = OpenAI
    monkeypatch.setitem(sys.modules, "openai", openai_mod)
    return chat_api, created


# --------------------------------------------------- S3TranscriptStore


TRANSCRIPTS = {
    # valid: >=3 segments, .json, contains "transcript"
    "ShowA/ep1/transcript_part1.json": json.dumps({"text": "alpha"}).encode(),
    "ShowA/ep2/transcript.json": json.dumps({"text": "beta"}).encode(),
    "ShowB/x/y/episode_transcript.json": json.dumps({"text": "gamma"}).encode(),
    # filtered out: only 2 segments
    "ShowC/transcript.json": json.dumps({"text": "nope"}).encode(),
    # filtered out: not .json
    "ShowA/ep3/transcript.txt": b"nope",
    # filtered out: no "transcript" in key
    "ShowA/ep4/notes.json": json.dumps({"text": "nope"}).encode(),
    # valid key but the GET fails -> per-key skip
    "ShowA/ep5/transcript_broken.json": None,
}


def test_s3_store_ssm_bucket_and_key_filter(monkeypatch):
    from qrag_tpu.pipeline.storage import S3TranscriptStore

    s3 = FakeS3(TRANSCRIPTS, pages=3)
    ssm = FakeSSM({"/app/app_storage_bucket": "my-bucket"})
    _install_fake_boto3(monkeypatch, s3, ssm)

    store = S3TranscriptStore()  # bucket resolved via SSM
    assert store.bucket == "my-bucket"
    assert ssm.calls == [("/app/app_storage_bucket", False)]
    # show list: first segment of every valid transcript key, in order
    assert store.list_shows() == ["ShowA", "ShowB"]


def test_s3_store_read_show_pagination_and_skip(monkeypatch):
    from qrag_tpu.pipeline.storage import S3TranscriptStore

    s3 = FakeS3(TRANSCRIPTS, pages=4)  # forces multiple pages
    ssm = FakeSSM({})
    _install_fake_boto3(monkeypatch, s3, ssm)

    store = S3TranscriptStore(bucket="direct-bucket")  # no SSM call
    assert ssm.calls == []
    records = store.read_show("ShowA")
    # broken GET skipped; filtered keys never fetched
    assert [r["episode_id"] for r in records] == [
        "transcript_part1", "transcript"
    ]
    assert records[0]["data"] == {"text": "alpha"}
    assert records[0]["show_name"] == "ShowA"
    assert records[0]["file_path"] == "ShowA/ep1/transcript_part1.json"
    # only transcript-filtered keys under the show prefix were GET'd
    assert set(s3.get_calls) == {
        "ShowA/ep1/transcript_part1.json",
        "ShowA/ep2/transcript.json",
        "ShowA/ep5/transcript_broken.json",
    }


def test_get_store_s3_kind(monkeypatch):
    from qrag_tpu.pipeline import storage

    s3 = FakeS3(TRANSCRIPTS)
    _install_fake_boto3(monkeypatch, s3, FakeSSM({}))
    store = storage.get_store("s3", bucket="b")
    assert isinstance(store, storage.S3TranscriptStore)


# ------------------------------------------------------ OpenAIEmbedder


def test_openai_embedder_chunk_average(monkeypatch):
    """Happy path: long text chunks, one API call per chunk, mean of
    chunk embeddings, unit-normalized (fetch_embeddings.py:139-155)."""
    from qrag_tpu.config import EmbeddingConfig
    from qrag_tpu.pipeline.embeddings import OpenAIEmbedder
    from qrag_tpu.pipeline.chunker import chunk_text

    calls = []

    def embed_fn(chunk):
        calls.append(chunk)
        # orthogonal unit vectors per call: the mean is easy to verify
        v = np.zeros(8, np.float32)
        v[len(calls) - 1] = 1.0
        return v.tolist()

    _, created = _install_fake_openai(monkeypatch, embed_fn=embed_fn)
    monkeypatch.setenv("OPENAI_API_KEY", "env-key")

    cfg = EmbeddingConfig(provider="openai", dim=8, max_tokens_per_chunk=10)
    embedder = OpenAIEmbedder(cfg)
    text = "sentence one. " * 20  # ~280 chars -> multiple 40-char chunks
    n_chunks = len(chunk_text(text, 10))
    assert n_chunks > 1
    out = embedder([text])
    assert created["api_key"] == "env-key"
    assert len(calls) == n_chunks  # one API call per chunk
    assert out.shape == (1, 8)
    # mean of the first n_chunks one-hots, normalized
    want = np.zeros(8, np.float32)
    want[:n_chunks] = 1.0 / n_chunks
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(out[0], want, rtol=1e-6)


def test_openai_embedder_chunk_skip_and_all_fail(monkeypatch):
    from qrag_tpu.config import EmbeddingConfig
    from qrag_tpu.pipeline.embeddings import OpenAIEmbedder

    n = {"calls": 0}

    def embed_fn(chunk):
        n["calls"] += 1
        if n["calls"] % 2 == 0:
            raise RuntimeError("simulated API failure")
        return [1.0, 0.0, 0.0, 0.0]

    _install_fake_openai(monkeypatch, embed_fn=embed_fn)
    monkeypatch.setenv("OPENAI_API_KEY", "k")
    cfg = EmbeddingConfig(provider="openai", dim=4, max_tokens_per_chunk=10)
    embedder = OpenAIEmbedder(cfg)
    out = embedder(["aaaa. " * 30])  # several chunks, every 2nd fails
    assert out.shape == (1, 4)
    np.testing.assert_allclose(out[0], [1, 0, 0, 0], rtol=1e-6)

    # ALL chunks failing -> zero vector (skip-on-error contract)
    def always_fail(chunk):
        raise RuntimeError("down")

    _install_fake_openai(monkeypatch, embed_fn=always_fail)
    embedder2 = OpenAIEmbedder(cfg)
    out2 = embedder2(["text"])
    np.testing.assert_array_equal(out2, np.zeros((1, 4), np.float32))


def test_openai_embedder_ssm_key_lookup(monkeypatch):
    from qrag_tpu.config import EmbeddingConfig
    from qrag_tpu.pipeline.embeddings import OpenAIEmbedder

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    ssm = FakeSSM({"/openai/api_key": "ssm-secret"})
    _install_fake_boto3(monkeypatch, FakeS3({}), ssm)
    _, created = _install_fake_openai(
        monkeypatch, embed_fn=lambda c: [1.0, 0.0]
    )
    embedder = OpenAIEmbedder(EmbeddingConfig(provider="openai", dim=2))
    out = embedder(["hi"])
    assert created["api_key"] == "ssm-secret"
    assert ssm.calls == [("/openai/api_key", True)]  # WithDecryption
    assert out.shape == (1, 2)


# --------------------------------------------------- OpenAIOrchestrator


class FakeMcpClient:
    """Tool surface with the reference's unknown-show error payload
    (error + available_shows; main.py:194-217 feeds it back)."""

    def __init__(self):
        self.calls = []

    def list_tools(self):
        return [
            {"name": "process_transcripts", "description": "ingest a show"},
        ]

    def call_tool(self, name, arguments):
        self.calls.append((name, dict(arguments)))
        show = arguments.get("show_name")
        if show != "Piers_Morgan_Uncensored":
            return False, {
                "error": f"Show '{show}' not found",
                "available_shows": ["Piers_Morgan_Uncensored"],
            }
        return True, {"stored_count": 119, "total_vectors": 119}


def test_orchestrator_error_driven_retry(monkeypatch):
    from qrag_tpu.serving.llm_orchestrator import OpenAIOrchestrator

    script = [
        # step 1: wrong show name -> structured error comes back
        {
            "reasoning": "ingest the requested show",
            "action": {
                "tool": "process_transcripts",
                "arguments": {"show_name": "piers morgan"},
            },
        },
        # step 2: retry with the advertised show (error-driven)
        {
            "reasoning": "retry with the listed show name",
            "action": {
                "tool": "process_transcripts",
                "arguments": {"show_name": "Piers_Morgan_Uncensored"},
            },
        },
        # step 3: done
        {"reasoning": "ingestion complete", "final_response": "Stored 119."},
    ]
    chat, created = _install_fake_openai(monkeypatch, script=script)
    monkeypatch.setenv("OPENAI_API_KEY", "orch-key")
    mcp = FakeMcpClient()
    orch = OpenAIOrchestrator(mcp)
    answer = orch.run("ingest the piers morgan show")

    assert answer == "Stored 119."
    assert created["api_key"] == "orch-key"
    assert [c[1]["show_name"] for c in mcp.calls] == [
        "piers morgan", "Piers_Morgan_Uncensored",
    ]
    # tool schemas reached the system prompt
    assert "process_transcripts" in chat.calls[0][0]["content"]
    # the structured error (with available_shows) was fed back to the
    # LLM before the retry — the error-driven-retry protocol
    feedback = chat.calls[1][-1]["content"]
    assert "available_shows" in feedback and "not found" in feedback
    assert chat.calls[1][-1]["role"] == "user"
    # the success result was fed back before the final answer
    assert "stored_count" in chat.calls[2][-1]["content"]


def test_orchestrator_no_action_and_max_steps(monkeypatch):
    from qrag_tpu.serving.llm_orchestrator import OpenAIOrchestrator

    _install_fake_openai(
        monkeypatch, script=[{"reasoning": "confused"}]
    )
    monkeypatch.setenv("OPENAI_API_KEY", "k")
    orch = OpenAIOrchestrator(FakeMcpClient())
    assert "no action" in orch.run("hello")

    loop_step = {
        "reasoning": "again",
        "action": {
            "tool": "process_transcripts",
            "arguments": {"show_name": "nope"},
        },
    }
    _install_fake_openai(monkeypatch, script=[loop_step] * 3)
    orch2 = OpenAIOrchestrator(FakeMcpClient(), max_steps=3)
    assert orch2.run("loop") == "orchestrator exceeded max steps"


def test_orchestrator_api_key_via_ssm(monkeypatch):
    from qrag_tpu.serving.llm_orchestrator import _get_api_key

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    ssm = FakeSSM({"/openai/api_key": "from-ssm"})
    _install_fake_boto3(monkeypatch, FakeS3({}), ssm)
    assert _get_api_key() == "from-ssm"
    assert ssm.calls == [("/openai/api_key", True)]
