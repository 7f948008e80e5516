"""End-to-end serving test for the gather-free windowed scan mode
(VERDICT r2 #3): a user selects it from config
(quantization="int8", quant_scan="window", exact_scores=False — the
serve CLI's --lean-scan), queries flow through the engine and HTTP
API, and /stats reports the effective scan mode.
"""

import json
import urllib.request

import numpy as np
import pytest

from qrag_tpu.config import QragConfig
from qrag_tpu.engine import QragEngine
from qrag_tpu.index.quantized_index import QuantizedFlatIndex

N, D, K = 16384, 32, 5  # nw = 128 windows >= max(16k, 64): window path engages


@pytest.fixture(scope="module")
def lean_engine():
    cfg = QragConfig.from_dict(
        {
            "index": {
                "quantization": "int8",
                "quant_scan": "window",
                "exact_scores": False,
                "normalize": True,
            },
            "embedding": {"provider": "hash", "dim": D},
        }
    )
    engine = QragEngine(config=cfg)
    rng = np.random.RandomState(7)
    x = rng.randn(N, D).astype(np.float32)
    engine.index.add(x, [f"doc{i}" for i in range(N)])
    return engine


def test_config_selects_gather_free_index(lean_engine):
    index = lean_engine.index
    assert isinstance(index, QuantizedFlatIndex)
    assert index.scan == "window"
    assert index.exact_scores is False


def test_lean_search_results_sane(lean_engine):
    rng = np.random.RandomState(8)
    # self-queries: the source row must win even with approx scores
    rows = rng.choice(N, size=8, replace=False)
    base = lean_engine.index.sample_rows(rows)
    res = lean_engine.index.search(base, k=K)
    hits = sum(1 for qi, r in enumerate(rows) if r in set(res.indices[qi]))
    assert hits >= 7  # approx-class recall, self-query is the easy case
    # finalized distances: ascending, non-negative, self-hit near 0
    assert (res.scores >= 0).all()
    assert (np.diff(res.scores, axis=1) >= -1e-4).all()
    for qi, r in enumerate(rows):
        pos = np.where(res.indices[qi] == r)[0]
        if pos.size:
            assert res.scores[qi, pos[0]] < 0.15  # int8-approx near zero


def test_lean_serving_http_and_stats(lean_engine):
    from qrag_tpu.serving.http_app import serve_in_thread

    server = serve_in_thread(lean_engine)
    try:
        port = server.server_address[1]
        vec = lean_engine.index.sample_rows([123]).tolist()
        body = json.dumps({"vectors": vec, "k": K}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.load(resp)
        hits = out["results"][0]
        assert hits[0]["index"] == 123  # self-query wins
        scores = [h["score"] for h in hits]
        assert scores == sorted(scores)  # finalized ascending distances
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=60
        ) as resp:
            stats = json.load(resp)
        layout = stats["index"]["layout"]
        assert layout["quantization"] == "int8"
        assert layout["scan"] == "window"
        assert layout["exact_scores"] is False
    finally:
        server.shutdown()


def test_gather_free_requires_window_scan():
    with pytest.raises(ValueError, match="gather-free"):
        QuantizedFlatIndex(d=D, scan="row", exact_scores=False)


def test_lean_scan_cli_flag_sets_config(monkeypatch, tmp_path):
    """--lean-scan wires quantization/quant_scan/exact_scores through
    the serve CLI's config + env channel (parsed, not served)."""
    import qrag_tpu.serving.http_app as http_app

    captured = {}

    def fake_create_server(engine, host, port, batching=False, **kw):
        captured["engine"] = engine
        raise SystemExit(0)  # stop before serve_forever

    monkeypatch.setattr(http_app, "create_server", fake_create_server)
    import os

    try:
        with pytest.raises(SystemExit):
            http_app.main(["--lean-scan", "--port", "0", "--no-warmup"])
    finally:
        # main() exports QRAG_INDEX_* for bundle reload; scrub so other
        # tests' with_env_overrides() don't inherit the lean mode
        for key in (
            "QRAG_INDEX_QUANTIZATION",
            "QRAG_INDEX_QUANT_SCAN",
            "QRAG_INDEX_EXACT_SCORES",
        ):
            os.environ.pop(key, None)
    engine = captured["engine"]
    assert engine.config.index.quantization == "int8"
    assert engine.config.index.quant_scan == "window"
    assert engine.config.index.exact_scores is False
    assert isinstance(engine.index, QuantizedFlatIndex)
    assert engine.index.exact_scores is False


def test_topk_mode_cli_flag_sets_config(monkeypatch):
    """--topk-mode bounded wires IndexConfig.topk_mode through the
    serve CLI's config + env channel (parsed, not served)."""
    import os

    import qrag_tpu.serving.http_app as http_app

    captured = {}

    def fake_create_server(engine, host, port, batching=False, **kw):
        captured["engine"] = engine
        raise SystemExit(0)

    monkeypatch.setattr(http_app, "create_server", fake_create_server)
    try:
        with pytest.raises(SystemExit):
            http_app.main(
                ["--topk-mode", "bounded", "--port", "0", "--no-warmup"]
            )
    finally:
        os.environ.pop("QRAG_INDEX_TOPK_MODE", None)
    engine = captured["engine"]
    assert engine.config.index.topk_mode == "bounded"
    assert engine.index.topk_mode == "bounded"


def test_int8_bounded_sharded_cli_rejected(capsys):
    """ADVICE r4: --bounded-scan int8 with --sharded used to be
    accepted and silently served the bf16 scan; it must be a parse
    error now (argparse exits 2)."""
    import qrag_tpu.serving.http_app as http_app

    with pytest.raises(SystemExit) as exc:
        http_app.main(
            ["--topk-mode", "bounded", "--bounded-scan", "int8",
             "--sharded", "--port", "0", "--no-warmup"]
        )
    assert exc.value.code == 2
    assert "not implemented for --sharded" in capsys.readouterr().err
