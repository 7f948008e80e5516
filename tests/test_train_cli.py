"""Train CLI: synthetic + JSONL data, checkpoint resume, scorer load."""

import json
import os

import numpy as np

from qrag_tpu.models.train_cli import main as train_main


def test_train_cli_synthetic_and_resume(tmp_path, capsys):
    out = str(tmp_path / "model")
    train_main(
        [
            "--steps", "12", "--batch", "8", "--dim", "32", "--heads", "2",
            "--layers", "1", "--experts", "2", "--max-len", "48",
            "--out", out,
        ]
    )
    assert os.path.exists(os.path.join(out, "params.npz"))
    assert os.path.exists(os.path.join(out + ".ckpt", "config.json"))
    train_main(
        [
            "--steps", "3", "--batch", "8", "--dim", "32", "--heads", "2",
            "--layers", "1", "--experts", "2", "--max-len", "48",
            "--out", out, "--resume", out + ".ckpt",
        ]
    )
    captured = capsys.readouterr().out
    assert "resumed" in captured and "step 15" in captured


def test_train_cli_jsonl_data(tmp_path):
    data = tmp_path / "train.jsonl"
    rows = [
        {"query": "sponsor ads", "doc": "sponsor ads by acme", "label": 1},
        {"query": "sponsor ads", "doc": "weather report", "label": 0},
    ]
    data.write_text("\n".join(json.dumps(r) for r in rows))
    out = str(tmp_path / "m2")
    train_main(
        [
            "--steps", "5", "--batch", "4", "--dim", "32", "--heads", "2",
            "--layers", "1", "--experts", "0", "--max-len", "48",
            "--data", str(data), "--out", out,
        ]
    )
    import jax.numpy as jnp

    from qrag_tpu.models.cross_encoder import (
        CrossEncoderConfig,
        CrossEncoderScorer,
    )

    cfg = CrossEncoderConfig(
        dim=32, n_heads=2, n_layers=1, n_experts=0, max_len=48,
        dtype=jnp.float32,
    )
    s = CrossEncoderScorer(cfg)
    s.load(out)
    scores = s.score("sponsor ads", ["sponsor ads by acme", "weather report"])
    assert scores.shape == (2,)
