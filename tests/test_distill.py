"""Fidelity -> cross-encoder distillation (models/distill.py)."""

import numpy as np
import pytest

from qrag_tpu.models.distill import (
    DistillConfig,
    _spearman,
    default_teacher_embedder,
    distill,
    teacher_fidelity,
)


def test_spearman_helper():
    a = np.asarray([1.0, 2.0, 3.0, 4.0])
    assert _spearman(a, a) == pytest.approx(1.0)
    assert _spearman(a, -a) == pytest.approx(-1.0)


def test_teacher_is_deterministic_and_bounded():
    emb = default_teacher_embedder(10)
    qs = ["what did they say about vote", "find the segment on prices"]
    docs = [["doc one text", "doc two text"], ["doc three", "doc four"]]
    f1 = teacher_fidelity(qs, docs, 10, embedder=emb)
    f2 = teacher_fidelity(qs, docs, 10, embedder=emb)
    np.testing.assert_allclose(f1, f2, rtol=1e-6)
    assert (f1 >= 0).all() and (f1 <= 1 + 1e-6).all()


@pytest.mark.slow
def test_distilled_student_tracks_teacher_on_heldout():
    out, params, cfg = distill(
        DistillConfig(
            n_episodes=8,
            chunks_per_episode=3,
            docs_per_query=6,
            n_queries=64,
            steps=120,
            batch=24,
            dim=48,
            layers=1,
            heads=2,
            max_len=96,
        )
    )
    # fixed seeds: measured spearman -0.10 -> 0.68, top-1 0.19 -> 0.38
    assert out["spearman_after"] > out["spearman_before"] + 0.3, out
    assert out["spearman_after"] >= 0.4, out
    assert out["top1_agreement_after"] >= out["top1_agreement_before"], out
