"""FAISS flat-file format IO: bundled-artifact load + roundtrip +
append semantics (SURVEY.md §4.2 / §4.4)."""

import os
import pickle

import numpy as np
import pytest

from qrag_tpu.index import faiss_io


def test_read_bundled_artifact(bundled_index_path):
    data = faiss_io.read_flat_index(bundled_index_path)
    assert data.d == 1536
    assert data.ntotal == 119
    assert data.metric == "l2"
    norms = np.linalg.norm(data.vectors, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_read_bundled_metadata(bundled_index_path):
    meta = faiss_io.read_metadata(bundled_index_path)
    assert len(meta) == 119
    assert all(m.startswith("Piers_Morgan_Uncensored/") for m in meta)
    assert len({m.split("/")[1] for m in meta}) == 23  # unique episodes


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_roundtrip(tmp_path, metric, rng):
    path = str(tmp_path / "idx.faiss")
    x = rng.randn(17, 32).astype(np.float32)
    faiss_io.write_flat_index(path, x, metric=metric)
    back = faiss_io.read_flat_index(path)
    assert back.metric == metric
    np.testing.assert_array_equal(back.vectors, x)


def test_append_open_or_create(tmp_path, rng):
    """Open-or-create + append (``store_in_faiss.py:102-109``)."""
    path = str(tmp_path / "idx.faiss")
    a = rng.randn(5, 16).astype(np.float32)
    b = rng.randn(3, 16).astype(np.float32)
    assert faiss_io.append_flat_index(path, a) == 5
    assert faiss_io.append_flat_index(path, b) == 8
    back = faiss_io.read_flat_index(path)
    np.testing.assert_array_equal(back.vectors, np.concatenate([a, b]))


def test_append_validates_dimension(tmp_path, rng):
    """Unlike the reference (Appendix A.6), appends validate d."""
    path = str(tmp_path / "idx.faiss")
    faiss_io.append_flat_index(path, rng.randn(2, 16).astype(np.float32))
    with pytest.raises(ValueError, match="dimension mismatch"):
        faiss_io.append_flat_index(path, rng.randn(2, 8).astype(np.float32))


def test_metadata_append_semantics(tmp_path):
    """Load-extend-dump (``store_in_faiss.py:111-122``)."""
    path = str(tmp_path / "idx.faiss")
    faiss_io.append_metadata(path, ["a/1", "a/2"])
    faiss_io.append_metadata(path, ["b/3"])
    assert faiss_io.read_metadata(path) == ["a/1", "a/2", "b/3"]
    # sidecar naming convention
    assert os.path.exists(str(tmp_path / "idx_metadata.pkl"))


def test_missing_metadata_sidecar(tmp_path):
    """Missing sidecar → empty list (fault tolerance, SURVEY.md §4.4)."""
    assert faiss_io.read_metadata(str(tmp_path / "none.faiss")) == []


def test_rejects_non_flat_index(tmp_path):
    path = str(tmp_path / "bogus.faiss")
    with open(path, "wb") as f:
        f.write(b"IwFl" + b"\x00" * 64)
    with pytest.raises(ValueError, match="fourcc"):
        faiss_io.read_flat_index(path)
