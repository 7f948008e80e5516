"""DeviceFlatIndex: build/add/search/persist, bundled-corpus parity
(SURVEY.md §4.2 integration tests)."""

import numpy as np
import pytest

from qrag_tpu.index import DeviceFlatIndex, faiss_io


def test_build_and_search(rng):
    x = rng.randn(100, 32).astype(np.float32)
    idx = DeviceFlatIndex.from_numpy(x, metric="l2")
    q = x[7:8] + 0.001 * rng.randn(1, 32).astype(np.float32)
    res = idx.search(q, k=5)
    assert res.indices[0, 0] == 7
    assert res.scores[0, 0] <= res.scores[0, 1]


def test_search_matches_numpy_full_scan(rng):
    x = rng.randn(300, 24).astype(np.float32)
    q = rng.randn(6, 24).astype(np.float32)
    idx = DeviceFlatIndex.from_numpy(x, metric="l2")
    res = idx.search(q, k=10)
    d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1, kind="stable")[:, :10]
    np.testing.assert_array_equal(res.indices, want)


def test_incremental_add(rng):
    idx = DeviceFlatIndex(d=16, metric="ip")
    a = rng.randn(10, 16).astype(np.float32)
    b = rng.randn(20, 16).astype(np.float32)
    idx.add(a, metadata=[f"a/{i}" for i in range(10)])
    assert idx.ntotal == 10
    idx.add(b, metadata=[f"b/{i}" for i in range(20)])
    assert idx.ntotal == 30
    res = idx.search(b[3:4], k=1)
    assert res.indices[0, 0] == 13
    assert res.metadata[0][0] == "b/3"


def test_add_validates_dimension(rng):
    idx = DeviceFlatIndex(d=16)
    with pytest.raises(ValueError):
        idx.add(rng.randn(4, 8).astype(np.float32))


def test_normalize_at_ingestion(rng):
    idx = DeviceFlatIndex(d=8, metric="ip", normalize=True)
    idx.add(10 * rng.randn(5, 8).astype(np.float32))
    norms = np.linalg.norm(idx._host_vectors, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_bundled_corpus_load_and_search(bundled_index_path):
    idx = DeviceFlatIndex.load_faiss(bundled_index_path)
    assert idx.d == 1536 and idx.ntotal == 119 and idx.metric == "l2"
    # self-query: the top hit must be (numerically) as close as the
    # query itself.  The corpus contains near-duplicate rows and the
    # dot-product L2 formulation carries ~1e-4 cancellation error at
    # distance ~0, so assert distance, not index identity.
    data = faiss_io.read_flat_index(bundled_index_path)
    res = idx.search(data.vectors[:10], k=3)
    for qi in range(10):
        assert res.scores[qi, 0] < 1e-3  # ~0: itself or a duplicate
        true_d2 = ((data.vectors - data.vectors[qi]) ** 2).sum(-1)
        hit = res.indices[qi, 0]
        assert true_d2[hit] <= true_d2.min() + 1e-3
    assert res.metadata[0][0].startswith("Piers_Morgan_Uncensored/")


def test_faiss_save_roundtrip(tmp_path, rng):
    x = rng.randn(12, 16).astype(np.float32)
    idx = DeviceFlatIndex.from_numpy(x, metric="l2", metadata=[str(i) for i in range(12)])
    path = str(tmp_path / "out.faiss")
    idx.save_faiss(path)
    back = DeviceFlatIndex.load_faiss(path)
    np.testing.assert_array_equal(back._host_vectors, x)
    assert back.metadata == [str(i) for i in range(12)]


def test_native_save_roundtrip(tmp_path, rng):
    x = rng.randn(12, 16).astype(np.float32)
    idx = DeviceFlatIndex.from_numpy(
        x, metric="ip", metadata=[f"m/{i}" for i in range(12)]
    )
    d = str(tmp_path / "native")
    idx.save_native(d)
    back = DeviceFlatIndex.load_native(d)
    assert back.metric == "ip"
    np.testing.assert_array_equal(back._host_vectors, x)
    assert back.metadata == [f"m/{i}" for i in range(12)]


def test_empty_index_search(rng):
    idx = DeviceFlatIndex(d=8)
    res = idx.search(rng.randn(1, 8).astype(np.float32), k=5)
    assert (res.indices == -1).all()


def test_search_1d_query(rng):
    x = rng.randn(20, 8).astype(np.float32)
    idx = DeviceFlatIndex.from_numpy(x)
    res = idx.search(x[4], k=1)
    assert res.indices[0, 0] == 4
