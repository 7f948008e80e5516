"""Incremental append + streaming build (VERDICT r4 item 4).

The round-3 design re-uploaded the ENTIRE padded matrix on every add
within capacity and re-sharded the whole host master per sharded add —
a scale ceiling at BASELINE configs[4] (100M x 768).  These tests pin
the new contracts:

  * adding rows to an uploaded index transfers only ~the new rows
    (host->device traffic measured by instrumenting jax.device_put);
  * results after incremental appends are identical to a fresh index;
  * derived buffers (bounded, fidelity features) rebuild correctly;
  * the sharded streaming mode (keep_host_master=False) builds from
    chunks without ever materializing the corpus on the host, grows
    capacity device-side, and can checkpoint via a disk-backed stream.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qrag_tpu.config import MeshConfig
from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.parallel import ShardedFlatIndex, make_mesh


class _PutRecorder:
    """Wrap jax.device_put and record transferred host-array shapes."""

    def __init__(self, monkeypatch):
        self.shapes = []
        real = jax.device_put

        def spy(x, *a, **k):
            if hasattr(x, "shape") and not isinstance(x, jax.Array):
                self.shapes.append(tuple(x.shape))
            return real(x, *a, **k)

        monkeypatch.setattr(jax, "device_put", spy)

    def max_rows_2d(self):
        return max((s[0] for s in self.shapes if len(s) == 2), default=0)


def test_flat_incremental_append_transfers_only_new_rows(rng, monkeypatch):
    x = rng.randn(2048, 32).astype(np.float32)
    idx = DeviceFlatIndex.from_numpy(x, metric="l2", topk_mode="exact")
    q = rng.randn(3, 32).astype(np.float32)
    idx.search(q, k=5)  # build the snapshot (full upload happens here)
    cap_before = idx._capacity
    assert cap_before >= 2048

    rec = _PutRecorder(monkeypatch)
    extra = rng.randn(100, 32).astype(np.float32)
    idx.add(extra, metadata=[f"new/{i}" for i in range(100)])
    res = idx.search(extra[:4], k=3)
    # only the pow2-bucketed new rows crossed the host->device boundary
    assert rec.max_rows_2d() <= 128, rec.shapes
    assert idx._capacity == cap_before  # no regrow, no re-upload
    # the new rows are immediately searchable with exact self-hits
    assert list(res.indices[:, 0]) == [2048, 2049, 2050, 2051]
    assert res.metadata[0][0] == "new/0"

    # equality with a fresh index built from the same data
    fresh = DeviceFlatIndex.from_numpy(
        np.concatenate([x, extra]), metric="l2", topk_mode="exact"
    )
    qq = rng.randn(6, 32).astype(np.float32)
    a, b = idx.search(qq, k=10), fresh.search(qq, k=10)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-5, atol=1e-6)


def test_flat_append_beyond_capacity_regrows(rng):
    x = rng.randn(256, 16).astype(np.float32)
    idx = DeviceFlatIndex.from_numpy(x, topk_mode="exact")
    idx.search(x[:1], k=1)
    cap = idx._capacity
    big = rng.randn(cap + 100, 16).astype(np.float32)
    idx.add(big)
    res = idx.search(big[:2], k=1)
    assert list(res.indices[:, 0]) == [256, 257]
    assert idx._capacity > cap


def test_flat_incremental_invalidates_derived_buffers(rng):
    """Bounded buffers and fidelity features must rebuild after an
    incremental append (they are per-snapshot-generation caches)."""
    x = rng.randn(4608, 64).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = DeviceFlatIndex.from_numpy(x, metric="l2", topk_mode="bounded")
    probe = x[7] + 1e-3
    idx.search(probe[None], k=5)  # builds snapshot + bounded buffers
    new = rng.randn(64, 64).astype(np.float32)
    new[0] = probe  # exact duplicate of the probe: must become top-1
    idx.add(new)
    res = idx.search(probe[None], k=5)
    assert res.indices[0, 0] == 4608
    feats = idx.fidelity_features(4)
    assert feats.shape[0] == idx._capacity


def test_flat_many_small_appends_bounded_compiles(rng):
    """Appends of varying sizes reuse the pow2 bucket ladder."""
    idx = DeviceFlatIndex(d=16, topk_mode="exact")
    total = 0
    for i, size in enumerate((1, 3, 17, 64, 5, 100, 2)):
        rows = rng.randn(size, 16).astype(np.float32)
        idx.add(rows)
        total += size
        res = idx.search(rows[:1], k=1)
        assert res.indices[0, 0] == total - size
    assert idx.ntotal == total


# ---------------------------------------------------------------- sharded


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(MeshConfig(data_parallel=2, model_parallel=4))


def test_sharded_incremental_append(mesh8, rng, monkeypatch):
    x = rng.randn(3000, 32).astype(np.float32)
    idx = ShardedFlatIndex(x, mesh8, topk_mode="exact")
    q = rng.randn(4, 32).astype(np.float32)
    idx.search(q, k=5)
    rec = _PutRecorder(monkeypatch)
    extra = rng.randn(60, 32).astype(np.float32)
    idx.add(extra)
    res = idx.search(extra[:3], k=2)
    assert list(res.indices[:, 0]) == [3000, 3001, 3002]
    assert rec.max_rows_2d() <= 128  # only the new-row bucket moved
    fresh = ShardedFlatIndex(
        np.concatenate([x, extra]), mesh8, topk_mode="exact"
    )
    a, b = idx.search(q, k=10), fresh.search(q, k=10)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-5, atol=1e-6)


def test_sharded_streaming_build_no_host_master(mesh8, rng, monkeypatch):
    """Chunked streaming build: the host never holds more than one
    chunk; capacity grows DEVICE-side; results match a reference index
    over the concatenated corpus."""
    chunks = [rng.randn(256, 32).astype(np.float32) for _ in range(16)]
    rec = _PutRecorder(monkeypatch)
    idx = ShardedFlatIndex(
        mesh=mesh8, d=32, topk_mode="exact", keep_host_master=False
    )
    for i, ch in enumerate(chunks):
        idx.add(ch, metadata=[f"c{i}/{j}" for j in range(256)])
        if i % 5 == 0:
            idx.search(ch[:1], k=1)  # interleave queries with ingestion
    full = np.concatenate(chunks)
    assert idx.ntotal == 4096
    assert idx._host_vectors.size == 0  # never materialized on host
    # transfers scale with the PENDING rows (up to 5 chunks coalesce
    # between queries -> pow2 bucket 2048), never with the corpus
    assert rec.max_rows_2d() <= 2048
    ref = DeviceFlatIndex.from_numpy(full, topk_mode="exact")
    q = rng.randn(4, 32).astype(np.float32)
    a, b = idx.search(q, k=10), ref.search(q, k=10)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-5, atol=1e-5)
    assert a.metadata[0][0] == b.metadata[0][0] or a.metadata[0][0].startswith("c")
    # sample_rows works without a master (device gather)
    np.testing.assert_allclose(
        idx.sample_rows([5, 300]), full[[5, 300]], rtol=1e-5, atol=1e-6
    )
    assert idx.layout()["host_master"] is False


def test_sharded_streaming_checkpoint_roundtrip(mesh8, rng, tmp_path):
    chunks = [rng.randn(200, 16).astype(np.float32) for _ in range(4)]
    idx = ShardedFlatIndex(
        mesh=mesh8, d=16, topk_mode="exact", keep_host_master=False
    )
    for ch in chunks:
        idx.add(ch)
    d1 = str(tmp_path / "native")
    idx.save_native(d1)
    restored = DeviceFlatIndex.load_native(d1, topk_mode="exact")
    assert restored.ntotal == 800
    q = rng.randn(3, 16).astype(np.float32)
    a, b = idx.search(q, k=5), restored.search(q, k=5)
    np.testing.assert_array_equal(a.indices, b.indices)
    # faiss artifact too
    f1 = str(tmp_path / "stream.faiss")
    idx.save_faiss(f1)
    loaded = DeviceFlatIndex.load_faiss(f1, topk_mode="exact")
    assert loaded.ntotal == 800


def test_sharded_streaming_rejects_reshard(mesh8, rng):
    idx = ShardedFlatIndex(
        mesh=mesh8, d=16, topk_mode="exact", keep_host_master=False
    )
    idx.add(rng.randn(100, 16).astype(np.float32))
    idx.search(rng.randn(1, 16).astype(np.float32), k=1)
    idx._needs_full = True  # simulate a state needing a full rebuild
    idx._dirty = True
    idx._pending = []
    with pytest.raises(RuntimeError, match="host master"):
        idx.search(rng.randn(1, 16).astype(np.float32), k=1)
