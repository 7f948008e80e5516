"""Int8 quantized scan + exact refinement (ops/quantize.py,
index/quantized_index.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.index.quantized_index import QuantizedFlatIndex
from qrag_tpu.ops.quantize import quantize_rows


def test_quantize_rows_roundtrip(rng):
    x = rng.randn(64, 32).astype(np.float32) * 5
    q8, s = quantize_rows(jnp.asarray(x))
    back = np.asarray(q8, np.float32) * np.asarray(s)[:, None]
    # int8 relative error bounded by scale/2 per element
    assert np.max(np.abs(back - x)) <= np.max(np.asarray(s)) * 0.5 + 1e-6


def test_quantize_zero_row():
    q8, s = quantize_rows(jnp.zeros((2, 8)))
    assert np.all(np.asarray(q8) == 0)
    assert np.all(np.isfinite(np.asarray(s)))


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_quantized_index_recall_and_exact_scores(rng, metric):
    x = rng.randn(5000, 64).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.randn(16, 64).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    exact = DeviceFlatIndex.from_numpy(x, metric=metric, topk_mode="exact")
    quant = QuantizedFlatIndex.from_numpy(x, metric=metric, refine_factor=8)
    r_e = exact.search(q, k=10)
    r_q = quant.search(q, k=10)
    # recall@10 of the refined quantized search on unit-norm data
    recall = np.mean(
        [
            len(set(r_q.indices[i]) & set(r_e.indices[i])) / 10
            for i in range(len(q))
        ]
    )
    assert recall >= 0.95, recall
    # top-1 must be the true best within bf16 refinement precision:
    # random 64-d unit vectors have razor-thin margins, so assert the
    # SCORE gap, not index identity (bf16 rounding may flip near-ties)
    for i in range(len(q)):
        assert abs(r_q.scores[i, 0] - r_e.scores[i, 0]) < 5e-2


def test_quantized_self_query(rng):
    x = rng.randn(1000, 32).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    quant = QuantizedFlatIndex.from_numpy(x, metric="l2")
    res = quant.search(x[123:124], k=1)
    assert res.indices[0, 0] == 123


def test_quantized_incremental_add():
    # own seed + unit-norm rows: self-query top-1 under IP is then
    # unambiguous (x.x = 1 >= x.y), so the approx int8 scan cannot
    # legitimately flip it — decoupled from the suite-order-dependent
    # shared rng stream, which made this flake on near-ties
    rng = np.random.RandomState(1234)
    quant = QuantizedFlatIndex(d=16, metric="ip")
    a = rng.randn(50, 16).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    quant.add(a, metadata=[f"a/{i}" for i in range(50)])
    res = quant.search(a[7], k=1)
    assert res.indices[0, 0] == 7
    b = rng.randn(30, 16).astype(np.float32)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    quant.add(b)
    res = quant.search(b[4], k=1)
    assert res.indices[0, 0] == 54  # re-quantized after append


def test_engine_from_faiss_respects_quantization(tmp_path, rng):
    from qrag_tpu.config import QragConfig
    from qrag_tpu.engine import QragEngine
    from qrag_tpu.index import faiss_io

    x = rng.randn(300, 32).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    path = str(tmp_path / "q.faiss")
    faiss_io.write_flat_index(path, x, metric="l2")
    cfg = QragConfig.from_dict(
        {"index": {"quantization": "int8", "refine_factor": 8},
         "embedding": {"provider": "hash", "dim": 32}}
    )
    eng = QragEngine.from_faiss(path, config=cfg)
    assert isinstance(eng.index, QuantizedFlatIndex)
    assert eng.index.refine_factor == 8
    res = eng.search(x[17], k=1)
    assert res.indices[0, 0] == 17
