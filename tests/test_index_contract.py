"""Score-semantics contract across ALL index families (VERDICT r2 #5).

`search_device` must mean ONE thing everywhere: finalized API-edge
scores — l2 distances ascending, ip dots descending — identical across
DeviceFlatIndex, QuantizedFlatIndex, ShardedFlatIndex and
ElasticShardedIndex, and matching a NumPy oracle.  The raw
descending-goodness form is only reachable via the explicitly named
``search_device_raw`` (sharded family).  The engine dispatches on the
explicit ``has_device_snapshot`` capability flag, not hasattr
duck-typing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrag_tpu.config import MeshConfig
from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.index.quantized_index import QuantizedFlatIndex
from qrag_tpu.parallel import ShardedFlatIndex, make_mesh
from qrag_tpu.parallel.elastic import ElasticShardedIndex

N, D, K = 512, 32, 8


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(42)
    x = rng.randn(N, D).astype(np.float32)
    # NOT normalized: l2 and ip orderings genuinely differ, so a
    # sign-flipped l2 contract would be caught, not masked
    return x


@pytest.fixture(scope="module")
def queries():
    rng = np.random.RandomState(43)
    return rng.randn(6, D).astype(np.float32)


def _oracle(x, q, metric):
    if metric == "l2":
        d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        order = np.lexsort((np.arange(N)[None, :].repeat(len(q), 0), d2))
        idx = order[:, :K]
        return np.take_along_axis(d2, idx, axis=1), idx
    dots = q @ x.T
    order = np.lexsort((np.arange(N)[None, :].repeat(len(q), 0), -dots))
    idx = order[:, :K]
    return np.take_along_axis(dots, idx, axis=1), idx


def _build_all(x, metric):
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    return {
        "flat": DeviceFlatIndex.from_numpy(x, metric=metric, topk_mode="exact"),
        # refine_factor*K >= N: every row is exactly re-scored, so the
        # quantized index is exact at this size (contract comparable);
        # f32 store so refinement carries no bf16 rounding
        "quantized": QuantizedFlatIndex.from_numpy(
            x, metric=metric, refine_factor=N // K, store_dtype="float32"
        ),
        "sharded": ShardedFlatIndex(x, mesh, metric=metric, topk_mode="exact"),
        "elastic": ElasticShardedIndex(
            x, metric=metric, topk_mode="exact"
        ),
    }


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_search_device_finalized_everywhere(corpus, queries, metric):
    oracle_scores, oracle_idx = _oracle(corpus, queries, metric)
    for name, index in _build_all(corpus, metric).items():
        vals, idx = index.search_device(jnp.asarray(queries), K)
        vals = np.asarray(vals, dtype=np.float32)
        idx = np.asarray(idx)
        np.testing.assert_array_equal(
            idx, oracle_idx, err_msg=f"{name}/{metric}: indices"
        )
        if metric == "l2":
            # finalized l2 = non-negative distances ASCENDING
            assert (vals >= 0).all(), f"{name}: negative l2 distance"
            assert (np.diff(vals, axis=1) >= -1e-4).all(), (
                f"{name}: l2 scores not ascending — raw goodness leaked"
            )
        else:
            assert (np.diff(vals, axis=1) <= 1e-4).all(), (
                f"{name}: ip scores not descending"
            )
        np.testing.assert_allclose(
            vals, oracle_scores, rtol=2e-3, atol=2e-3,
            err_msg=f"{name}/{metric}: scores",
        )


def test_raw_form_is_goodness(corpus, queries):
    """search_device_raw is the descending-goodness internal form:
    -d^2 for l2 (negative of the finalized distance)."""
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    sharded = ShardedFlatIndex(corpus, mesh, metric="l2", topk_mode="exact")
    raw_v, raw_i = sharded.search_device_raw(jnp.asarray(queries), K)
    fin_v, fin_i = sharded.search_device(jnp.asarray(queries), K)
    np.testing.assert_array_equal(np.asarray(raw_i), np.asarray(fin_i))
    np.testing.assert_allclose(
        -np.asarray(raw_v), np.asarray(fin_v), rtol=1e-5, atol=1e-5
    )


def test_capability_flag():
    assert DeviceFlatIndex.has_device_snapshot is True
    assert QuantizedFlatIndex.has_device_snapshot is True
    assert ShardedFlatIndex.has_device_snapshot is False
    assert ElasticShardedIndex.has_device_snapshot is False


def test_rerank_retrieval_scores_finalized(corpus, queries):
    """The sharded fused-rerank third output (retrieval score of the
    selected hits) is finalized, matching the unsharded arm
    (engine.fused_search_rerank -> flat_scan_topk finalizes)."""
    from qrag_tpu.engine import fused_search_rerank

    x = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    sharded = ShardedFlatIndex(x, mesh, metric="l2", topk_mode="exact")
    fid_s, idx_s, retr_s = sharded.search_rerank_device(
        jnp.asarray(queries), k=5, candidates=20, n_qubits=4
    )
    single = DeviceFlatIndex.from_numpy(x, metric="l2", topk_mode="exact")
    snap = single.device_buffers()
    fid_1, idx_1, retr_1 = fused_search_rerank(
        jnp.asarray(queries), snap.matrix, snap.sqnorms, snap.valid,
        k=5, candidates=20, n_qubits=4, metric="l2", topk_mode="exact",
    )
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_1))
    np.testing.assert_allclose(
        np.asarray(retr_s), np.asarray(retr_1), rtol=1e-4, atol=1e-5
    )
    assert (np.asarray(retr_s) >= 0).all()  # distances, not -d^2
