"""Exact flat-index scan + top-k (XLA path).

This is the retrieval core the reference outsourced to faiss-cpu's C++
``IndexFlatL2`` (``mcp/server/tools/store_in_faiss.py:105``) — except
the reference never actually called ``index.search`` (SURVEY.md §0 gap
1); here search is a first-class jit-compiled op over an HBM-resident
matrix.

Semantics:
  * metric "l2": squared L2 distance, ascending (FAISS IndexFlatL2
    ordering).  Computed as ||q||^2 + ||x||^2 - 2 q.x so the scan is a
    single MXU matmul plus rank-1 corrections.
  * metric "ip": inner product, descending (FAISS IndexFlatIP).

On unit-norm vectors the two orderings coincide (d^2 = 2 - 2 q.x),
which the parity tests assert against NumPy oracles.

The Pallas fused scan+top-k kernel (`qrag_tpu.ops.pallas.scan_topk`)
plugs in behind the same interface via `flat_scan_topk`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cosine_scores(queries: jnp.ndarray, corpus: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity (B, d) x (N, d) -> (B, N)."""
    qn = queries / jnp.clip(
        jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12
    )
    cn = corpus / jnp.clip(jnp.linalg.norm(corpus, axis=-1, keepdims=True), 1e-12)
    return jnp.dot(qn, cn.T, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def ip_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    valid_rows: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inner-product top-k.  Returns (scores desc, indices), (B, k) each.

    `valid_rows`: optional (N,) bool mask — padded corpus rows are
    excluded by -inf scores (XLA static shapes require padding the
    corpus to a tile multiple; SURVEY.md §7 hard part 5).
    """
    scores = jnp.dot(
        queries, corpus.T, preferred_element_type=jnp.float32
    )  # (B, N)
    if valid_rows is not None:
        scores = jnp.where(valid_rows[None, :], scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("k",))
def l2_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    corpus_sqnorms: Optional[jnp.ndarray] = None,
    valid_rows: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Squared-L2 top-k (ascending), FAISS IndexFlatL2 semantics.

    Returns (distances asc, indices), (B, k) each.
    """
    if corpus_sqnorms is None:
        corpus_sqnorms = jnp.sum(corpus * corpus, axis=-1)
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)  # (B, 1)
    dots = jnp.dot(queries, corpus.T, preferred_element_type=jnp.float32)
    d2 = q_sq + corpus_sqnorms[None, :] - 2.0 * dots
    d2 = jnp.maximum(d2, 0.0)  # clamp FP cancellation noise
    if valid_rows is not None:
        d2 = jnp.where(valid_rows[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx


def flat_scan_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    metric: str = "l2",
    corpus_sqnorms: Optional[jnp.ndarray] = None,
    valid_rows: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch to the XLA or Pallas scan.

    Returns (scores, indices): distances ascending for "l2", inner
    products descending for "ip".
    """
    if use_pallas:
        from qrag_tpu.ops.pallas.scan_topk import pallas_scan_topk

        return pallas_scan_topk(
            queries,
            corpus,
            k,
            metric=metric,
            corpus_sqnorms=corpus_sqnorms,
            valid_rows=valid_rows,
        )
    if metric == "l2":
        return l2_topk(
            queries, corpus, k, corpus_sqnorms=corpus_sqnorms, valid_rows=valid_rows
        )
    if metric == "ip":
        return ip_topk(queries, corpus, k, valid_rows=valid_rows)
    raise ValueError(f"unknown metric {metric!r}")
