"""Dynamic request batching for serving.

Concurrent HTTP requests each carry a handful of queries, but the
device scan amortizes massively with batch size (one 1024-query batch
costs barely more than a 1-query one — docs/PERFORMANCE.md).  The
batcher aggregates queries from concurrent requests into one device
call: callers enqueue (vectors, k) and block on a future; a worker
drains the queue, pads the combined batch to a power-of-two bucket
(stable compiled shapes), runs ONE engine search, and scatters results
back.

max_wait_s bounds added latency (default 2 ms); max_batch bounds the
device batch.  Requests with different k are served with max(k) and
trimmed per caller.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class _Pending:
    vectors: np.ndarray  # (n, d)
    k: int
    future: Future = field(default_factory=Future)
    params: tuple = ()  # extra grouping key (rerank candidates/type)


class SearchBatcher:
    """Aggregates concurrent search calls into single device batches.

    Plain searches batch freely (k differences are served with max(k)
    and trimmed); fused search+rerank requests batch among requests
    with identical (k, candidates, reranker_type)."""

    def __init__(
        self,
        engine,
        max_wait_s: float = 0.002,
        max_batch: int = 1024,
        bucket_floor: int = 8,
    ):
        self.engine = engine
        self.max_wait_s = max_wait_s
        self.max_batch = max_batch
        self.bucket_floor = bucket_floor
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self.batches = 0
        self.batched_queries = 0

    # ------------------------------------------------------------- client

    def _submit(self, item: _Pending):
        if self._stop.is_set():
            raise RuntimeError("batcher is closed")
        self._queue.put(item)
        return item.future.result()

    def search(self, vectors: np.ndarray, k: int = 10):
        """Blocking search through the batcher; returns SearchResult."""
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        return self._submit(_Pending(vectors=vectors, k=k))

    def search_rerank(
        self,
        vectors: np.ndarray,
        k: int = 10,
        candidates: int = 100,
        reranker_type: str = "quantum",
    ) -> dict:
        """Blocking fused search+rerank through the batcher; returns
        the engine's result dict for THESE vectors only."""
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        return self._submit(
            _Pending(
                vectors=vectors,
                k=k,
                params=("rerank", k, candidates, reranker_type),
            )
        )

    def close(self) -> None:
        """Stop the worker and FAIL any still-pending requests so no
        caller blocks forever on a dead queue."""
        self._stop.set()
        self._worker.join(timeout=5)
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if not item.future.done():
                item.future.set_exception(RuntimeError("batcher closed"))

    def stats(self) -> dict:
        return {
            "batches": self.batches,
            "batched_queries": self.batched_queries,
            "mean_batch": (
                round(self.batched_queries / self.batches, 2)
                if self.batches
                else 0.0
            ),
        }

    # ------------------------------------------------------------- worker

    def _drain(self) -> List[_Pending]:
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        items = [first]
        total = first.vectors.shape[0]
        deadline = time.time() + self.max_wait_s
        while total < self.max_batch:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            items.append(nxt)
            total += nxt.vectors.shape[0]
        return items

    def _run(self) -> None:
        while not self._stop.is_set():
            items = self._drain()
            if not items:
                continue
            # group by extra params: only identical-parameter requests
            # share a device batch
            groups: dict = {}
            for it in items:
                groups.setdefault(it.params, []).append(it)
            for group in groups.values():
                try:
                    self._serve(group)
                except Exception as e:  # noqa: BLE001 - per-request
                    for it in group:
                        if not it.future.done():
                            it.future.set_exception(e)

    def _serve(self, items: List[_Pending]) -> None:
        if items[0].params and items[0].params[0] == "rerank":
            self._serve_rerank(items)
            return
        vecs = np.concatenate([it.vectors for it in items], axis=0)
        k = max(it.k for it in items)
        b = vecs.shape[0]
        # pad to a power-of-two bucket → few compiled shapes
        bucket = self.bucket_floor
        while bucket < b:
            bucket *= 2
        if bucket != b:
            vecs = np.pad(vecs, ((0, bucket - b), (0, 0)))
        res = self.engine.search(vecs, k=k)
        self.batches += 1
        self.batched_queries += b
        off = 0
        for it in items:
            n = it.vectors.shape[0]
            sl = slice(off, off + n)
            from qrag_tpu.index.flat_index import SearchResult

            it.future.set_result(
                SearchResult(
                    scores=res.scores[sl][:, : it.k],
                    indices=res.indices[sl][:, : it.k],
                    metadata=[row[: it.k] for row in res.metadata[sl]],
                )
            )
            off += n

    def _serve_rerank(self, items: List[_Pending]) -> None:
        _, k, candidates, reranker_type = items[0].params
        vecs = np.concatenate([it.vectors for it in items], axis=0)
        b = vecs.shape[0]
        bucket = self.bucket_floor
        while bucket < b:
            bucket *= 2
        if bucket != b:
            vecs = np.pad(vecs, ((0, bucket - b), (0, 0)))
        out = self.engine.search_rerank(
            vecs, k=k, candidates=candidates, reranker_type=reranker_type
        )
        self.batches += 1
        self.batched_queries += b
        results = out["results"]
        off = 0
        for it in items:
            n = it.vectors.shape[0]
            it.future.set_result(
                {
                    "queries": n,
                    "results": results[off : off + n],
                    "reranker_used": out["reranker_used"],
                }
            )
            off += n
