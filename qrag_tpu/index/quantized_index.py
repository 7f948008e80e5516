"""Int8-quantized flat index: quantized scan + exact refinement.

`QuantizedFlatIndex` keeps TWO device-resident forms of the corpus:
an int8 matrix (+ per-row scales) that the hot scan reads, and the
true-precision matrix (bf16 by default) used to exactly re-score the
top candidates.  Returned scores are therefore exact; only candidate
recall depends on quantization, controlled by ``refine_factor``
(candidates = refine_factor × k).

Memory for 1M×768: 0.77 GB int8 + 1.5 GB bf16 ≈ 2.3 GB; the scan
reads only the int8 half → ~2× less HBM traffic and 2× MXU rate vs
bf16.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qrag_tpu.index.flat_index import DeviceFlatIndex
from qrag_tpu.ops.quantize import int8_scan_topk, quantize_rows, refine_candidates
from qrag_tpu.ops.topk import _finalize


class QuantizedFlatIndex(DeviceFlatIndex):
    """DeviceFlatIndex whose scan runs on int8 with exact refinement."""

    def __init__(self, *args, refine_factor: int = 4, **kwargs):
        kwargs.setdefault("store_dtype", "bfloat16")
        # the quantized scan is pre-refinement approximate; "verified"
        # certificates don't apply (host search must route through our
        # search_device)
        kwargs["topk_mode"] = "approx"
        super().__init__(*args, **kwargs)
        self.refine_factor = max(1, int(refine_factor))
        self._dev_q8: Optional[jax.Array] = None
        self._dev_scales: Optional[jax.Array] = None

    def _upload_locked(self) -> None:
        was_dirty = self._dirty or self._dev_matrix is None
        super()._upload_locked()
        if was_dirty:
            q8, scales = jax.jit(quantize_rows)(
                self._dev_matrix.astype(jnp.float32)
            )
            self._dev_q8 = q8
            self._dev_scales = scales

    def search_device(
        self, queries: jnp.ndarray, k: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        self._ensure_device()
        q32 = queries.astype(jnp.float32)
        q8, q_scale = quantize_rows(q32)
        qsq = jnp.sum(q32 * q32, axis=-1)
        c = min(self.refine_factor * k, self._dev_q8.shape[0])
        cand_g, idx = int8_scan_topk(
            q8,
            q_scale,
            self._dev_q8,
            self._dev_scales,
            c,
            metric=self.metric,
            corpus_sqnorms=self._dev_sqnorms,
            query_sqnorms=qsq,
            valid_rows=self._dev_valid,
        )
        vals, final_idx = refine_candidates(
            q32,
            self._dev_matrix,
            idx,
            cand_g,
            k,
            metric=self.metric,
            corpus_sqnorms=self._dev_sqnorms,
        )
        return _finalize(vals, final_idx, self.metric)
