"""Int8-quantized flat index: quantized scan + exact refinement.

`QuantizedFlatIndex` keeps TWO device-resident forms of the corpus:
an int8 matrix (+ per-row scales) that the hot scan reads, and the
true-precision matrix (bf16 by default) used to exactly re-score the
top candidates.  Returned scores are therefore exact; only candidate
recall depends on quantization, controlled by ``refine_factor``
(candidates = refine_factor × k).

Memory for 1M×768: 0.77 GB int8 + 1.5 GB bf16 ≈ 2.3 GB; the scan
reads only the int8 half → ~2× less HBM traffic and 2× MXU rate vs
bf16.  The quantized buffers live inside the index's atomic
`DeviceBuffers` snapshot, so appends publish all forms of a corpus
generation together.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qrag_tpu.index.flat_index import DeviceBuffers, DeviceFlatIndex
from qrag_tpu.ops.quantize import int8_scan_topk, quantize_rows, refine_candidates
from qrag_tpu.ops.topk import _finalize

# module-level jit: one trace cache across all indexes/uploads
_jit_quantize_rows = jax.jit(quantize_rows)


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

    def _finalize_snapshot(self, snap: DeviceBuffers) -> None:
        q8, scales = _jit_quantize_rows(snap.matrix.astype(jnp.float32))
        snap.extras["int8"] = (q8, scales)

    def search_device(
        self, queries: jnp.ndarray, k: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        snap = self.device_buffers()
        x8, scales = snap.extras["int8"]
        q32 = queries.astype(jnp.float32)
        q8, q_scale = quantize_rows(q32)
        qsq = jnp.sum(q32 * q32, axis=-1)
        c = min(self.refine_factor * k, x8.shape[0])
        cand_g, idx = int8_scan_topk(
            q8,
            q_scale,
            x8,
            scales,
            c,
            metric=self.metric,
            corpus_sqnorms=snap.sqnorms,
            query_sqnorms=qsq,
            valid_rows=snap.valid,
        )
        vals, final_idx = refine_candidates(
            q32,
            snap.matrix,
            idx,
            cand_g,
            k,
            metric=self.metric,
            corpus_sqnorms=snap.sqnorms,
        )
        return _finalize(vals, final_idx, self.metric)
