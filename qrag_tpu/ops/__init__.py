from qrag_tpu.ops.statevector import (
    encode_statevector,
    encode_product_amplitudes,
    apply_cx,
    apply_1q_gate,
    state_fidelity,
    fidelity_statevector,
    fidelity_analytic,
    batched_fidelity,
)
from qrag_tpu.ops.topk import l2_topk, ip_topk, cosine_scores, flat_scan_topk

__all__ = [
    "encode_statevector",
    "encode_product_amplitudes",
    "apply_cx",
    "apply_1q_gate",
    "state_fidelity",
    "fidelity_statevector",
    "fidelity_analytic",
    "batched_fidelity",
    "l2_topk",
    "ip_topk",
    "cosine_scores",
    "flat_scan_topk",
]
