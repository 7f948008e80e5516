"""Tracing / profiling utilities.

The reference's only tracing is wall-clock logging around predict and
rerank (``classical.py:200-207,310-314``; SURVEY.md §5).  The rebuild
keeps those (``utils.metrics``) and adds device-level tracing:

  * `trace(dir)` — context manager around ``jax.profiler`` producing
    TensorBoard/xprof traces of the jit graphs and collectives;
  * `annotate(name)` — named trace spans (``jax.profiler.TraceAnnotation``)
    so engine stages (scan, rerank, merge) are visible on the timeline;
  * `stage_timer(name)` — wall-clock span recorded into GLOBAL_METRICS
    (shows up on the /stats endpoint).
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Iterator, Optional

from qrag_tpu.utils.metrics import GLOBAL_METRICS

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/qrag_trace") -> Iterator[str]:
    """Capture a jax.profiler trace (view with TensorBoard/xprof)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named span on the device timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def stage_timer(name: str) -> Iterator[None]:
    """Wall-clock stage span recorded into the metrics store."""
    with GLOBAL_METRICS.timer(name):
        yield


def device_memory_stats() -> Optional[dict]:
    """Per-device memory stats when the backend exposes them."""
    import jax

    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        return dict(stats) if stats else None
    except Exception:  # noqa: BLE001 - optional introspection
        return None
