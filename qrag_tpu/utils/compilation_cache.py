"""Persistent XLA compilation cache.

Compiles through the remote TPU tunnel cost ~30-60s per graph; the
persistent cache makes warm restarts near-instant (the serving
equivalent of the reference caching its CrossEncoder weights to disk,
``classical.py:82-99``).  Off by default only if QRAG_NO_COMPILE_CACHE
is set.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_ENABLED = False
DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "qrag_tpu_xla"
)


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Idempotently enable the persistent compilation cache."""
    global _ENABLED
    if _ENABLED or os.environ.get("QRAG_NO_COMPILE_CACHE"):
        return _ENABLED
    try:
        import jax

        # TPU only: compiles through the remote tunnel cost 30-300s and
        # cache hits are a huge win; CPU compiles are cheap locally and
        # CPU AOT artifacts are machine-feature-fragile (SIGILL risk
        # when reused across hosts)
        if jax.default_backend() != "tpu":
            return False
        path = cache_dir or os.environ.get(
            "QRAG_COMPILE_CACHE_DIR", DEFAULT_CACHE_DIR
        )
        path = os.path.join(path, jax.default_backend())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _ENABLED = True
    except Exception as e:  # noqa: BLE001 - cache is best-effort
        logger.warning("could not enable compilation cache: %s", e)
    return _ENABLED
