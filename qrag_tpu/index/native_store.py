"""ctypes bindings for the native index store (``native/indexstore.cpp``).

`NativeVectorStore` is the host-runtime side of the index: an
mmap-backed append-only float32 row store with a binary manifest and a
C++ exact scan+top-k (heap selection, lower-index tie-break — matching
``lax.top_k`` and the Pallas kernel).  It plays the role faiss-cpu's
C++ played for the reference: durable index storage and a CPU scan
oracle; the TPU path loads from it via `to_device_index`.

The shared library auto-builds on first use (``make -C
qrag_tpu/native``; g++ is part of the image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libqidx.so")
_BUILD_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None

METRIC_IP = 0
METRIC_L2 = 1


def _build_library() -> None:
    subprocess.run(
        ["make", "-C", _NATIVE_DIR, "-s"],
        check=True,
        capture_output=True,
        text=True,
    )


def load_library() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_LIB_PATH):
            _build_library()
        lib = ctypes.CDLL(_LIB_PATH)
        c = ctypes
        lib.qidx_open.restype = c.c_void_p
        lib.qidx_open.argtypes = [c.c_char_p, c.c_uint32, c.c_uint32, c.c_uint32, c.c_int]
        lib.qidx_dim.restype = c.c_uint32
        lib.qidx_dim.argtypes = [c.c_void_p]
        lib.qidx_metric.restype = c.c_uint32
        lib.qidx_metric.argtypes = [c.c_void_p]
        lib.qidx_normalized.restype = c.c_uint32
        lib.qidx_normalized.argtypes = [c.c_void_p]
        lib.qidx_ntotal.restype = c.c_uint64
        lib.qidx_ntotal.argtypes = [c.c_void_p]
        lib.qidx_append.restype = c.c_int64
        lib.qidx_append.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_uint64]
        lib.qidx_read.restype = c.c_int
        lib.qidx_read.argtypes = [c.c_void_p, c.c_uint64, c.c_uint64, c.POINTER(c.c_float)]
        lib.qidx_flush.restype = c.c_int
        lib.qidx_flush.argtypes = [c.c_void_p]
        lib.qidx_close.restype = None
        lib.qidx_close.argtypes = [c.c_void_p]
        lib.qidx_scan_topk.restype = None
        lib.qidx_scan_topk.argtypes = [
            c.c_void_p, c.POINTER(c.c_float), c.c_uint64, c.c_uint32,
            c.POINTER(c.c_float), c.POINTER(c.c_int64),
        ]
        lib.qidx_raw_scan_topk.restype = None
        lib.qidx_raw_scan_topk.argtypes = [
            c.POINTER(c.c_float), c.c_uint64, c.c_uint32,
            c.POINTER(c.c_float), c.c_uint64, c.c_uint32, c.c_uint32,
            c.POINTER(c.c_float), c.POINTER(c.c_int64),
        ]
        lib.qidx_raw_scan_topk_mt.restype = None
        lib.qidx_raw_scan_topk_mt.argtypes = [
            c.POINTER(c.c_float), c.c_uint64, c.c_uint32,
            c.POINTER(c.c_float), c.c_uint64, c.c_uint32, c.c_uint32,
            c.c_uint32, c.POINTER(c.c_float), c.POINTER(c.c_int64),
        ]
        lib.qidx_scan_topk_mt.restype = None
        lib.qidx_scan_topk_mt.argtypes = [
            c.c_void_p, c.POINTER(c.c_float), c.c_uint64, c.c_uint32,
            c.c_uint32, c.POINTER(c.c_float), c.POINTER(c.c_int64),
        ]
        _LIB = lib
    return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeVectorStore:
    """mmap-backed append-only vector store (single writer, torn-read
    safe for concurrent readers)."""

    def __init__(
        self,
        path: str,
        d: int = 0,
        metric: str = "l2",
        normalized: bool = False,
        writable: bool = True,
    ):
        self._lib = load_library()
        metric_code = METRIC_L2 if metric == "l2" else METRIC_IP
        self._handle = self._lib.qidx_open(
            path.encode(), d, metric_code, int(normalized), int(writable)
        )
        if not self._handle:
            raise OSError(
                f"cannot open native store {path!r} "
                f"(missing file, bad magic, or d mismatch)"
            )
        self.path = path

    # ---------------------------------------------------------- properties

    @property
    def d(self) -> int:
        return int(self._lib.qidx_dim(self._handle))

    @property
    def ntotal(self) -> int:
        return int(self._lib.qidx_ntotal(self._handle))

    @property
    def metric(self) -> str:
        return "l2" if self._lib.qidx_metric(self._handle) == METRIC_L2 else "ip"

    @property
    def normalized(self) -> bool:
        return bool(self._lib.qidx_normalized(self._handle))

    # ------------------------------------------------------------------ ops

    def append(self, rows: np.ndarray) -> int:
        rows = np.ascontiguousarray(rows, dtype=np.float32)
        if rows.ndim != 2 or rows.shape[1] != self.d:
            raise ValueError(f"expected (*, {self.d}) rows, got {rows.shape}")
        total = self._lib.qidx_append(self._handle, _fptr(rows), rows.shape[0])
        if total < 0:
            raise OSError("append failed (read-only store or IO error)")
        return int(total)

    def read(self, start: int = 0, n: Optional[int] = None) -> np.ndarray:
        n = self.ntotal - start if n is None else n
        out = np.empty((n, self.d), np.float32)
        if n and self._lib.qidx_read(self._handle, start, n, _fptr(out)) != 0:
            raise IndexError(f"read [{start}, {start + n}) out of range")
        return out

    def flush(self) -> None:
        self._lib.qidx_flush(self._handle)

    def scan_topk(
        self, queries: np.ndarray, k: int, threads: int = 1
    ) -> Tuple[np.ndarray, np.ndarray]:
        """C++ exact scan: (scores, indices); L2 distances ascending /
        IP descending, -1 indices when ntotal < k.  ``threads``: 1 =
        the deterministic single-thread oracle; 0 = all cores; >1 =
        exactly that many (query-parallel for batches, corpus-split +
        merge for small batches — results identical either way)."""
        queries = np.ascontiguousarray(queries, dtype=np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        b = queries.shape[0]
        scores = np.empty((b, k), np.float32)
        idx = np.empty((b, k), np.int64)
        out_i = idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        if threads == 1:
            self._lib.qidx_scan_topk(
                self._handle, _fptr(queries), b, k, _fptr(scores), out_i
            )
        else:
            self._lib.qidx_scan_topk_mt(
                self._handle, _fptr(queries), b, k, threads,
                _fptr(scores), out_i,
            )
        return scores, idx

    def close(self) -> None:
        if self._handle:
            self._lib.qidx_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # ------------------------------------------------------------- bridges

    def to_device_index(self, **kwargs):
        """Load into the TPU-resident DeviceFlatIndex."""
        from qrag_tpu.index.flat_index import DeviceFlatIndex

        return DeviceFlatIndex.from_numpy(
            self.read(), metric=self.metric, **kwargs
        )


def cpu_scan_topk(
    x: np.ndarray,
    queries: np.ndarray,
    k: int,
    metric: str = "l2",
    threads: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """C++ exact scan over a raw matrix (no store) — the CPU oracle
    (threads=1) and its parallel serving variant (threads=0 → all
    cores; identical results, tie order included)."""
    lib = load_library()
    x = np.ascontiguousarray(x, dtype=np.float32)
    queries = np.ascontiguousarray(queries, dtype=np.float32)
    if queries.ndim == 1:
        queries = queries[None, :]
    b = queries.shape[0]
    scores = np.empty((b, k), np.float32)
    idx = np.empty((b, k), np.int64)
    out_i = idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    metric_code = METRIC_L2 if metric == "l2" else METRIC_IP
    if threads == 1:
        lib.qidx_raw_scan_topk(
            _fptr(x), x.shape[0], x.shape[1], _fptr(queries), b, k,
            metric_code, _fptr(scores), out_i,
        )
    else:
        lib.qidx_raw_scan_topk_mt(
            _fptr(x), x.shape[0], x.shape[1], _fptr(queries), b, k,
            metric_code, threads, _fptr(scores), out_i,
        )
    return scores, idx
