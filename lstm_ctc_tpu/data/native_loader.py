"""ctypes bridge to the native record-shard batch assembler.

When ``native/build/librecord_loader.so`` is present (built with the
toolkit, see native/README.md) the bucketed pipeline assembles batch rows
in C++ — one fused read+splice+subsample+pad pass per utterance — instead
of the numpy path.  Falls back silently to Python when the library is
absent; ``LSTM_CTC_TPU_NATIVE_LOADER=0`` disables it explicitly.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional

import numpy as np

_LIB = None
_CHECKED = False


def _library():
    global _LIB, _CHECKED
    if _CHECKED:
        return _LIB
    _CHECKED = True
    if os.environ.get("LSTM_CTC_TPU_NATIVE_LOADER", "1") == "0":
        return None
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))),
        "native", "build", "librecord_loader.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.rl_open.restype = ctypes.c_void_p
    lib.rl_open.argtypes = [ctypes.c_char_p]
    lib.rl_close.argtypes = [ctypes.c_void_p]
    lib.rl_load_row.restype = ctypes.c_int32
    lib.rl_load_row.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _library() is not None


class NativeRecordLoader:
    """Per-shard handles over the C library; drop-in for the row-assembly
    part of BucketedBatcher.assemble."""

    def __init__(self):
        self._lib = _library()
        if self._lib is None:
            raise RuntimeError("native record loader not available")
        self._handles: Dict[str, int] = {}

    def _handle(self, path: str) -> int:
        handle = self._handles.get(path)
        if handle is None:
            handle = self._lib.rl_open(path.encode("utf-8"))
            if not handle:
                raise IOError("cannot open shard %s" % path)
            self._handles[path] = handle
        return handle

    def load_row(self, meta, left: int, right: int, subsample: int,
                 feats_row: np.ndarray, labels_row: np.ndarray) -> int:
        """Fill one batch row in place; returns the frame count.
        feats_row: [T_pad, D*(1+l+r)] float32 (zeroed);
        labels_row: [U_pad] int32 (pre-filled -1)."""
        label_len = ctypes.c_int32(0)
        frames = self._lib.rl_load_row(
            self._handle(meta.path), meta.offset,
            left, right, subsample or 0,
            feats_row.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            feats_row.shape[0],
            labels_row.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            labels_row.shape[0],
            ctypes.byref(label_len))
        if frames < 0:
            raise IOError("native loader failed at %s:%d"
                          % (meta.path, meta.offset))
        return frames, int(label_len.value)

    def close(self) -> None:
        for handle in self._handles.values():
            self._lib.rl_close(handle)
        self._handles.clear()
