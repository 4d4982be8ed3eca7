"""ctypes bridge to the native CTC prefix beam search.

The reference runs beam search through TF's in-graph C++
``ctc_beam_search_decoder`` (reference nnet/graph.py:267-272); here the
equivalent fast path is ``native/build/libctc_beam.so`` (prefix beam
search over log-posteriors, native/src/ctc_beam.cc).  The pure-Python
implementation in ``ops.decode`` is the semantic specification and the
fallback when the library is absent; ``LSTM_CTC_TPU_NATIVE_BEAM=0``
disables the native path explicitly.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB = None
_CHECKED = False


def _library():
    global _LIB, _CHECKED
    if _CHECKED:
        return _LIB
    _CHECKED = True
    if os.environ.get("LSTM_CTC_TPU_NATIVE_BEAM", "1") == "0":
        return None
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))),
        "native", "build", "libctc_beam.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.ctc_beam_search.restype = ctypes.c_int
    lib.ctc_beam_search.argtypes = [
        ctypes.POINTER(ctypes.c_float),   # log_probs [T, V]
        ctypes.c_int, ctypes.c_int,       # T, V
        ctypes.c_int, ctypes.c_int,       # beam_width, blank_id
        ctypes.c_int, ctypes.c_int,       # top_paths, topk_per_frame
        ctypes.POINTER(ctypes.c_int32),   # out_labels
        ctypes.POINTER(ctypes.c_int32),   # out_lens
        ctypes.c_int,                     # max_labels
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _library() is not None


def beam_search_decode_native(log_probs: np.ndarray,
                              beam_width: int = 10,
                              blank_id: Optional[int] = None,
                              top_paths: int = 1,
                              topk_per_frame: Optional[int] = None
                              ) -> List[List[int]]:
    """Native prefix beam search; same contract as
    ``ops.decode.beam_search_decode`` (including its default per-frame
    class pruning of max(2*beam_width, 8))."""
    lib = _library()
    if lib is None:
        raise RuntimeError("libctc_beam.so not built")
    lp = np.ascontiguousarray(np.asarray(log_probs, dtype=np.float32))
    num_frames, num_classes = lp.shape
    if blank_id is None:
        blank_id = num_classes - 1
    if topk_per_frame is None:
        topk_per_frame = max(beam_width * 2, 8)  # decode.py:103 semantics
    max_labels = max(1, top_paths * num_frames)
    out_labels = np.empty(max_labels, dtype=np.int32)
    out_lens = np.empty(max(1, top_paths), dtype=np.int32)
    n = lib.ctc_beam_search(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_frames, num_classes, int(beam_width), int(blank_id),
        int(top_paths), int(topk_per_frame),
        out_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_labels)
    if n < 0:
        raise RuntimeError("ctc_beam_search failed (invalid args or "
                           "output capacity)")
    paths, off = [], 0
    for i in range(n):
        length = int(out_lens[i])
        paths.append([int(v) for v in out_labels[off:off + length]])
        off += length
    return paths
