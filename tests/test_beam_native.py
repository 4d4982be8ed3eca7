"""Native C++ CTC prefix beam search vs the pure-Python specification.

The native library (native/src/ctc_beam.cc) must produce identical paths
to ops.decode.beam_search_decode_py for the same pruning settings; it is
the fast path behind bin/nnet-decode.py (the reference's equivalent is
TF's in-graph C++ ctc_beam_search_decoder, nnet/graph.py:267-272).
"""

import numpy as np
import pytest

from lstm_ctc_tpu.ops.beam_native import available, beam_search_decode_native
from lstm_ctc_tpu.ops.decode import beam_search_decode_py, greedy_decode

pytestmark = pytest.mark.skipif(
    not available(), reason="libctc_beam.so not built")


def random_log_probs(rng, T, V):
    x = rng.randn(T, V).astype(np.float32) * 2.0
    x = x - np.log(np.sum(np.exp(x), axis=1, keepdims=True))
    return x


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("T,V,beam", [(20, 8, 4), (50, 30, 10),
                                      (13, 5, 2)])
def test_native_matches_python(seed, T, V, beam):
    rng = np.random.RandomState(seed)
    lp = random_log_probs(rng, T, V)
    ref = beam_search_decode_py(lp, beam_width=beam, top_paths=min(beam, 3))
    got = beam_search_decode_native(lp, beam_width=beam,
                                    top_paths=min(beam, 3))
    assert got == ref


def test_native_blank_id_and_empty():
    rng = np.random.RandomState(99)
    lp = random_log_probs(rng, 15, 6)
    ref = beam_search_decode_py(lp, beam_width=4, blank_id=0)
    got = beam_search_decode_native(lp, beam_width=4, blank_id=0)
    assert got == ref
    # all-blank input decodes to the empty sequence
    peaked = np.full((10, 4), -20.0, np.float32)
    peaked[:, 3] = 0.0
    assert beam_search_decode_native(peaked, beam_width=4) == [[]]


def test_native_sums_paths_over_alignments():
    # the classic case where beam search beats greedy by summing
    # alignments: P(a)=0.4, P(blank)=0.6 per frame → P([a])=0.64 > 0.36
    lp = np.log(np.array([[0.4, 0.6], [0.4, 0.6]], np.float32))
    assert beam_search_decode_native(lp, beam_width=4, blank_id=1)[0] == [0]


def test_native_agrees_with_greedy_on_peaked_input():
    V, blank = 5, 4
    path = [0, blank, 1, 1, blank, 2, 3]
    lp = np.full((len(path), V), -10.0, np.float32)
    for t, c in enumerate(path):
        lp[t, c] = 0.0
    assert beam_search_decode_native(lp, beam_width=4)[0] == [0, 1, 2, 3]
    assert greedy_decode(lp[None], np.array([len(path)]))[0] == [0, 1, 2, 3]
