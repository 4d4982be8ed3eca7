#!/usr/bin/env python3
"""Keep one frame in every n (Kaldi subsample-feats equivalent).

Usage: subsample-feats.py [--n=1] <rspec> <wspec>

Note: like Kaldi, the output has ceil(T/n) frames (frames 0, n, 2n, ...).
The in-pipeline training subsampler keeps floor(T/n) frames to match the
reference's TF gather semantics (nnet/tfrecord.py:43-51); this tool is for
feature-prep pipes where Kaldi parity is what matters.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lstm_ctc_tpu import kaldi, logging_util as log
from lstm_ctc_tpu.featbin import parse_kaldi_flags

SPEC = {"n": (int, 1)}


def main():
    opts, args = parse_kaldi_flags(sys.argv[1:], SPEC)
    if len(args) != 2:
        log.die("usage: subsample-feats.py [--n=N] <rspec> <wspec>")
    n = opts["n"]
    done = 0
    with kaldi.TableWriter(args[1], "matrix") as writer:
        for key, mat in kaldi.SequentialTableReader(args[0], "matrix"):
            writer.Write(key, np.asarray(mat, np.float32)[::n])
            done += 1
    log.info("subsampled %d utterances" % done)


if __name__ == "__main__":
    main()
