#!/usr/bin/env python3
"""Append delta (and delta-delta) features (Kaldi add-deltas equivalent).

Usage: add-deltas.py [--delta-order=2] [--delta-window=2] <rspec> <wspec>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lstm_ctc_tpu import kaldi, logging_util as log
from lstm_ctc_tpu.data.features import add_deltas
from lstm_ctc_tpu.featbin import parse_kaldi_flags

SPEC = {"delta_order": (int, 2), "delta_window": (int, 2)}


def main():
    opts, args = parse_kaldi_flags(sys.argv[1:], SPEC)
    if len(args) != 2:
        log.die("usage: add-deltas.py [opts] <rspec> <wspec>")
    done = 0
    with kaldi.TableWriter(args[1], "matrix") as writer:
        for key, mat in kaldi.SequentialTableReader(args[0], "matrix"):
            writer.Write(key, add_deltas(np.asarray(mat, np.float32),
                                         opts["delta_order"],
                                         opts["delta_window"]))
            done += 1
    log.info("added deltas to %d utterances" % done)


if __name__ == "__main__":
    main()
