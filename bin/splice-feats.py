#!/usr/bin/env python3
"""Splice frames with left/right context (Kaldi splice-feats equivalent).

Usage: splice-feats.py [--left-context=4] [--right-context=4]
           <rspec> <wspec>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lstm_ctc_tpu import kaldi, logging_util as log
from lstm_ctc_tpu.data.pipeline import splice_frames
from lstm_ctc_tpu.featbin import parse_kaldi_flags

SPEC = {"left_context": (int, 4), "right_context": (int, 4)}


def main():
    opts, args = parse_kaldi_flags(sys.argv[1:], SPEC)
    if len(args) != 2:
        log.die("usage: splice-feats.py [opts] <rspec> <wspec>")
    done = 0
    with kaldi.TableWriter(args[1], "matrix") as writer:
        for key, mat in kaldi.SequentialTableReader(args[0], "matrix"):
            writer.Write(key, splice_frames(np.asarray(mat, np.float32),
                                            opts["left_context"],
                                            opts["right_context"]))
            done += 1
    log.info("spliced %d utterances" % done)


if __name__ == "__main__":
    main()
