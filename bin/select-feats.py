#!/usr/bin/env python3
"""Select/permute feature columns (Kaldi select-feats equivalent).

Usage: select-feats.py <ranges> <rspec> <wspec>
e.g. the blank-rotation used before EESEN decode
(reference scripts/decode_ctc_lat.sh:163):
  select-feats.py 71,0-70 ark:- ark:-
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lstm_ctc_tpu import kaldi, logging_util as log
from lstm_ctc_tpu.featbin import parse_column_ranges, parse_kaldi_flags


def main():
    _, args = parse_kaldi_flags(sys.argv[1:], {})
    if len(args) != 3:
        log.die("usage: select-feats.py <ranges> <rspec> <wspec>")
    indices = parse_column_ranges(args[0])
    done = 0
    with kaldi.TableWriter(args[2], "matrix") as writer:
        for key, mat in kaldi.SequentialTableReader(args[1], "matrix"):
            writer.Write(key, np.ascontiguousarray(
                np.asarray(mat, np.float32)[:, indices]))
            done += 1
    log.info("selected columns for %d utterances" % done)


if __name__ == "__main__":
    main()
