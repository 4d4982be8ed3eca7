#!/usr/bin/env python3
"""Print the feature dimension (Kaldi feat-to-dim equivalent).

Usage: feat-to-dim.py <in-rspecifier> [-]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lstm_ctc_tpu import kaldi, logging_util as log
from lstm_ctc_tpu.featbin import parse_kaldi_flags


def main():
    _, args = parse_kaldi_flags(sys.argv[1:], {})
    if not args:
        log.die("usage: feat-to-dim.py <rspec> [-]")
    for _, mat in kaldi.SequentialTableReader(args[0], "matrix"):
        print(mat.shape[1])
        return
    log.die("no features read from %s" % args[0])


if __name__ == "__main__":
    main()
