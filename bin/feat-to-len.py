#!/usr/bin/env python3
"""Print per-utterance frame counts (Kaldi feat-to-len equivalent).

Usage: feat-to-len.py <in-rspecifier> [<out-wxfilename>]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lstm_ctc_tpu import kaldi, logging_util as log
from lstm_ctc_tpu.featbin import parse_kaldi_flags


def main():
    _, args = parse_kaldi_flags(sys.argv[1:], {})
    if len(args) not in (1, 2):
        log.die("usage: feat-to-len.py <rspec> [<out>]")
    out = open(args[1], "w") if len(args) == 2 and args[1] != "-" \
        else sys.stdout
    for key, mat in kaldi.SequentialTableReader(args[0], "matrix"):
        out.write("%s %d\n" % (key, mat.shape[0]))
    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
