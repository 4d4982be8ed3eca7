#!/usr/bin/env python3
"""Copy feature matrices between tables (Kaldi copy-feats equivalent).

Usage: copy-feats.py [--compress=true] <in-rspecifier> <out-wspecifier>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lstm_ctc_tpu import kaldi, logging_util as log
from lstm_ctc_tpu.featbin import parse_kaldi_flags

SPEC = {"compress": (bool, False)}


def main():
    opts, args = parse_kaldi_flags(sys.argv[1:], SPEC)
    if len(args) != 2:
        log.die("usage: copy-feats.py [--compress=bool] <rspec> <wspec>")
    holder = "matrix_compressed" if opts["compress"] else "matrix"
    done = 0
    with kaldi.TableWriter(args[1], holder) as writer:
        for key, mat in kaldi.SequentialTableReader(args[0], "matrix"):
            writer.Write(key, mat)
            done += 1
    log.info("copied %d feature matrices" % done)


if __name__ == "__main__":
    main()
