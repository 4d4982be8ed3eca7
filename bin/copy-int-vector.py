#!/usr/bin/env python3
"""Copy int32-vector tables (Kaldi copy-int-vector equivalent).

Usage: copy-int-vector.py <in-rspecifier> <out-wspecifier>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lstm_ctc_tpu import kaldi, logging_util as log
from lstm_ctc_tpu.featbin import parse_kaldi_flags


def main():
    _, args = parse_kaldi_flags(sys.argv[1:], {"binary": (bool, True)})
    if len(args) != 2:
        log.die("usage: copy-int-vector.py <rspec> <wspec>")
    done = 0
    with kaldi.TableWriter(args[1], "int32vec") as writer:
        for key, vec in kaldi.SequentialTableReader(args[0], "int32vec"):
            writer.Write(key, vec)
            done += 1
    log.info("copied %d vectors" % done)


if __name__ == "__main__":
    main()
