#!/usr/bin/env python3
"""Count symbol occurrences in int-vector tables (Kaldi analyze-counts).

Produces the label-count vector consumed by --class-prior at forward time
(reference egs/wsj/run_wsj_phn.sh:198-207).

Usage: analyze-counts.py [--counts-dim=N] [--counts-offset=0]
           <in-rspecifier> <counts-wxfilename>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lstm_ctc_tpu import kaldi, logging_util as log
from lstm_ctc_tpu.featbin import parse_kaldi_flags

SPEC = {"counts_dim": (int, 0), "counts_offset": (int, 0),
        "binary": (bool, False)}


def main():
    opts, args = parse_kaldi_flags(sys.argv[1:], SPEC)
    if len(args) != 2:
        log.die("usage: analyze-counts.py [opts] <rspec> <out>")
    counts = np.zeros(max(opts["counts_dim"], 1), np.int64)
    for key, vec in kaldi.SequentialTableReader(args[0], "int32vec"):
        vec = np.asarray(vec) + opts["counts_offset"]
        if vec.size and vec.max() >= len(counts):
            counts = np.concatenate(
                [counts, np.zeros(int(vec.max()) + 1 - len(counts),
                                  np.int64)])
        np.add.at(counts, vec, 1)
    with kaldi.Output(args[1], binary=False, write_header=False) as out:
        out.stream().write(("[ " + " ".join(str(int(c)) for c in counts)
                            + " ]\n").encode("utf-8"))
    log.info("counted %d symbols, %d total occurrences"
             % (len(counts), int(counts.sum())))


if __name__ == "__main__":
    main()
