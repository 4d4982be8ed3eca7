#!/usr/bin/env python3
"""Emit the CTC token FST (T) in text format from a tokens.txt table.

CLI mirror of reference local/ctc_token_fst.py.
Usage: ctc-token-fst.py <tokens.txt> > T.fst.txt
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lstm_ctc_tpu.wfst import ctc_token_fst_text

if __name__ == "__main__":
    if len(sys.argv) != 2:
        sys.stderr.write("usage: ctc-token-fst.py <tokens.txt>\n")
        sys.exit(1)
    with open(sys.argv[1]) as fh:
        sys.stdout.write(ctc_token_fst_text(fh))
