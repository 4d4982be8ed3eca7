#!/usr/bin/env python3
"""Print the decode-index → train-index permutation for posterior reorder.

Behavior mirror of reference bin/reorder-posterior.py:19-43: reads two
symbol tables (``phone index`` per line), maps every decode-side symbol to
its training-side index, and pins decode index 0 (``<eps>``) to the
training ``<blank>`` index.  Output: comma-separated permutation, usable
with Kaldi ``select-feats`` (the shipped decode path instead uses the
static ``n-1,0-(n-2)`` rotation, reference scripts/decode_ctc_lat.sh:163).
"""

import sys


def read_symbol_table(path):
    table = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                table[parts[0]] = int(parts[-1])
    return table


def main():
    if len(sys.argv) != 3:
        sys.stderr.write(
            "usage: reorder-posterior.py <train-symtab> <decode-symtab>\n")
        sys.exit(1)
    train = read_symbol_table(sys.argv[1])
    decode = read_symbol_table(sys.argv[2])
    size = max(decode.values()) + 1
    mapping = [None] * size
    for phone, index in decode.items():
        mapping[index] = train[phone]
    mapping[0] = train["<blank>"]
    print(",".join(str(m) for m in mapping))


if __name__ == "__main__":
    main()
