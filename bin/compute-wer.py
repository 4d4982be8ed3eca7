#!/usr/bin/env python3
"""WER scorer with Unicode-aware tokenization and aligned pretty-printing.

Behavior mirror of reference bin/compute-wer.py:21-303:
  * lines are ``<utt-id> <text...>``; text splits on spaces AND on
    alphanumeric↔CJK category boundaries;
  * ``--to-character`` splits CJK ("Lo"-category) tokens into characters,
    ``--to-lower`` lowercases non-CJK tokens;
  * Levenshtein alignment with backtrace; per-utterance
    ``<id> wer: E num: N cor: C sub: S ins: I del: D`` lines followed by
    width-aligned ref:/rec: rows (East-Asian width aware), and a summary
    block framed by '=' rules.

Usage: cat <recognition> | compute-wer.py [--to-character] [--to-lower]
       <reference>
"""

import argparse
import sys
import unicodedata


def tokenize(text):
    """Split into words: spaces separate; alnum runs and CJK runs form
    separate tokens (each CJK char adjacency stays one token here —
    splitting happens in normalize)."""
    tokens = []
    word = ""
    prev_kind = None
    for char in text:
        cat = unicodedata.category(char)
        if cat == "Zs" or char.isspace():
            kind = "space"
        elif cat in ("Lu", "Ll", "Nd"):
            kind = "alnum"
        else:
            kind = "other"
        if kind == "space" or kind != prev_kind:
            if word:
                tokens.append(word)
            word = "" if kind == "space" else char
        else:
            word += char
        prev_kind = kind
    if word:
        tokens.append(word)
    return tokens


def normalize(tokens, to_character=False, to_lower=False):
    out = []
    for tok in tokens:
        if to_character and unicodedata.category(tok[0]) == "Lo":
            out.extend(tok)
        elif to_lower and unicodedata.category(tok[0]) != "Lo":
            out.append(tok.lower())
        else:
            out.append(tok)
    return out


def parse_line(line, to_character, to_lower):
    parts = line.strip().split(None, 1)
    if not parts:
        return None, []
    fid = parts[0]
    text = parts[1] if len(parts) > 1 else ""
    return fid, normalize(tokenize(text), to_character, to_lower)


DIAG, DEL, INS = 3, 1, 2


def align(ref, rec):
    """Levenshtein DP + backtrace → aligned rows with None for gaps."""
    m, n = len(ref), len(rec)
    dist = [[0] * (n + 1) for _ in range(m + 1)]
    bptr = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        dist[i][0] = i
        bptr[i][0] = DEL
    for j in range(1, n + 1):
        dist[0][j] = j
        bptr[0][j] = INS
    for i in range(1, m + 1):
        row, prev = dist[i], dist[i - 1]
        for j in range(1, n + 1):
            sub = prev[j - 1] + (ref[i - 1] != rec[j - 1])
            dele = prev[j] + 1
            ins = row[j - 1] + 1
            best = min(dele, ins, sub)
            row[j] = best
            # tie-break order matches the reference: del, ins, diag
            bptr[i][j] = DEL if best == dele else (
                INS if best == ins else DIAG)
    a_ref, a_rec = [], []
    i, j = m, n
    while i > 0 or j > 0:
        move = bptr[i][j]
        if move == DIAG:
            a_ref.append(ref[i - 1])
            a_rec.append(rec[j - 1])
            i, j = i - 1, j - 1
        elif move == INS:
            a_ref.append(None)
            a_rec.append(rec[j - 1])
            j -= 1
        else:
            a_ref.append(ref[i - 1])
            a_rec.append(None)
            i -= 1
    return a_ref[::-1], a_rec[::-1]


def count_errors(a_ref, a_rec):
    N = C = S = I = D = 0
    for r, h in zip(a_ref, a_rec):
        if r is None:
            I += 1
        else:
            N += 1
            if h is None:
                D += 1
            elif r != h:
                S += 1
            else:
                C += 1
    return N, C, S, I, D


def display_width(token):
    return sum(2 if unicodedata.east_asian_width(c) in "AFW" else 1
               for c in token)


def pad_rows(a_ref, a_rec):
    out_ref, out_rec = [], []
    for r, h in zip(a_ref, a_rec):
        if r is None:
            r = " " * display_width(h)
        elif h is None:
            h = " " * display_width(r)
        else:
            w = max(display_width(r), display_width(h))
            r = r + " " * (w - display_width(r))
            h = h + " " * (w - display_width(h))
        out_ref.append(r)
        out_rec.append(h)
    return out_ref, out_rec


def main(args):
    refs = {}
    with open(args.reference, encoding="utf-8") as fh:
        for line in fh:
            fid, words = parse_line(line, args.to_character, args.to_lower)
            if fid is not None:
                refs[fid] = words

    N = C = S = I = D = 0
    for line in sys.stdin:
        fid, rec = parse_line(line, args.to_character, args.to_lower)
        if fid is None:
            continue
        ref = refs[fid]
        a_ref, a_rec = align(ref, rec)
        n, c, s, i, d = count_errors(a_ref, a_rec)
        N, C, S, I, D = N + n, C + c, S + s, I + i, D + d
        wer = float(n + i - c) / n if n else 0.0
        print("%s wer: %.4f num: %d cor: %d sub: %d ins: %d del: %d"
              % (fid, wer, n, c, s, i, d))
        p_ref, p_rec = pad_rows(a_ref, a_rec)
        print(" ".join([fid, "ref:"] + p_ref))
        print(" ".join([fid, "rec:"] + p_rec))

    print("\n" + "=" * 80 + "\n")
    wer = float(N + I - C) / N if N else 0.0
    print("summary wer: %.4f num: %d cor: %d sub: %d ins: %d del: %d"
          % (wer, N, C, S, I, D))
    print("\n" + "=" * 80)


def str2bool(v):
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


if __name__ == "__main__":
    usage = ("cat <recognition> | compute-wer.py [-h] "
             "[--to-character (bool)] [--to-lower (bool)] <reference>")
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, usage=usage)
    parser.add_argument("reference", metavar="<reference>", type=str,
                        help="reference text.")
    parser.add_argument("--to-character", metavar="to-character",
                        type=str2bool, default="false",
                        help="whether to split CJK words into characters.")
    parser.add_argument("--to-lower", metavar="to-lower",
                        type=str2bool, default="false",
                        help="whether to lowercase non-CJK words.")
    args = parser.parse_args()
    sys.stderr.write(" ".join(sys.argv) + "\n\n")
    main(args)
