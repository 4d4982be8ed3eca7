#!/usr/bin/env python3
"""Estimate a bigram ARPA LM with add-one smoothing from training text.

Host-side stand-in for the IRSTLM/SRILM LM training step of the reference
recipes (reference egs/wsj/local/wsj_train_lms.sh).

Usage: train_lm.py <text> > lm.arpa
"""

import math
import sys
from collections import Counter, defaultdict


def log10(x):
    return math.log10(x) if x > 0 else -99.0


def main():
    unigrams = Counter()
    bigrams = Counter()
    with open(sys.argv[1], encoding="utf-8") as fh:
        for line in fh:
            words = line.split()[1:]
            if not words:
                continue
            seq = ["<s>"] + words + ["</s>"]
            for w in seq:
                unigrams[w] += 1
            for a, b in zip(seq, seq[1:]):
                bigrams[(a, b)] += 1
    vocab = sorted(unigrams)
    v_size = len(vocab)
    total = sum(unigrams.values())

    uni_prob = {}
    for w in vocab:
        uni_prob[w] = (unigrams[w] + 1.0) / (total + v_size)

    followers = defaultdict(list)
    for (a, b), c in bigrams.items():
        followers[a].append((b, c))

    print("\\data\\")
    print("ngram 1=%d" % v_size)
    print("ngram 2=%d" % len(bigrams))
    print()
    print("\\1-grams:")
    for w in vocab:
        # uniform backoff weight: mass reserved by add-one bigrams
        print("%.6f\t%s\t%.6f" % (log10(uni_prob[w]), w, -0.30103))
    print()
    print("\\2-grams:")
    for (a, b), c in sorted(bigrams.items()):
        prob = (c + 1.0) / (unigrams[a] + v_size)
        print("%.6f\t%s %s" % (log10(prob), a, b))
    print()
    print("\\end\\")


if __name__ == "__main__":
    main()
