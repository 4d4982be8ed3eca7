#!/usr/bin/env python3
"""Train an ARPA n-gram LM (interpolated modified Kneser-Ney + pruning).

Native replacement for the reference's kaldi_lm/SRILM/IRSTLM LM-training
step (reference local/wsj_train_lms.sh:1; the IRSTLM prune-lm call at
reference egs/wsj/run_wsj_phn.sh:34-39 corresponds to --prune here).

Examples:
  train-lm.py --order 3 data/train/text > lm.arpa
  train-lm.py --order 3 --prune 1e-7 --wordlist words.list text > tgpr.arpa
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from lstm_ctc_tpu.lm import perplexity, write_arpa
from lstm_ctc_tpu.lm.ngram import (
    count_ngrams_file,
    estimate_from_counts,
    read_sentences,
)


def main(args):
    min_counts = [int(c) for c in args.min_counts.split(",")] \
        if args.min_counts else None
    # counting runs in C++ (native/build/count-ngrams) when built — the
    # hot loop for big corpora; estimation on the (cutoff) counts is
    # Python (lm/ngram.py)
    raw = count_ngrams_file(args.text, args.order,
                            vocab_path=args.wordlist,
                            kaldi_text=not args.plain_text,
                            min_counts=min_counts)
    lm = estimate_from_counts(raw, args.order,
                              prune_threshold=args.prune)
    write_arpa(lm, sys.stdout)
    if args.ppl_text:
        heldout = list(read_sentences(args.ppl_text,
                                      kaldi_text=not args.plain_text))
        print("train-lm: heldout perplexity %.2f over %d sentences"
              % (perplexity(lm, heldout), len(heldout)), file=sys.stderr)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="ARPA LM trainer (interpolated modified Kneser-Ney)")
    parser.add_argument("text", help="training text (kaldi 'utt w1 w2...' "
                        "format unless --plain-text); - for stdin, .gz ok")
    parser.add_argument("--order", type=int, default=3)
    parser.add_argument("--wordlist", default=None,
                        help="vocabulary file (first column); OOVs → <unk>")
    parser.add_argument("--prune", type=float, default=0.0,
                        help="relative-entropy pruning threshold "
                        "(e.g. 1e-7; 0 = no pruning)")
    parser.add_argument("--min-counts", default=None,
                        help="comma list of per-order count cutoffs, "
                        "e.g. 1,1,2")
    parser.add_argument("--plain-text", action="store_true",
                        help="lines are raw sentences without utt ids")
    parser.add_argument("--ppl-text", default=None,
                        help="report held-out perplexity on this text "
                        "to stderr")
    main(parser.parse_args())
