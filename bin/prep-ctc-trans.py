#!/usr/bin/env python3
"""Map word transcripts to CTC phone-label sequences via a numbered
lexicon (equivalent of EESEN's utils/prep_ctc_trans.py used by the
reference recipes, egs/wsj/run_wsj_phn.sh:131,137).

Usage: prep-ctc-trans.py <lexicon_numbers.txt> <text> <UNK-word> [> out]

lexicon_numbers.txt lines: "WORD id1 id2 ..." (unit ids, 1-based).
Output lines: "utt-id id id id ..." — one entry per utterance; OOV words
map to the <UNK-word> pronunciation.
"""

import sys


def main():
    if len(sys.argv) != 4:
        sys.stderr.write(
            "usage: prep-ctc-trans.py <lexicon_numbers> <text> <unk>\n")
        sys.exit(1)
    lex_path, text_path, unk = sys.argv[1], sys.argv[2], sys.argv[3]
    lexicon = {}
    with open(lex_path, encoding="utf-8") as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                lexicon[parts[0]] = parts[1:]
    if unk not in lexicon:
        sys.stderr.write("warning: %s not in lexicon; OOVs dropped\n" % unk)
    with open(text_path, encoding="utf-8") as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            out = [parts[0]]
            for word in parts[1:]:
                pron = lexicon.get(word) or lexicon.get(unk)
                if pron:
                    out.extend(pron)
            print(" ".join(out))


if __name__ == "__main__":
    main()
