#!/bin/bash
# Expand the character lexicon with frequent OOV words from the WSJ LM
# training text (equivalent of reference local/wsj_expand_vocab.sh:1-85).
# Character-based entries need no G2P: a word's "pronunciation" is its
# character spelling, so any OOV whose characters are all in units.txt
# can be added directly.
#
# usage: wsj_expand_vocab.sh [--min-count N] <wsj1-lm-train-np_data-dir> \
#            <dict-src-dir> <dict-larger-dir>
# The first argument holds the {87,88,89}/*.z WSJ LM training text
# (…/wsj1/doc/lng_modl/lm_train/np_data).

set -eu
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
min_count=2

. "$SCRIPT_DIR/../../../scripts/parse_options.sh" || exit 1

if [ $# -ne 3 ]; then
  echo "usage: wsj_expand_vocab.sh <np_data-dir> <dict-src> <dict-larger>"
  exit 1
fi
np_data=$1
srcdir=$2
dir=$3

mkdir -p "$dir"
cp "$srcdir/lexicon.txt" "$dir/lexicon.ori.txt"
cp "$srcdir/units.txt" "$dir"
awk '{print $1}' "$dir/lexicon.ori.txt" | sort -u > "$dir/wordlist.ori"

if [ ! -s "$dir/cleaned.gz" ]; then
  echo "wsj_expand_vocab.sh: cleaning the LM training text"
  # drop SGML-ish markup lines, uppercase, split trailing periods off
  # non-lexicon tokens (sentence-final periods glued to words)
  gunzip -c "$np_data"/{87,88,89}/*.z 2>/dev/null |
    awk '/^</{next}{print toupper($0)}' |
    awk -v words="$dir/wordlist.ori" '
      BEGIN { while ((getline w < words) > 0) seen[w] = 1 }
      { out = ""
        for (i = 1; i <= NF; i++) {
          t = $i
          if (!(t in seen) && t ~ /^[^.]+\.$/) {
            sub(/\.$/, "", t)
            print out t; out = ""
          } else { out = out t " " }
        }
        if (out != "") print out
      }' | gzip -c > "$dir/cleaned.gz"
fi

echo "wsj_expand_vocab.sh: counting OOV unigrams"
gunzip -c "$dir/cleaned.gz" | tr -s ' ' '\n' |
  awk '{c[$1]++} END{for (w in c) print c[w], w}' | sort -nr \
  > "$dir/unigrams"
awk -v dict="$dir/wordlist.ori" \
  'BEGIN{while((getline<dict)>0) seen[$1]=1} !seen[$2]' \
  "$dir/unigrams" > "$dir/oov.counts"
echo "most frequent unseen unigrams:"
head "$dir/oov.counts"

# OOVs above the count threshold → character-spelled lexicon entries,
# keeping only words whose characters are all known units
awk -v t="$min_count" '$1 >= t {print $2}' "$dir/oov.counts" \
  > "$dir/oovlist"
awk '{ s = $1; for (i = 1; i <= length($1); i++)
         s = s " " substr($1, i, 1); print s }' "$dir/oovlist" \
  > "$dir/lexicon.oov.txt"
awk -v units="$dir/units.txt" '
  BEGIN { while ((getline line < units) > 0) { split(line, a, " ");
                                               unit[a[1]] = 1 } }
  { ok = 1
    for (i = 2; i <= NF; i++) if (!($i in unit)) { ok = 0; break }
    if (ok) print }' "$dir/lexicon.oov.txt" > "$dir/lexicon.oov.filt.txt"

cat "$dir/lexicon.ori.txt" "$dir/lexicon.oov.filt.txt" > "$dir/lexicon.txt"
# numeric lexicon via units.txt ids
awk -v units="$dir/units.txt" '
  BEGIN { while ((getline line < units) > 0) { split(line, a, " ");
                                               id[a[1]] = a[2] } }
  { s = $1
    for (i = 2; i <= NF; i++) s = s " " id[$i]
    print s }' "$dir/lexicon.txt" > "$dir/lexicon_numbers.txt"

echo "wsj_expand_vocab.sh: added $(wc -l < "$dir/lexicon.oov.filt.txt")" \
     "OOV entries → $dir/lexicon.txt"
