#!/bin/bash
# Prepare the LibriSpeech phoneme dictionary (units.txt, lexicon.txt,
# lexicon_numbers.txt) from a phoneme lexicon file — the reference uses
# librispeech_phn_reduced_dict.txt (run_libri_ph.sh; the blob is not in
# the repo, see .MISSING_LARGE_BLOBS).
#
# usage: libri_prepare_phn_dict.sh <phoneme-lexicon>

set -eu
if [ $# != 1 ]; then
  echo "usage: libri_prepare_phn_dict.sh <phoneme-lexicon>" && exit 1
fi
lexicon=$1
dir=data/local/dict_phn
mkdir -p "$dir"

(echo "<UNK> nsn"; cat "$lexicon") | sort -u > "$dir/lexicon.txt"

awk '{for (i=2;i<=NF;i++) print $i}' "$dir/lexicon.txt" | sort -u |
  awk '{print $1 " " NR}' > "$dir/units.txt"

awk 'NR==FNR {unit[$1]=$2; next}
     {printf("%s", $1); for (i=2;i<=NF;i++) printf(" %d", unit[$i]);
      print ""}' "$dir/units.txt" "$dir/lexicon.txt" \
  > "$dir/lexicon_numbers.txt"

echo "libri_prepare_phn_dict.sh: $(wc -l < "$dir/units.txt") units"
