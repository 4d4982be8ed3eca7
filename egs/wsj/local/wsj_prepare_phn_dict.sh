#!/bin/bash
# Prepare the phone lexicon from the CMU dictionary: units.txt,
# lexicon.txt, lexicon_numbers.txt under data/local/dict_phn.
# Protocol mirror of reference local/wsj_prepare_phn_dict.sh:28-53
# (stress markers stripped, noise word mapped to a noise phone).
#
# usage: wsj_prepare_phn_dict.sh <cmudict.0.7a>

set -eu
if [ $# != 1 ]; then
  echo "usage: wsj_prepare_phn_dict.sh <cmudict>" && exit 1
fi
cmudict=$1
dir=data/local/dict_phn
mkdir -p "$dir"

# strip comments, alternate-pronunciation markers "(N)" and stress digits
grep -v '^;;;' "$cmudict" |
  perl -ne 'chomp; @a=split;
    $w=shift @a; $w =~ s/\(\d+\)$//;
    @p = map { $x=$_; $x =~ s/\d//g; lc($x) } @a;
    print "$w @p\n";' | sort -u > "$dir/lexicon1_raw.txt"

(echo "<UNK> nsn"; echo "<NOISE> nsn") |
  cat - "$dir/lexicon1_raw.txt" | sort -u > "$dir/lexicon.txt"

awk '{for (i=2;i<=NF;i++) print $i}' "$dir/lexicon.txt" | sort -u |
  awk '{print $1 " " NR}' > "$dir/units.txt"

# lexicon with unit numbers
awk 'NR==FNR {unit[$1]=$2; next}
     {printf("%s", $1); for (i=2;i<=NF;i++) printf(" %d", unit[$i]);
      print ""}' "$dir/units.txt" "$dir/lexicon.txt" \
  > "$dir/lexicon_numbers.txt"

echo "wsj_prepare_phn_dict.sh: prepared $(wc -l < "$dir/units.txt") units"
