#!/bin/bash
# Prepare a character lexicon for char-CTC: every word spells itself
# (protocol mirror of reference local/wsj_prepare_char_dict.sh).
# Produces data/local/dict_char/{units.txt,lexicon.txt,lexicon_numbers.txt}.
#
# usage: wsj_prepare_char_dict.sh <word-list-or-lexicon>

set -eu
if [ $# != 1 ]; then
  echo "usage: wsj_prepare_char_dict.sh <word-list>" && exit 1
fi
words_in=$1
dir=data/local/dict_char
mkdir -p "$dir"

# spell each word into space-separated characters; apostrophes kept,
# other punctuation dropped; noise words map to a noise unit
awk '{print $1}' "$words_in" | sort -u |
  perl -ne 'chomp; my $w = $_;
    next if $w =~ m/^</;                      # markers handled below
    my @c = grep { $_ =~ m/[A-Za-z0-9'\''.-]/ } split //, uc($w);
    next unless @c;
    print "$w @c\n";' > "$dir/lexicon_chars.txt"

(echo "<UNK> <nsn>"; echo "<NOISE> <nsn>") |
  cat - "$dir/lexicon_chars.txt" | sort -u > "$dir/lexicon.txt"

awk '{for (i=2;i<=NF;i++) print $i}' "$dir/lexicon.txt" | sort -u |
  awk '{print $1 " " NR}' > "$dir/units.txt"

awk 'NR==FNR {unit[$1]=$2; next}
     {printf("%s", $1); for (i=2;i<=NF;i++) printf(" %d", unit[$i]);
      print ""}' "$dir/units.txt" "$dir/lexicon.txt" \
  > "$dir/lexicon_numbers.txt"

echo "wsj_prepare_char_dict.sh: $(wc -l < "$dir/units.txt") char units"
