#!/bin/bash
# Build the TLG decode graph: CTC token FST ∘ min(det(Lexicon ∘ Grammar)).
# Protocol mirror of reference local/make_TLG.sh:20-92, using this repo's
# native fst-tools (OpenFst-free).
#
# usage: make_TLG.sh <dict-src-dir> <lm.arpa> <out-lang-dir>
#   dict-src-dir must contain: lexicon.txt ("WORD phone phone ..."),
#   units.txt ("phone id" starting at 1, no <eps>/<blk>)

set -euo pipefail
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
BIN="$SCRIPT_DIR/../bin"
PYTHON=${PYTHON:-python3}
FSTBIN=${FSTBIN:-$SCRIPT_DIR/../native/build}

if [ $# != 3 ]; then
  echo "usage: make_TLG.sh <dict-src-dir> <lm-arpa[.gz]> <lang-dir>" && exit 1
fi
srcdir=$1
arpa=$2
dir=$3
tmpdir=$dir/tmp
mkdir -p "$dir" "$tmpdir"

# the OpenSLR/Kaldi LMs ship gzipped; decompress for the native arpa2fst
case "$arpa" in
  *.gz) gunzip -c "$arpa" > "$tmpdir/lm.arpa"; arpa=$tmpdir/lm.arpa ;;
esac

[ ! -f "$srcdir/lexicon.txt" ] && echo "missing $srcdir/lexicon.txt" && exit 1
[ ! -f "$srcdir/units.txt" ] && echo "missing $srcdir/units.txt" && exit 1

# lexicon with pron-probs column
perl -ape 's/(\S+\s+)(.+)/${1}1.0\t$2/;' < "$srcdir/lexicon.txt" \
  > "$tmpdir/lexiconp.txt"

ndisambig=$("$SCRIPT_DIR/add_lex_disambig.pl" --pron-probs \
  "$tmpdir/lexiconp.txt" "$tmpdir/lexiconp_disambig.txt")
ndisambig=$((ndisambig + 1))

# tokens.txt: <eps>, <blk>, units, disambig symbols
(for n in $(seq 0 $ndisambig); do echo "#$n"; done) > "$tmpdir/disambig.list"
awk '{print $1}' "$srcdir/units.txt" > "$tmpdir/units.list"
(echo '<eps>'; echo '<blk>';) | cat - "$tmpdir/units.list" \
  "$tmpdir/disambig.list" | awk '{print $1 " " (NR-1)}' > "$dir/tokens.txt"

# T.fst: CTC blank/collapse topology
$PYTHON "$BIN/ctc-token-fst.py" "$dir/tokens.txt" |
  "$FSTBIN/fst-tools" compile --isymbols="$dir/tokens.txt" \
    --osymbols="$dir/tokens.txt" - - |
  "$FSTBIN/fst-tools" arcsort --sort_type=olabel - "$dir/T.fst"

# words.txt
awk '{print $1}' "$tmpdir/lexiconp.txt" | sort -u | awk '
  BEGIN { print "<eps> 0"; }
  { printf("%s %d\n", $1, NR); }
  END { printf("#0 %d\n", NR+1); }' > "$dir/words.txt"

token_disambig=$(grep '^#0 ' "$dir/tokens.txt" | awk '{print $2}')
word_disambig=$(grep '^#0 ' "$dir/words.txt" | awk '{print $2}')

# L.fst: lexicon (no optional silence — CTC blank plays that role,
# reference make_TLG.sh:60-67 passes silprob 0)
"$SCRIPT_DIR/make_lexicon_fst.pl" --pron-probs \
    "$tmpdir/lexiconp_disambig.txt" 0 "sil" "#$ndisambig" |
  "$FSTBIN/fst-tools" compile --isymbols="$dir/tokens.txt" \
    --osymbols="$dir/words.txt" - - |
  "$FSTBIN/fst-tools" addselfloops "$token_disambig" "$word_disambig" - - |
  "$FSTBIN/fst-tools" arcsort --sort_type=olabel - "$dir/L.fst"

# G.fst from the ARPA LM
"$FSTBIN/fst-tools" arpa2fst --disambig-symbol='#0' \
    --read-symbol-table="$dir/words.txt" "$arpa" - |
  "$FSTBIN/fst-tools" arcsort --sort_type=ilabel - "$dir/G.fst"

echo "composing L.fst and G.fst -> $tmpdir/LG.fst"
"$FSTBIN/fst-tools" compose "$dir/L.fst" "$dir/G.fst" - |
  "$FSTBIN/fst-tools" determinizestar - - |
  "$FSTBIN/fst-tools" minimizeencoded - - |
  "$FSTBIN/fst-tools" arcsort --sort_type=ilabel - "$tmpdir/LG.fst"

echo "composing T.fst and LG.fst -> $dir/TLG.fst"
"$FSTBIN/fst-tools" compose "$dir/T.fst" "$tmpdir/LG.fst" "$dir/TLG.fst"

"$FSTBIN/fst-tools" info "$dir/TLG.fst"
echo "make_TLG.sh: done"
