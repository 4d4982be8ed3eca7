#!/bin/bash
# Re-label syllable transcripts as phone AND syllable CTC targets
# (equivalent of reference local/make_phone_syll.sh:1-48): syllable
# symbols are underscore-joined phones ("k_ae_t"); splitting them yields
# the phone transcript, and each granularity gets its own symbol table
# (with <blk> appended) plus an int-vector ark/scp pair for training.
#
# usage: make_phone_syll.sh --trans-file <labels.scp> \
#            --trans-table <syms.txt> --tgt-dir <dir>

set -eu
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO="$(cd "$SCRIPT_DIR/../../.." && pwd)"
SCRIPTS=$REPO/scripts
BIN=$REPO/bin
PYTHON=${PYTHON:-python3}

trans_file=
trans_table=
tgt_dir=

. "$SCRIPTS/parse_options.sh" || exit 1
[ -z "$trans_file" ] || [ -z "$trans_table" ] || [ -z "$tgt_dir" ] && \
  { echo "need --trans-file --trans-table --tgt-dir"; exit 1; }

tmpdir=$tgt_dir/tmp
mkdir -p "$tgt_dir" "$tmpdir"

# ints → syllable symbols
$PYTHON "$BIN/copy-int-vector.py" "scp:$trans_file" ark,t:- |
  "$SCRIPTS/int2sym.pl" -f 2- "$trans_table" > "$tmpdir/trans.syll"

# syllables → phones (split on "_")
cut -d" " -f2- "$tmpdir/trans.syll" | tr "_" " " > "$tmpdir/ph.txt"
cut -d" " -f1 "$tmpdir/trans.syll" > "$tmpdir/ids.txt"
paste -d" " "$tmpdir/ids.txt" "$tmpdir/ph.txt" > "$tmpdir/trans.ph"

# symbol tables (training units observed in the data, <blk> appended)
awk '{for (i = 2; i <= NF; i++) print $i}' "$tmpdir/trans.syll" |
  sort -u > "$tmpdir/syllables.txt"
echo "<blk>" >> "$tmpdir/syllables.txt"
awk '{print $0 " " NR-1}' "$tmpdir/syllables.txt" \
  > "$tgt_dir/trans.syll.txt"

awk '{for (i = 2; i <= NF; i++) print $i}' "$tmpdir/trans.ph" |
  sort -u > "$tmpdir/phones.txt"
echo "<blk>" >> "$tmpdir/phones.txt"
awk '{print $0 " " NR-1}' "$tmpdir/phones.txt" > "$tgt_dir/trans.ph.txt"

# re-encode both granularities as int-vector archives
sym2int() {  # table, stdin text transcripts → int text
  awk -v tab="$1" '
    BEGIN { while ((getline line < tab) > 0) { split(line, a, " ");
                                               id[a[1]] = a[2] } }
    { s = $1
      for (i = 2; i <= NF; i++) s = s " " id[$i]
      print s }'
}
sym2int "$tgt_dir/trans.ph.txt" < "$tmpdir/trans.ph" |
  $PYTHON "$BIN/copy-int-vector.py" ark:- \
    "ark,scp:$tgt_dir/feats_ph.ark,$tgt_dir/feats_ph.scp"
sym2int "$tgt_dir/trans.syll.txt" < "$tmpdir/trans.syll" |
  $PYTHON "$BIN/copy-int-vector.py" ark:- \
    "ark,scp:$tgt_dir/feats_syll.ark,$tgt_dir/feats_syll.scp"

echo "make_phone_syll.sh: wrote phone + syllable targets in $tgt_dir"
