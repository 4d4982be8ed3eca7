#!/bin/bash
# sclite-based lattice scoring (protocol mirror of the reference's
# local/score_sclite.sh dispatch, decode_ctc_lat.sh:176-183): best paths
# over the acoustic-scale sweep → ctm-style hypothesis → sclite against
# $data/stm.  Requires NIST SCTK's `sclite` on PATH.

set -eu
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
FSTBIN=${FSTBIN:-$SCRIPT_DIR/../native/build}

cmd="$SCRIPT_DIR/run.pl"
min_acwt=1
max_acwt=20
acwt_factor=0.1

. "$SCRIPT_DIR/parse_options.sh" || exit 1

if [ $# -ne 3 ]; then
  echo "usage: score_sclite.sh [--cmd ...] <data> <lang-or-graph> <dir>"
  exit 1
fi
data=$1
lang_or_graph=$2
dir=$3
symtab=$lang_or_graph/words.txt

command -v sclite >/dev/null || { echo "score_sclite.sh: sclite not on PATH"; exit 1; }
for f in "$symtab" "$dir/lat.1.gz" "$data/stm"; do
  [ ! -f "$f" ] && echo "score_sclite.sh: no such file $f" && exit 1
done

LATTICE_SCALE=$(command -v lattice-scale || echo "$FSTBIN/lattice-scale")
LATTICE_BEST_PATH=$(command -v lattice-best-path || echo "$FSTBIN/lattice-best-path")

mkdir -p "$dir/scoring/log"
$cmd ACWT=$min_acwt:$max_acwt "$dir/scoring/log/best_path.ACWT.log" \
  "$LATTICE_SCALE" --acoustic-scale=ACWT --ascale-factor=$acwt_factor \
    "ark:gunzip -c $dir/lat.*.gz|" ark:- \| \
  "$LATTICE_BEST_PATH" --word-symbol-table="$symtab" \
    ark:- ark,t:"$dir/scoring/ACWT.tra" || exit 1

for acwt in $(seq "$min_acwt" "$max_acwt"); do
  # trn format: "words (utt-id)"
  "$SCRIPT_DIR/int2sym.pl" -f 2- "$symtab" < "$dir/scoring/${acwt}.tra" |
    awk '{id=$1; $1=""; printf("%s (%s)\n", substr($0,2), id)}' \
    > "$dir/scoring/${acwt}.trn"
  sclite -h "$dir/scoring/${acwt}.trn" trn -r "$data/stm" stm \
    -i rm -o all -O "$dir/score_$acwt" > /dev/null || exit 1
done
grep -H "Sum/Avg" "$dir"/score_*/*.sys 2>/dev/null | head -3 || true
exit 0
