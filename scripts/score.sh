#!/bin/bash
# Lattice scoring: acoustic-scale sweep → best path → WER
# (protocol mirror of reference local/score.sh:1-59).

set -u
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
BIN="$SCRIPT_DIR/../bin"
PYTHON=${PYTHON:-python3}

cmd="$SCRIPT_DIR/run.pl"
stage=0
min_acwt=1
max_acwt=20
acwt_factor=0.1

. "$SCRIPT_DIR/parse_options.sh" || exit 1

if [ $# -ne 3 ]; then
  echo "usage: score.sh [--cmd ...] <data-dir> <lang-or-graph-dir> <decode-dir>"
  exit 1
fi
data=$1
lang_or_graph=$2
dir=$3

symtab=$lang_or_graph/words.txt
for f in "$symtab" "$dir/lat.1.gz" "$data/text"; do
  [ ! -f "$f" ] && echo "score.sh: no such file $f" && exit 1
done

# lattice tools: PATH (Kaldi/EESEN) or the native build
for tool in lattice-scale lattice-best-path; do
  if ! command -v $tool >/dev/null && \
     [ ! -x "$SCRIPT_DIR/../native/build/$tool" ]; then
    echo "score.sh: $tool not found (install Kaldi/EESEN or build native/)"
    exit 1
  fi
done
LATTICE_SCALE=$(command -v lattice-scale || echo "$SCRIPT_DIR/../native/build/lattice-scale")
LATTICE_BEST_PATH=$(command -v lattice-best-path || echo "$SCRIPT_DIR/../native/build/lattice-best-path")

mkdir -p "$dir/scoring/log"
sed 's:<UNK>::g; s:<NOISE>::g; s:<SPOKEN_NOISE>::g' "$data/text" \
  > "$dir/scoring/test_filt.txt"

$cmd ACWT=$min_acwt:$max_acwt "$dir/scoring/log/best_path.ACWT.log" \
  "$LATTICE_SCALE" --acoustic-scale=ACWT --ascale-factor=$acwt_factor \
    "ark:gunzip -c $dir/lat.*.gz|" ark:- \| \
  "$LATTICE_BEST_PATH" --word-symbol-table="$symtab" \
    ark:- ark,t:"$dir/scoring/ACWT.tra" || exit 1

for acwt in $(seq "$min_acwt" "$max_acwt"); do
  "$SCRIPT_DIR/int2sym.pl" -f 2- "$symtab" < "$dir/scoring/${acwt}.tra" |
    sed 's:<UNK>::g; s:<NOISE>::g; s:<SPOKEN_NOISE>::g' |
    $PYTHON "$BIN/compute-wer.py" "$dir/scoring/test_filt.txt" \
    > "$dir/wer_$acwt" 2>/dev/null || exit 1
done

grep -H "^summary" "$dir"/wer_* | sort -t: -k2 | head -3
exit 0
