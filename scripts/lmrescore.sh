#!/bin/bash
# Rescore decode lattices with a different (usually larger) LM —
# protocol mirror of the reference's steps/lmrescore_const_arpa.sh usage
# (egs/wsj/run_wsj_phn.sh:279-286): subtract the old G scores, add the
# new ones, re-run the scoring sweep.
#
# usage: lmrescore.sh [--cmd ...] <old-lang-dir> <new-lang-dir> \
#            <data-dir> <in-decode-dir> <out-decode-dir>

set -eu
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
FSTBIN=${FSTBIN:-$SCRIPT_DIR/../native/build}

cmd="$SCRIPT_DIR/run.pl"
skip_scoring=false
min_acwt=1
max_acwt=20
prune_beam=8    # bound composed-lattice growth

. "$SCRIPT_DIR/parse_options.sh" || exit 1

if [ $# != 5 ]; then
  echo "usage: lmrescore.sh <old-lang> <new-lang> <data> <in-dir> <out-dir>"
  exit 1
fi
oldlang=$1
newlang=$2
data=$3
indir=$4
outdir=$5

for f in "$oldlang/G.fst" "$newlang/G.fst" "$indir/lat.1.gz"; do
  [ ! -f "$f" ] && echo "lmrescore.sh: no such file $f" && exit 1
done
mkdir -p "$outdir"
nj=$(cat "$indir/num_jobs")
echo "$nj" > "$outdir/num_jobs"
cp "$oldlang/words.txt" "$outdir/../words.txt" 2>/dev/null || true

$cmd JOB=1:"$nj" "$outdir/rescore.JOB.log" \
  gunzip -c "$indir/lat.JOB.gz" \| \
  "$FSTBIN/lattice-lmrescore" --lm-scale=-1.0 ark:- "$oldlang/G.fst" ark:- \| \
  "$FSTBIN/lattice-lmrescore" --lm-scale=1.0 --prune-beam="$prune_beam" \
    ark:- "$newlang/G.fst" \
    "ark:|gzip -c > $outdir/lat.JOB.gz" || exit 1

if ! $skip_scoring; then
  "$SCRIPT_DIR/score.sh" --min-acwt "$min_acwt" --max-acwt "$max_acwt" \
    --cmd "$cmd" "$data" "$newlang" "$outdir" || exit 1
fi
exit 0
