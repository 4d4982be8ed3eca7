#!/bin/bash
# Rescore decode lattices with a large const-arpa LM — protocol mirror of
# Kaldi's steps/lmrescore_const_arpa.sh as used by the reference for its
# headline numbers (reference egs/wsj/run_wsj_phn.sh:279-286,
# egs/libri/run_libri_ph.sh:333-337): subtract the old G.fst scores, add
# the new LM's via the mmap-able packed-trie (G.carpa), re-run scoring.
#
# usage: lmrescore_const_arpa.sh [--cmd ...] <old-lang-dir> <new-lang-dir> \
#            <data-dir> <in-decode-dir> <out-decode-dir>
# <new-lang-dir> must contain G.carpa (see build_const_arpa_lm.sh).

set -eu
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
FSTBIN=${FSTBIN:-$SCRIPT_DIR/../native/build}

cmd="$SCRIPT_DIR/run.pl"
skip_scoring=false
min_acwt=1
max_acwt=20
prune_beam=8    # bound composed-lattice growth (states multiply by the
                # number of LM histories on the rescored paths)

. "$SCRIPT_DIR/parse_options.sh" || exit 1

if [ $# != 5 ]; then
  echo "usage: lmrescore_const_arpa.sh <old-lang> <new-lang> <data>" \
       "<in-dir> <out-dir>"
  exit 1
fi
oldlang=$1
newlang=$2
data=$3
indir=$4
outdir=$5

for f in "$oldlang/G.fst" "$newlang/G.carpa" "$indir/lat.1.gz"; do
  [ ! -f "$f" ] && echo "lmrescore_const_arpa.sh: no such file $f" && exit 1
done
mkdir -p "$outdir"
nj=$(cat "$indir/num_jobs")
echo "$nj" > "$outdir/num_jobs"

$cmd JOB=1:"$nj" "$outdir/rescore.JOB.log" \
  gunzip -c "$indir/lat.JOB.gz" \| \
  "$FSTBIN/lattice-lmrescore" --lm-scale=-1.0 ark:- "$oldlang/G.fst" \
    ark:- \| \
  "$FSTBIN/lattice-lmrescore-const-arpa" --lm-scale=1.0 \
    --prune-beam="$prune_beam" ark:- \
    "$newlang/G.carpa" "ark:|gzip -c > $outdir/lat.JOB.gz" || exit 1

if ! $skip_scoring; then
  "$SCRIPT_DIR/score.sh" --min-acwt "$min_acwt" --max-acwt "$max_acwt" \
    --cmd "$cmd" "$data" "$newlang" "$outdir" || exit 1
fi
exit 0
