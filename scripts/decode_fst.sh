#!/bin/bash
# Simple WFST decode without lattices: forward → blank rotation →
# latgen-faster best path (protocol mirror of reference
# scripts/decode_fst.sh:59-101).

set -u
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
BIN="$SCRIPT_DIR/../bin"
PYTHON=${PYTHON:-python3}

tfrecords_scp=
nnet_config=
nnet=
graphdir=
label_counts=
smooth_factor=1.0
acwt=0.9
beam=15.0
max_active=7000
ntargets=72
dir=

echo
echo "$0 $@"
echo

. "$SCRIPT_DIR/parse_options.sh" || exit 1

[ -z "$tfrecords_scp" ] && echo "(ERROR) missing --tfrecords-scp" && exit 1
[ -z "$nnet_config" ] && echo "(ERROR) missing --nnet-config" && exit 1
[ -z "$graphdir" ] && echo "(ERROR) missing --graphdir" && exit 1
[ -z "$dir" ] && echo "(ERROR) missing --dir" && exit 1

if [ -z "$nnet" ]; then
  srcdir=$(dirname "$dir")
  nnet=$srcdir/$(cat "$srcdir/final.nnet")
  [ -z "$label_counts" ] && label_counts=$srcdir/label.counts
fi

LATGEN=$(command -v latgen-faster || true)
[ -z "$LATGEN" ] && [ -x "$SCRIPT_DIR/../native/build/latgen-faster" ] && \
  LATGEN="$SCRIPT_DIR/../native/build/latgen-faster"
[ -z "$LATGEN" ] && echo "$0: latgen-faster not found" && exit 1

mkdir -p "$dir"
$PYTHON "$BIN/nnet-forward.py" \
    --apply-log true \
    ${label_counts:+--class-prior "$label_counts"} \
    --smooth-factor "$smooth_factor" \
    "$tfrecords_scp" "$nnet_config" "$nnet" ark:- 2> "$dir/forward.log" |
  $PYTHON "$BIN/select-feats.py" \
    "$((ntargets-1)),0-$((ntargets-2))" ark:- ark:- 2>> "$dir/forward.log" |
  "$LATGEN" --max-active="$max_active" --beam="$beam" \
    --acoustic-scale="$acwt" --allow-partial=true \
    --word-symbol-table="$graphdir/words.txt" \
    "$graphdir/TLG.fst" ark:- "ark:|gzip -c > $dir/lat.gz" \
  2> "$dir/decode.log" || exit 1

echo "wrote $dir/lat.gz"
exit 0
