#!/bin/bash
# Forward pass only: write (log-)posteriors for a test set
# (protocol mirror of reference scripts/test.sh:1-67).

set -u
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
BIN="$SCRIPT_DIR/../bin"
PYTHON=${PYTHON:-python3}

tfrecords_scp=
nnet_config=
nnet=
class_prior=
smooth_factor=1.0
apply_log=true
dir=

echo
echo "$0 $@"
echo

. "$SCRIPT_DIR/parse_options.sh" || exit 1

[ -z "$tfrecords_scp" ] && echo "(ERROR) missing --tfrecords-scp" && exit 1
[ -z "$nnet_config" ] && echo "(ERROR) missing --nnet-config" && exit 1
[ -z "$dir" ] && echo "(ERROR) missing --dir" && exit 1

if [ -z "$nnet" ]; then
  srcdir=$(dirname "$dir")
  nnet=$srcdir/$(cat "$srcdir/final.nnet")
fi

mkdir -p "$dir"
$PYTHON "$BIN/nnet-forward.py" \
  --apply-log "$apply_log" --smooth-factor "$smooth_factor" \
  ${class_prior:+--class-prior "$class_prior"} \
  "$tfrecords_scp" "$nnet_config" "$nnet" \
  "ark:$dir/post.ark" 2> "$dir/forward.log" || exit 1

echo "wrote $dir/post.ark"
exit 0
