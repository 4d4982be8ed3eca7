#!/bin/bash
# Greedy/beam CTC decode + PER scoring (the reference's debug decode path,
# scripts/decode.sh:41-56): nnet-decode.py → int2sym → compute-wer.py.
# Fully self-contained (no WFST machinery).

set -u
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
BIN="$SCRIPT_DIR/../bin"
PYTHON=${PYTHON:-python3}

tfrecords_scp=
nnet_config=
nnet=            # optional; defaults to ../final.nnet relative to dir
units=           # symbol table mapping network indices to unit names
ans=             # reference text (utt-id units...)
dir=
beam_width=1

echo
echo "$0 $@"
echo

. "$SCRIPT_DIR/parse_options.sh" || exit 1

[ -z "$tfrecords_scp" ] && echo "(ERROR) missing --tfrecords-scp" && exit 1
[ -z "$nnet_config" ] && echo "(ERROR) missing --nnet-config" && exit 1
[ -z "$ans" ] && echo "(ERROR) missing --ans" && exit 1
[ -z "$units" ] && echo "(ERROR) missing --units" && exit 1
[ -z "$dir" ] && echo "(ERROR) missing --dir" && exit 1
for f in "$tfrecords_scp" "$nnet_config" "$ans" "$units"; do
  [ ! -e "$f" ] && echo "(ERROR) $f does not exist" && exit 1
done

if [ -z "$nnet" ]; then
  srcdir=$(dirname "$dir")
  nnet=$srcdir/$(cat "$srcdir/final.nnet")
fi

mkdir -p "$dir"
if [ ! -e "$dir/decode.done" ]; then
  echo "[$(date +'%Y/%m/%d %H:%M:%S')] decoding"
  $PYTHON "$BIN/nnet-decode.py" --beam-width "$beam_width" \
    "$tfrecords_scp" "$nnet_config" "$nnet" \
    "ark,t:$dir/res.txt" 2> "$dir/decode.log" || exit 1
  touch "$dir/decode.done"
else
  echo "[$(date +'%Y/%m/%d %H:%M:%S')] $dir/decode.done exists, skipping"
fi

"$SCRIPT_DIR/int2sym.pl" -f 2- "$units" < "$dir/res.txt" |
  $PYTHON "$BIN/compute-wer.py" "$ans" > "$dir/per"

grep "^summary" "$dir/per"
exit 0
