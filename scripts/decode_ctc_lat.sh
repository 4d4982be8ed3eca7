#!/bin/bash
# Lattice decoding of a CTC model through an EESEN-style TLG WFST graph.
# Protocol mirror of reference scripts/decode_ctc_lat.sh: split data,
# per-job feature pipe → record conversion → nnet-forward with
# class-prior-scaled log posteriors → blank rotation (select-feats
# n-1,0-(n-2)) → latgen-faster over TLG.fst → gzipped lattices → scoring.
#
# Feature prep, conversion and forward use this framework's native tools;
# the WFST stage uses `latgen-faster` — either EESEN's from PATH or this
# repo's native/ build (see native/README.md).

set -u
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
BIN="$SCRIPT_DIR/../bin"
PYTHON=${PYTHON:-python3}

stage=0
nj=16
cmd="$SCRIPT_DIR/run.pl"
num_threads=1

acwt=0.9
min_active=200
max_active=7000
beam=15.0
lattice_beam=8.0
max_mem=50000000
mdl=final.nnet
label_counts=
nnet=
nnet_config=

skip_scoring=false
scoring_opts="--min-acwt 1 --max-acwt 20"

norm_vars=
add_deltas=
subsample_feats=
splice_feats=
subsample_frames=2
ntargets=72
smooth_factor=1

echo "$0 $@"

. "$SCRIPT_DIR/parse_options.sh" || exit 1

if [ $# != 3 ]; then
  echo "usage: decode_ctc_lat.sh [options] <graph-dir> <data-dir> <decode-dir>"
  exit 1
fi
graphdir=$1
data=$2
dir=${3%/}

srcdir=$(dirname "$dir")
sdata=$data/split$nj

[ -z "$label_counts" ] && label_counts=${srcdir}/label.counts
[ -z "$add_deltas" ] && add_deltas=$(cat "$srcdir/add_deltas" 2>/dev/null || echo false)
[ -z "$norm_vars" ] && norm_vars=$(cat "$srcdir/norm_vars" 2>/dev/null || echo true)
[ -z "$subsample_feats" ] && subsample_feats=$(cat "$srcdir/subsample_feats" 2>/dev/null || echo false)
[ -z "$splice_feats" ] && splice_feats=$(cat "$srcdir/splice_feats" 2>/dev/null || echo false)

mkdir -p "$dir/log"
"$SCRIPT_DIR/split_data.sh" "$data" "$nj" || exit 1
echo "$nj" > "$dir/num_jobs"

for f in "$graphdir/TLG.fst" "$data/feats.scp"; do
  [ ! -f "$f" ] && echo "$0: no such file $f" && exit 1
done

# locate a latgen-faster binary: PATH (EESEN) or this repo's native build
LATGEN=$(command -v latgen-faster || true)
[ -z "$LATGEN" ] && [ -x "$SCRIPT_DIR/../native/build/latgen-faster" ] && \
  LATGEN="$SCRIPT_DIR/../native/build/latgen-faster"
[ -z "$LATGEN" ] && echo "$0: latgen-faster not found (install EESEN or build native/)" && exit 1

## feature pipe (native featbin tools)
echo "$0: feature: norm_vars($norm_vars) add_deltas($add_deltas) subsample_feats($subsample_feats) splice_feats($splice_feats)"
feats="ark,s,cs:$PYTHON $BIN/apply-cmvn.py --norm-vars=$norm_vars --utt2spk=ark:$sdata/JOB/utt2spk scp:$sdata/JOB/cmvn.scp scp:$sdata/JOB/feats.scp ark:- |"
$splice_feats && feats="$feats $PYTHON $BIN/splice-feats.py --left-context=1 --right-context=1 ark:- ark:- |"
$subsample_feats && feats="$feats $PYTHON $BIN/subsample-feats.py --n=$subsample_frames ark:- ark:- |"
$add_deltas && feats="$feats $PYTHON $BIN/add-deltas.py ark:- ark:- |"

if [ $stage -le 0 ] && [ ! -e "$dir/records.done" ]; then
  echo "converting records"
  $cmd JOB=1:"$nj" "$dir/log/records.JOB.log" \
    $PYTHON "$BIN/convert-to-records.py" --check-length false \
      "$feats" "$sdata/JOB" "$sdata/JOB/tfrecords.scp" || exit 1
  for n in $(seq "$nj"); do cat "$sdata/$n/tfrecords.scp"; done \
    | sort -k1,1 -u > "$dir/tfrecords.scp"
  touch "$dir/records.done"
fi

if [ -z "$nnet" ]; then
  nnet=$srcdir/$(cat "$srcdir/final.nnet")
  nnet_config=$srcdir/nnet.config
  echo "$nnet"
fi

# invalidate cached posteriors when the model changed (the reference's
# bare .done markers silently scored stale posteriors here)
if [ -e "$dir/forward.done" ] && \
   [ "$(cat "$dir/forward.done" 2>/dev/null)" != "$nnet" ]; then
  echo "model changed since last forward; redoing inference"
  rm -f "$dir/forward.done"
fi

if [ ! -e "$dir/forward.done" ]; then
  echo "[$(date +'%Y/%m/%d %H:%M:%S')] computing inference for posteriors"
  ( $PYTHON "$BIN/nnet-forward.py" \
      --apply-log true \
      --class-prior "$label_counts" \
      --smooth-factor "$smooth_factor" \
      "$dir/tfrecords.scp" "$nnet_config" "$nnet" ark:- |
    $PYTHON "$BIN/copy-feats.py" ark:- \
      "ark,scp:$(readlink -f "$dir")/post.ark,$dir/post.scp" ) \
    2> "$dir/forward.log" || exit 1
  echo "$nnet" > "$dir/forward.done"
else
  echo "$dir/forward.done exists, skipping inference"
fi

echo "[$(date +'%Y/%m/%d %H:%M:%S')] generate lattice"
# rotate <blk> from position n-1 back to position 0 (EESEN's order)
for n in $(seq "$nj"); do
  "$SCRIPT_DIR/split_scp.pl" -j "$nj" $((n-1)) "$dir/post.scp" "$dir/post.$n.scp"
done

$cmd JOB=1:"$nj" "$dir/log/decode.JOB.log" \
  $PYTHON "$BIN/copy-feats.py" "scp:$dir/post.JOB.scp" ark:- \| \
  $PYTHON "$BIN/select-feats.py" "$((ntargets-1)),0-$((ntargets-2))" ark:- ark:- \| \
  "$LATGEN" --max-active="$max_active" --max-mem="$max_mem" --beam="$beam" \
    --lattice-beam="$lattice_beam" --acoustic-scale="$acwt" \
    --allow-partial=true --word-symbol-table="$graphdir/words.txt" \
    "$graphdir/TLG.fst" ark:- "ark:|gzip -c > $dir/lat.JOB.gz" || exit 1

echo "[$(date +'%Y/%m/%d %H:%M:%S')] scoring"
if ! $skip_scoring; then
  if [ -f "$data/stm" ] && command -v sclite >/dev/null; then
    # sclite scoring path (reference decode_ctc_lat.sh:176-183)
    "$SCRIPT_DIR/score_sclite.sh" $scoring_opts --cmd "$cmd" \
      "$data" "$graphdir" "$dir" || exit 1
  else
    [ -f "$data/stm" ] && \
      echo "$0: stm present but sclite not installed; using score.sh"
    "$SCRIPT_DIR/score.sh" $scoring_opts --cmd "$cmd" "$data" "$graphdir" \
      "$dir" || exit 1
  fi
fi
exit 0
