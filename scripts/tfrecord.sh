#!/bin/bash
# Parallel conversion of Kaldi features (+labels) into record shards.
# Protocol mirror of reference scripts/tfrecord.sh: split the feature scp
# nj ways, per-job pipe copy-feats|apply-cmvn into the converter, merge
# the per-job scps.  The feature pipe uses this framework's native
# featbin tools (no Kaldi installation needed); set --featbin kaldi to
# use real Kaldi binaries from PATH instead.

set -u
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
BIN="$SCRIPT_DIR/../bin"
PYTHON=${PYTHON:-python3}

feats_scp=
trans_scp=
cmvn_ark=
dir=

check_length=false
target_length_cutoff=0  # skip utterances with <= this many labels
norm_vars=true
add_deltas=false # append Δ+ΔΔ after CMVN (reference conversion pipe
                 # run_wsj_phn.sh:162-168 'add-deltas'); the WSJ/libri
                 # recipes need this so record dims match input_dim
nj=8
cmd="$SCRIPT_DIR/run.pl"
featbin=native   # native | kaldi

echo
echo "$0 $@"
echo

. "$SCRIPT_DIR/parse_options.sh" || exit 1

[ -z "$feats_scp" ] && echo "(ERROR) missing --feats-scp" && exit 1
[ -z "$cmvn_ark" ] && echo "(ERROR) missing --cmvn-ark" && exit 1
[ -z "$dir" ] && echo "(ERROR) missing --dir" && exit 1
[ ! -e "$feats_scp" ] && echo "(ERROR) $feats_scp does not exist" && exit 1
[ ! -e "$cmvn_ark" ] && echo "(ERROR) $cmvn_ark does not exist" && exit 1
[ -n "$trans_scp" ] && [ ! -e "$trans_scp" ] && \
  echo "(ERROR) $trans_scp does not exist" && exit 1

mkdir -p "$dir" "$dir/split${nj}" "$dir/log"

echo "[$(date +'%Y/%m/%d %H:%M:%S')] generating records in $dir"
echo "splitting $nj jobs in $dir/split${nj}"
for n in $(seq "$nj"); do
  subdir=$dir/split${nj}/$n
  mkdir -p "$subdir"
  "$SCRIPT_DIR/split_scp.pl" -j "$nj" $((n-1)) "$feats_scp" "$subdir/feats.scp"
  if [ -n "$trans_scp" ]; then
    "$SCRIPT_DIR/filter_scp.pl" -f 1 "$subdir/feats.scp" \
      < "$trans_scp" > "$subdir/trans.scp"
  fi
done

subdir=$(readlink -f "$dir")/split${nj}/JOB
if [ "$featbin" == "kaldi" ]; then
  copy_feats="copy-feats"
  apply_cmvn="apply-cmvn"
  add_deltas_bin="add-deltas"
else
  copy_feats="$PYTHON $BIN/copy-feats.py"
  apply_cmvn="$PYTHON $BIN/apply-cmvn.py"
  add_deltas_bin="$PYTHON $BIN/add-deltas.py"
fi
nnet_input="ark:$copy_feats scp:$subdir/feats.scp ark:- |"
nnet_input="$nnet_input $apply_cmvn --norm-means=true --norm-vars=$norm_vars $cmvn_ark ark:- ark:- |"
$add_deltas && nnet_input="$nnet_input $add_deltas_bin ark:- ark:- |"
nnet_target=
[ -n "$trans_scp" ] && nnet_target="scp:$subdir/trans.scp"

echo "converting records"
$cmd JOB=1:"$nj" "$dir/log/records.JOB.log" \
  $PYTHON "$BIN/convert-to-records.py" \
    --check-length "$check_length" \
    --target-length-cutoff "$target_length_cutoff" \
    ${nnet_target:+--nnet-target "$nnet_target"} \
    "$nnet_input" "$subdir" "$subdir/tfrecords.scp" || exit 1

echo "creating list of all records in $dir/tfrecords.scp"
for n in $(seq "$nj"); do
  cat "$dir/split${nj}/$n/tfrecords.scp"
done | sort -k1,1 -u > "$dir/tfrecords.scp"

echo "[$(date +'%Y/%m/%d %H:%M:%S')] done"
echo
exit 0
