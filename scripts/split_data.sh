#!/bin/bash
# Split a Kaldi-style data dir (feats.scp, utt2spk, cmvn.scp, text) into
# N per-job subsets under $data/splitN/ (minimal fresh implementation of
# the Kaldi utils/split_data.sh contract).

set -u
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"

if [ $# != 2 ]; then
  echo "usage: split_data.sh <data-dir> <num-jobs>" && exit 1
fi
data=$1
nj=$2

[ ! -f "$data/feats.scp" ] && echo "split_data.sh: no $data/feats.scp" && exit 1

mkdir -p "$data/split$nj"
for n in $(seq "$nj"); do
  subdir=$data/split$nj/$n
  mkdir -p "$subdir"
  "$SCRIPT_DIR/split_scp.pl" -j "$nj" $((n-1)) "$data/feats.scp" \
    "$subdir/feats.scp"
  for f in utt2spk text wav.scp; do
    if [ -f "$data/$f" ]; then
      "$SCRIPT_DIR/filter_scp.pl" -f 1 "$subdir/feats.scp" \
        < "$data/$f" > "$subdir/$f"
    fi
  done
  # cmvn.scp is keyed by speaker — filter by this split's speakers
  if [ -f "$data/cmvn.scp" ] && [ -f "$subdir/utt2spk" ]; then
    awk '{print $2}' "$subdir/utt2spk" | sort -u > "$subdir/.spklist"
    "$SCRIPT_DIR/filter_scp.pl" -f 1 "$subdir/.spklist" \
      < "$data/cmvn.scp" > "$subdir/cmvn.scp"
    rm -f "$subdir/.spklist"
  fi
  if [ -f "$data/spk2utt" ] && [ -f "$subdir/utt2spk" ]; then
    awk '{spk[$2]=spk[$2]" "$1} END {for (s in spk) print s spk[s]}' \
      "$subdir/utt2spk" | sort > "$subdir/spk2utt"
  fi
done
exit 0
