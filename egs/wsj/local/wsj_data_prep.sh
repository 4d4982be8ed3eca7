#!/bin/bash
# WSJ corpus preparation: builds data/{train_si284,test_dev93,test_eval92}
# (wav.scp via sph2pipe, text, utt2spk, spk2utt) from the LDC WSJ0/WSJ1
# discs.  Protocol mirror of reference local/wsj_data_prep.sh (213 lines)
# using this recipe's perl helpers.
#
# usage: wsj_data_prep.sh <wsj0-root> <wsj1-root>

set -eu
LOCAL="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"

if [ $# -lt 2 ]; then
  echo "usage: wsj_data_prep.sh <wsj0-root> <wsj1-root>" && exit 1
fi
WSJ0=$1
WSJ1=$2
dir=data/local/data
mkdir -p "$dir"

SPH2PIPE=$(command -v sph2pipe || true)
[ -z "$SPH2PIPE" ] && echo "sph2pipe not found in PATH (needed for .wv1)" \
  && exit 1

# each disc may be the corpus root itself or hold per-disc
# subdirectories (11-1.1/wsj0/...); search both
wsj0_roots=("$WSJ0" "$WSJ0"/*/)
wsj1_roots=("$WSJ1" "$WSJ1"/*/)

require_nonempty() {  # an empty flist means a wrong corpus layout —
  [ -s "$1" ] || {    # fail loudly instead of producing empty datasets
    echo "wsj_data_prep.sh: $1 is empty — check the corpus layout" >&2
    exit 1
  }
}

# train si284 = si84 (WSJ0) + si200 (WSJ1)
cat "$WSJ0"/wsj0/doc/indices/train/tr_s_wv1.ndx \
  | "$LOCAL/ndx2flist.pl" "${wsj0_roots[@]}" > "$dir/train_si84.flist"
require_nonempty "$dir/train_si84.flist"
cat "$WSJ1"/wsj1/doc/indices/si_tr_s.ndx \
  | "$LOCAL/ndx2flist.pl" "${wsj1_roots[@]}" > "$dir/train_si200.flist"
require_nonempty "$dir/train_si200.flist"
cat "$dir/train_si84.flist" "$dir/train_si200.flist" \
  > "$dir/train_si284.flist"

# dev93 / eval92 (si_et_20.ndx entries carry no extension;
# ndx2flist.pl appends .wv1)
cat "$WSJ1"/wsj1/doc/indices/h1_p0.ndx \
  | "$LOCAL/ndx2flist.pl" "${wsj1_roots[@]}" > "$dir/test_dev93.flist"
require_nonempty "$dir/test_dev93.flist"
cat "$WSJ0"/wsj0/doc/indices/test/nvp/si_et_20.ndx \
  | "$LOCAL/ndx2flist.pl" "${wsj0_roots[@]}" > "$dir/test_eval92.flist"
require_nonempty "$dir/test_eval92.flist"

# transcripts from .dot files
find "$WSJ0" "$WSJ1" -iname '*.dot' > "$dir/dot_files.flist"

for set in train_si284 test_dev93 test_eval92; do
  out=data/$set
  mkdir -p "$out"
  "$LOCAL/flist2scp.pl" < "$dir/$set.flist" | sort > "$dir/${set}_sph.scp"
  awk '{print $1}' "$dir/${set}_sph.scp" |
    "$LOCAL/find_transcripts.pl" "$dir/dot_files.flist" |
    "$LOCAL/normalize_transcript.pl" "<NOISE>" | sort > "$out/text"
  awk -v sph="$SPH2PIPE" \
    '{printf("%s %s -f wav %s |\n", $1, sph, $2)}' \
    "$dir/${set}_sph.scp" > "$out/wav.scp"
  # speaker = first 3 chars of the utterance id
  awk '{print $1 " " substr($1, 1, 3)}' "$out/text" > "$out/utt2spk"
  awk '{spk[$2]=spk[$2]" "$1} END {for (s in spk) print s spk[s]}' \
    "$out/utt2spk" | sort > "$out/spk2utt"
done

echo "wsj_data_prep.sh: done"
