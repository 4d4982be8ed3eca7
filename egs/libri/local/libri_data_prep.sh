#!/bin/bash
# LibriSpeech data preparation: per-subset wav.scp/text/utt2spk/spk2utt
# from the extracted corpus layout (protocol mirror of reference
# local/libri_data_prep.sh).  LibriSpeech ships .flac; entries use a
# "flac -c -d |" pipe (or plain paths for .wav).
#
# usage: libri_data_prep.sh <librispeech-root>

set -eu
if [ $# != 1 ]; then
  echo "usage: libri_data_prep.sh <librispeech-root>" && exit 1
fi
root=$1

for subset in train-clean-100 train-clean-360 train-other-500 \
              dev-clean dev-other test-clean test-other; do
  src=$root/$subset
  [ ! -d "$src" ] && echo "skipping absent subset $subset" && continue
  out=data/$(echo "$subset" | tr '-' '_')
  mkdir -p "$out"
  : > "$out/wav.scp"; : > "$out/text"; : > "$out/utt2spk"
  find "$src" -name '*.trans.txt' | sort | while read -r trans; do
    chapter_dir=$(dirname "$trans")
    while read -r utt words; do
      spk=${utt%%-*}
      if [ -f "$chapter_dir/$utt.flac" ]; then
        echo "$utt flac -c -d -s $chapter_dir/$utt.flac |" >> "$out/wav.scp"
      else
        echo "$utt $chapter_dir/$utt.wav" >> "$out/wav.scp"
      fi
      echo "$utt $words" >> "$out/text"
      echo "$utt $spk" >> "$out/utt2spk"
    done < "$trans"
  done
  sort -o "$out/wav.scp" "$out/wav.scp"
  sort -o "$out/text" "$out/text"
  sort -o "$out/utt2spk" "$out/utt2spk"
  awk '{spk[$2]=spk[$2]" "$1} END {for (s in spk) print s spk[s]}' \
    "$out/utt2spk" | sort > "$out/spk2utt"
  echo "prepared $out ($(wc -l < "$out/text") utterances)"
done
