#!/bin/bash
# Fetch the standard LibriSpeech language models (OpenSLR resource 11) —
# equivalent of the reference's local/download_lm.sh.  Conventional
# names: tgsmall = 3-gram pruned 3e-7, tgmed = 3-gram pruned 1e-7,
# tglarge = full 3-gram, fglarge = full 4-gram.
#
# usage: download_lm.sh <dst-dir>

set -eu
base_url=https://www.openslr.org/resources/11

if [ $# != 1 ]; then
  echo "usage: local/download_lm.sh <dst-dir>"
  exit 1
fi
dst=$1
mkdir -p "$dst"

files="3-gram.arpa.gz 3-gram.pruned.1e-7.arpa.gz \
3-gram.pruned.3e-7.arpa.gz 4-gram.arpa.gz librispeech-vocab.txt \
librispeech-lexicon.txt"

for f in $files; do
  if [ -f "$dst/$f" ]; then
    echo "download_lm.sh: $f already present, skipping"
    continue
  fi
  echo "download_lm.sh: fetching $f"
  if command -v wget >/dev/null; then
    wget -q -O "$dst/$f" "$base_url/$f" || { rm -f "$dst/$f"; exit 1; }
  else
    curl -fsSL -o "$dst/$f" "$base_url/$f" || { rm -f "$dst/$f"; exit 1; }
  fi
done

# conventional symlinks used by the recipe
ln -sf 3-gram.pruned.3e-7.arpa.gz "$dst/lm_tgsmall.arpa.gz"
ln -sf 3-gram.pruned.1e-7.arpa.gz "$dst/lm_tgmed.arpa.gz"
ln -sf 3-gram.arpa.gz "$dst/lm_tglarge.arpa.gz"
ln -sf 4-gram.arpa.gz "$dst/lm_fglarge.arpa.gz"
echo "download_lm.sh: done"
