#!/bin/bash
# Build a const-arpa rescoring lang dir from an ARPA LM — equivalent of
# the reference's local/wsj_const_graph.sh / local/ls_const_graph.sh
# (utils/build_const_arpa_lm.sh in Kaldi): copies the word symbols from
# an existing lang dir and compiles the ARPA into the mmap-able G.carpa.
#
# usage: build_const_arpa_lm.sh <arpa[.gz]> <src-lang-dir> <new-lang-dir>

set -eu
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
FSTBIN=${FSTBIN:-$SCRIPT_DIR/../native/build}

if [ $# != 3 ]; then
  echo "usage: build_const_arpa_lm.sh <arpa[.gz]> <src-lang> <new-lang>"
  exit 1
fi
arpa=$1
srclang=$2
newlang=$3

[ ! -f "$srclang/words.txt" ] && \
  echo "build_const_arpa_lm.sh: no $srclang/words.txt" && exit 1
mkdir -p "$newlang"
for f in words.txt tokens.txt lexicon_numbers.txt; do
  [ -f "$srclang/$f" ] && cp "$srclang/$f" "$newlang/$f"
done

case "$arpa" in
  *.gz) gunzip -c "$arpa" | "$FSTBIN/arpa-to-const-arpa" - \
          "$newlang/words.txt" "$newlang/G.carpa" ;;
  *)    "$FSTBIN/arpa-to-const-arpa" "$arpa" "$newlang/words.txt" \
          "$newlang/G.carpa" ;;
esac
echo "build_const_arpa_lm.sh: wrote $newlang/G.carpa"
