#!/bin/bash
# Build a decode graph for an existing lang dir with a (possibly pruned)
# ARPA LM — the reference's scripts/make_decode_graph.sh shape: reuse
# tokens/lexicon from a dict dir, swap in a different grammar.
#
# usage: make_decode_graph.sh <dict-src-dir> <lm-arpa> <out-lang-dir>

set -eu
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"

if [ $# != 3 ]; then
  echo "usage: make_decode_graph.sh <dict-src-dir> <lm-arpa> <lang-dir>"
  exit 1
fi
exec bash "$SCRIPT_DIR/make_TLG.sh" "$1" "$2" "$3"
