#!/bin/bash
# Build tg (unpruned) and tgpr (pruned) decode graphs from the
# locally-trained WSJ LMs (equivalent of reference
# local/wsj_decode_graph_local_lms.sh:1-73, driven by the LMs that
# stage 1 of run_wsj_phn.sh self-trains with bin/train-lm.py).
#
# usage: wsj_decode_graph_local_lms.sh [--lm-dir data/local/local_lm] \
#            <dict-dir> <lang-prefix>
# produces <lang-prefix>_test_tg/ and <lang-prefix>_test_tgpr/

set -eu
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO="$(cd "$SCRIPT_DIR/../../.." && pwd)"
SCRIPTS=$REPO/scripts

lm_dir=data/local/local_lm

. "$SCRIPTS/parse_options.sh" || exit 1

if [ $# -ne 2 ]; then
  echo "usage: wsj_decode_graph_local_lms.sh <dict-dir> <lang-prefix>"
  exit 1
fi
dictdir=$1
prefix=$2

for pair in "tg tg.arpa" "tgpr tgpr.arpa"; do
  name=${pair% *}
  arpa=$lm_dir/${pair#* }
  if [ ! -f "$arpa" ]; then
    echo "wsj_decode_graph_local_lms.sh: missing $arpa" \
         "(run stage 1 of run_wsj_phn.sh without --lm-arpa)"
    exit 1
  fi
  bash "$SCRIPTS/make_TLG.sh" "$dictdir" "$arpa" "${prefix}_test_$name"
done
echo "wsj_decode_graph_local_lms.sh: built ${prefix}_test_{tg,tgpr}"
