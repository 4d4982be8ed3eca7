#!/bin/bash
# WSJ character-CTC variant (the char label set + char TLG graph config
# listed alongside the phone recipe; BASELINE.json configs): identical
# staged pipeline to run_wsj_phn.sh with the character dictionary.
#
# usage: run_wsj_char.sh --wsj0 <dir> --wsj1 <dir> --lm-arpa <file> [opts]

set -e
RECIPE_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
cd "$RECIPE_DIR"

stage=1
wsj0=
wsj1=
lm_arpa=
extra_args=()
while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2 ;;
    --wsj0) wsj0=$2; shift 2 ;;
    --wsj1) wsj1=$2; shift 2 ;;
    --lm-arpa) lm_arpa=$2; shift 2 ;;
    *) extra_args+=("$1" "$2"); shift 2 ;;
  esac
done

if [ "$stage" -le 1 ]; then
  [ -z "$wsj0" ] && echo "need --wsj0/--wsj1" && exit 1
  bash local/wsj_data_prep.sh "$wsj0" "$wsj1"
  # word list from the training transcripts
  awk '{for (i=2;i<=NF;i++) print $i}' data/train_si284/text |
    sort -u > data/local/wordlist.txt
  bash local/wsj_prepare_char_dict.sh data/local/wordlist.txt
  # point the phone recipe's dict at the char dict
  mkdir -p data/local
  rm -rf data/local/dict_phn
  ln -s "$(pwd)/data/local/dict_char" data/local/dict_phn
  [ -z "$lm_arpa" ] && echo "need --lm-arpa for the decode graph" && exit 1
  bash ../../scripts/make_TLG.sh data/local/dict_phn "$lm_arpa" \
    data/lang_phn_test_tgpr
fi

exec bash run_wsj_phn.sh --stage "$((stage > 1 ? stage : 2))" \
  --lm-arpa "$lm_arpa" "${extra_args[@]}"
