#!/bin/bash
# WER-parity protocol: run a recipe N seeds × M configs and emit the
# reference's mean/std comparison table (the reference authors ran each
# config 5× to control GPU nondeterminism and report mean(std),
# reference README.md:34, egs/wsj/RESULT.md:91-118).
#
# usage: run_parity.sh [--recipe egs/synthetic/run.sh] [--seeds "1 2 3"]
#          [--configs "baseline=--num-experts 0;treatment=--num-experts 4"]
#          [--work-root /tmp/parity] [--out RESULT.md]
#          [--extra "--max-iter 25"]
#
# Works on any recipe that accepts --seed/--work and leaves wer_* files
# under <work>/exp/decode_*/ (the synthetic recipe out of the box; the
# WSJ/LibriSpeech recipes once corpora are present).  One command → a
# filled table; real corpora are a drop-in.

set -eu
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO="$(cd "$SCRIPT_DIR/.." && pwd)"

recipe=$REPO/egs/synthetic/run.sh
seeds="1 2 3"
configs="baseline=--num-experts 0;treatment=--num-experts 4"
work_root=/tmp/parity
out=RESULT.md
extra=""

. "$SCRIPT_DIR/parse_options.sh" || exit 1

mkdir -p "$work_root"
declare -A wers

best_wer() {  # min over all decode dirs' acwt sweep
  grep -h "^summary" "$1"/exp/decode_*/wer_* 2>/dev/null |
    awk -F'wer: ' '{print $2}' | awk '{print $1}' | sort -n | head -1
}

IFS=';' read -ra cfg_list <<< "$configs"
for cfg in "${cfg_list[@]}"; do
  name=${cfg%%=*}
  args=${cfg#*=}
  for seed in $seeds; do
    work="$work_root/${name}_seed${seed}"
    log="$work_root/${name}_seed${seed}.log"
    # Resume: only a run whose recipe exited 0 (sentinel written below)
    # counts as complete — wer files alone are not enough, since the
    # acoustic-scale sweep writes them one by one and an interruption
    # mid-scoring would otherwise be recorded as a partial-sweep WER.
    # Remove the work dir (or the sentinel) to force a re-run.
    if [ -f "$work/.parity_done" ]; then
      done_wer=$(best_wer "$work")
      if [ -n "$done_wer" ]; then
        wers["$name/$seed"]=$done_wer
        echo "run_parity: $name seed $seed already done (WER $done_wer), skipping"
        continue
      fi
    fi
    rm -rf "$work"   # partial run from an interrupted attempt
    echo "run_parity: $name seed $seed → $work"
    # shellcheck disable=SC2086
    bash "$recipe" --work "$work" --seed "$seed" $args $extra \
      > "$log" 2>&1 || { echo "run_parity: FAILED (see $log)"; exit 1; }
    touch "$work/.parity_done"
    wer=$(best_wer "$work")
    [ -z "$wer" ] && { echo "run_parity: no wer files in $work"; exit 1; }
    wers["$name/$seed"]=$wer
    echo "run_parity: $name seed $seed WER $wer"
  done
done

{
  echo "# WER parity results"
  echo
  echo "Protocol: each config run over seeds {$seeds}; table reports"
  echo "mean (std) of the best WER over the acoustic-scale sweep —"
  echo "the reference's comparison format (egs/wsj/RESULT.md:115-118)."
  echo
  echo "| config | seeds | WER mean (std) | per-seed WER |"
  echo "|---|---|---|---|"
  for cfg in "${cfg_list[@]}"; do
    name=${cfg%%=*}
    vals=""
    for seed in $seeds; do
      vals="$vals ${wers[$name/$seed]}"
    done
    stats=$(echo "$vals" | awk '{
      n = NF; s = 0; for (i = 1; i <= n; i++) s += $i; m = s / n;
      v = 0; for (i = 1; i <= n; i++) v += ($i - m) ^ 2;
      sd = n > 1 ? sqrt(v / (n - 1)) : 0;
      printf "%.4f (%.4f)", m, sd }')
    per_seed=$(echo "$vals" | sed 's/^ //; s/ / \/ /g')
    n_seeds=$(echo "$vals" | wc -w)
    echo "| $name | $n_seeds | $stats | $per_seed |"
  done
} > "$out"
echo "run_parity: wrote $out"
cat "$out"
