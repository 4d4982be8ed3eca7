#!/bin/bash
# Outer training loop with exponential learning-rate decay: once the CV
# improvement drops below start_halving_impr, the learning rate is
# multiplied by decay_factor (default 0.9) every epoch.  Protocol mirror
# of reference scripts/decay_train.sh / train_decay.sh.

set -u
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
BIN="$SCRIPT_DIR/../bin"
PYTHON=${PYTHON:-python3}

tr_tfrecords_scp=
cv_tfrecords_scp=
nnet_config=
srcdir=
dir=

objective="xent"
optimizer="momentum"
max_iter=30
min_iters=30
keep_lr_iters=0
learn_rate=0.008
start_halving_impr=0.001
end_halving_impr=0.0001
decay_factor=0.9
halving_factor=0.5
min_learning_rate=0.00001
shuffle=false
seed=777
batch_size=256
batch_threads=8
report_interval=100
train_extra_opts=   # extra nnet-train.py flags, e.g. "--pack-factor 3"
cv_goal=eval
num_targets=72
decode=false
decode_cmd="$SCRIPT_DIR/run.pl"
decode_graph_dir=
decode_data_dir=
decode_name=decode

echo
echo "$0 $@"
echo

. "$SCRIPT_DIR/parse_options.sh" || exit 1

[ -z "$tr_tfrecords_scp" ] && echo "(ERROR) missing --tr-tfrecords-scp" && exit 1
[ -z "$cv_tfrecords_scp" ] && echo "(ERROR) missing --cv-tfrecords-scp" && exit 1
[ -z "$srcdir" ] && [ -z "$nnet_config" ] && echo "(ERROR) missing --nnet-config or --srcdir" && exit 1
[ -z "$dir" ] && echo "(ERROR) missing --dir" && exit 1
[ -n "$srcdir" ] && [ -z "$nnet_config" ] && nnet_config="$srcdir/nnet.config"
for f in "$tr_tfrecords_scp" "$cv_tfrecords_scp" "$nnet_config"; do
  [ ! -e "$f" ] && echo "(ERROR) $f does not exist" && exit 1
done

mkdir -p "$dir"
if [ -n "$srcdir" ] || [ "$(readlink -f "$nnet_config")" != "$(readlink -f "$dir/nnet.config")" ]; then
  cp "$nnet_config" "$dir/nnet.config" || exit 1
fi
nnet_config=$dir/nnet.config

scrape() { # scrape <log> <name>
  grep "^INFO:tensorflow:$2" "$1" | awk '{print $NF}' | tail -n 1
}

run_validate() { # run_validate <model> <log>
  $PYTHON "$BIN/nnet-validate.py" \
    --objective "$objective" --evaluate true \
    --batch-size "$batch_size" --batch-threads "$batch_threads" \
    --report-interval "$report_interval" \
    "$cv_tfrecords_scp" "$nnet_config" "$1" 2> "$2"
}

################################################################################
# Iteration 0: init (or warm start) + CV
################################################################################
iter=0
echo "[$(date +'%Y/%m/%d %H:%M:%S')] iteration $iter"
if [ -n "$srcdir" ]; then
  nnet_best="$srcdir/$(cat "$srcdir/final.nnet")"
  if [ ! -e "$dir/nnet.${iter}.done" ]; then
    run_validate "$nnet_best" "$dir/nnet.${iter}.cv.log" || exit 1
    cv_loss=$(scrape "$dir/nnet.${iter}.cv.log" cv_loss)
    cv_eval=$(scrape "$dir/nnet.${iter}.cv.log" cv_eval)
    { echo "cv_loss $cv_loss"; echo "cv_eval $cv_eval"; } > "$dir/nnet.${iter}.done"
  fi
else
  nnet_best=$dir/nnet.${iter}
  if [ ! -e "$dir/nnet.${iter}.done" ]; then
    $PYTHON "$BIN/nnet-init.py" \
      --objective "$objective" --evaluate true \
      --batch-size "$batch_size" --batch-threads "$batch_threads" \
      --report-interval "$report_interval" \
      "$cv_tfrecords_scp" "$nnet_config" "$nnet_best" \
      2> "$dir/nnet.${iter}.cv.log" || exit 1
    cv_loss=$(scrape "$dir/nnet.${iter}.cv.log" cv_loss)
    cv_eval=$(scrape "$dir/nnet.${iter}.cv.log" cv_eval)
    { echo "cv_loss $cv_loss"; echo "cv_eval $cv_eval"; } > "$dir/nnet.${iter}.done"
  fi
fi
cv_loss_best=$(grep "^cv_loss" "$dir/nnet.${iter}.done" | awk '{print $NF}')
cv_eval_best=$(grep "^cv_eval" "$dir/nnet.${iter}.done" | awk '{print $NF}')

case "$cv_goal" in
  loss) cv_goal_best=$cv_loss_best ;;
  eval) cv_goal_best=$cv_eval_best ;;
  *) echo "ERROR: unsupported cv_goal = $cv_goal" && exit 1 ;;
esac
echo "cv_goal_best = $cv_goal_best"

################################################################################
# Epoch loop
################################################################################
halving=0
for iter in $(seq "$max_iter"); do
  nnet_in=$nnet_best
  nnet_out=$dir/nnet.$iter
  echo
  echo "[$(date +'%Y/%m/%d %H:%M:%S')] iteration $iter"
  if [ ! -e "$dir/nnet.${iter}.done" ]; then
    echo "training with learn_rate = $learn_rate"
    echo "nnet_in = $nnet_in"
    echo "nnet_out = $nnet_out"
    $PYTHON "$BIN/nnet-train.py" \
      --objective "$objective" --learn-rate "$learn_rate" \
      --optimizer "$optimizer" --seed "$iter" --shuffle "$shuffle" \
      --batch-size "$batch_size" --batch-threads "$batch_threads" \
      --report-interval "$report_interval" $train_extra_opts \
      "$tr_tfrecords_scp" "$nnet_config" "$nnet_in" "$nnet_out" \
      2> "$dir/nnet.${iter}.tr.log"
    tr_loss=$(scrape "$dir/nnet.${iter}.tr.log" tr_loss)

    if [ -z "$tr_loss" ] || [ "$tr_loss" == "nan" ]; then
      echo "(ERROR) tr_loss = ${tr_loss:-missing}; reduce learn rate and re-train"
      learn_rate=$(awk "BEGIN{print($learn_rate*$halving_factor)}")
      echo "training with learn_rate = $learn_rate"
      $PYTHON "$BIN/nnet-train.py" \
        --objective "$objective" --learn-rate "$learn_rate" \
        --optimizer "$optimizer" --seed "$iter" --shuffle "$shuffle" \
        --batch-size "$batch_size" --batch-threads "$batch_threads" \
        --report-interval "$report_interval" $train_extra_opts \
        "$tr_tfrecords_scp" "$nnet_config" "$nnet_in" "$nnet_out" \
        2> "$dir/nnet.${iter}.tr.log" || exit 1
      tr_loss=$(scrape "$dir/nnet.${iter}.tr.log" tr_loss)
      { [ -z "$tr_loss" ] || [ "$tr_loss" == "nan" ]; } && \
        echo "(ERROR) tr_loss = ${tr_loss:-missing}" && exit 1
    fi

    run_validate "$nnet_out" "$dir/nnet.${iter}.cv.log" || exit 1
    cv_loss=$(scrape "$dir/nnet.${iter}.cv.log" cv_loss)
    cv_eval=$(scrape "$dir/nnet.${iter}.cv.log" cv_eval)
    [ "$cv_loss" == "nan" ] && echo "(ERROR) cv_loss = nan" && exit 1
    [ "$cv_eval" == "nan" ] && echo "(ERROR) cv_eval = nan" && exit 1
    { echo "tr_loss $tr_loss"; echo "cv_loss $cv_loss"; echo "cv_eval $cv_eval"; } \
      > "$dir/nnet.${iter}.done"

    echo "nnet.${iter}" > "$dir/final.nnet"
    if [ "$decode" == "true" ] && [ -n "$decode_graph_dir" ]; then
      "$SCRIPT_DIR/decode_ctc_lat.sh" --cmd "$decode_cmd" --nj 8 \
        --beam 17.0 --lattice_beam 8.0 --max-active 5000 --acwt 0.9 \
        --ntargets "$num_targets" \
        "$decode_graph_dir" "$decode_data_dir" \
        "$dir/${decode_name}_${iter}" &>/dev/null &
    fi
  else
    echo "$dir/nnet.${iter}.done exists, skipping this iteration"
    tr_loss=$(grep "^tr_loss" "$dir/nnet.${iter}.done" | awk '{print $NF}')
    cv_loss=$(grep "^cv_loss" "$dir/nnet.${iter}.done" | awk '{print $NF}')
    cv_eval=$(grep "^cv_eval" "$dir/nnet.${iter}.done" | awk '{print $NF}')
  fi
  echo "tr_loss = $tr_loss cv_loss = $cv_loss cv_eval = $cv_eval"

  case "$cv_goal" in
    loss) cv_goal_val=$cv_loss ;;
    eval) cv_goal_val=$cv_eval ;;
  esac
  # denominator guarded: a collapsed run can reach cv goal exactly 0,
  # and awk aborts on 0-division, leaving rel_impr empty (state machine
  # derails); 0-best means no relative improvement is measurable
  rel_impr=$(awk "BEGIN{d=($cv_goal_best); if (d == 0) d=1e-20; print(($cv_goal_best - $cv_goal_val) / d);}")
  echo "cv_goal_val = $cv_goal_val cv_goal_best = $cv_goal_best relative improvement = $rel_impr"

  if [ 1 == "$(awk "BEGIN{print($cv_goal_val < $cv_goal_best ? 1:0);}")" ]; then
    nnet_best=$nnet_out
    cv_eval_best=$cv_eval
    cv_loss_best=$cv_loss
    cv_goal_best=$cv_goal_val
    echo "nnet accepted ($(basename "$nnet_best"))"
  else
    echo "nnet rejected ($(basename "$nnet_out"))"
  fi

  [ "$iter" -le "$keep_lr_iters" ] && continue

  if [ 1 == $halving ] && [ 1 == "$(awk "BEGIN{print($rel_impr < $end_halving_impr ? 1:0);}")" ]; then
    if [ "$iter" -le "$min_iters" ]; then
      echo "supposed to finish, but we continue as min_iters = $min_iters"
      learn_rate=$(awk "BEGIN{print($learn_rate*$decay_factor)}")
      learn_rate=$(awk "BEGIN{print($learn_rate < $min_learning_rate ? $min_learning_rate : $learn_rate)}")
      echo "decayed learning rate to $learn_rate"
      continue
    fi
    echo "finished, too small rel. improvement $rel_impr < $end_halving_impr"
    break
  fi

  if [ 0 == $halving ] && [ 1 == "$(awk "BEGIN{print($rel_impr < $start_halving_impr ? 1:0);}")" ]; then
    echo "start halving learning rate, small rel. improvement $rel_impr < $start_halving_impr"
    halving=1
  fi

  if [ 1 == $halving ]; then
    learn_rate=$(awk "BEGIN{print($learn_rate*$decay_factor)}")
    learn_rate=$(awk "BEGIN{print($learn_rate < $min_learning_rate ? $min_learning_rate : $learn_rate)}")
    echo "decayed learning rate to $learn_rate"
  fi
done

echo "$(basename "$nnet_best")" > "$dir/final.nnet"
echo "[$(date +'%Y/%m/%d %H:%M:%S')] training finished, the final model is $dir/$(cat "$dir/final.nnet")"
echo
