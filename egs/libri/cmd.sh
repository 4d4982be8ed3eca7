# Job dispatch configuration (reference egs/wsj/cmd.sh contract).
# run.pl executes locally; point these at queue.pl/slurm.pl equivalents
# for cluster dispatch.
export train_cmd="$(dirname "${BASH_SOURCE[0]}")/../../scripts/run.pl"
export decode_cmd="$train_cmd"
export cuda_cmd="$train_cmd"
