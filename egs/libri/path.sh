# Tool path setup (reference egs/wsj/path.sh contract): native fst/lattice
# binaries and the framework CLIs onto PATH.
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/../.." && pwd)"
export PATH="$REPO_ROOT/native/build:$REPO_ROOT/bin:$REPO_ROOT/scripts:$PATH"
export PYTHONPATH="$REPO_ROOT${PYTHONPATH:+:$PYTHONPATH}"
