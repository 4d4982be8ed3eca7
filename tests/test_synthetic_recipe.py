"""The flagship integration test: the synthetic recipe end-to-end —
audio synthesis → native fbank/CMVN → records → BLSTM-CTC training via
the newbob outer loop → native TLG build → native lattice decode →
acoustic-scale-sweep WER scoring.  Everything self-contained."""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FSTBIN = os.path.join(REPO, "native", "build")


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.exists(os.path.join(FSTBIN, "fst-tools")),
    reason="native toolkit not built")
def test_synthetic_recipe_end_to_end(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHON=sys.executable)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # no virtual multi-device in subprocesses
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "egs", "synthetic", "run.sh"),
         "--work", str(tmp_path / "work"),
         "--num-train", "64", "--max-iter", "18", "--min-iters", "18",
         "--keep-lr-iters", "18"],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert proc.returncode == 0, \
        "recipe failed:\nstdout:\n%s\nstderr:\n%s" % (
            proc.stdout[-4000:], proc.stderr[-2000:])
    match = re.search(r"best WER =====\n\S+summary (\d+\.\d+)", proc.stdout)
    assert match, "no WER summary in:\n%s" % proc.stdout[-2000:]
    wer = float(match.group(1))
    assert wer < 0.25, "recipe WER too high: %.3f" % wer
