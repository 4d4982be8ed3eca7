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


def test_gen_data_hard_profile(tmp_path):
    """The non-saturated accuracy-gate corpus (--hard): larger
    minimal-pair vocabulary, noisy confusable tones — dict and data
    dirs must materialize with the extended lexicon and the same phone
    inventory (the network output size must not change)."""
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "egs", "synthetic", "local", "gen_data.py"),
         str(tmp_path), "4", "2", "2", "7", "--hard"],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 0, proc.stderr
    lex = open(os.path.join(str(tmp_path), "data", "dict",
                            "lexicon.txt")).read().split("\n")
    words = {line.split()[0] for line in lex if line}
    assert {"kam", "sam", "kat", "mit", "tesko", "mura"} <= words
    units = open(os.path.join(str(tmp_path), "data", "dict",
                              "units.txt")).read().strip().split("\n")
    assert len(units) == 10          # phone inventory unchanged
    # audio exists and is non-trivially sized
    wav_dir = os.path.join(str(tmp_path), "wav", "train")
    assert len(os.listdir(wav_dir)) == 4
    # easy and hard corpora must differ (noise/vocab actually applied)
    proc2 = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "egs", "synthetic", "local", "gen_data.py"),
         str(tmp_path / "easy"), "4", "2", "2", "7"],
        capture_output=True, text=True, cwd=REPO)
    assert proc2.returncode == 0, proc2.stderr
    lex2 = open(os.path.join(str(tmp_path / "easy"), "data", "dict",
                             "lexicon.txt")).read()
    assert "tesko" not in lex2
