"""scripts/run_parity.sh protocol driver: N seeds × M configs → the
reference's mean(std) WER table (egs/wsj/RESULT.md:115-118 format).

Uses a stub recipe that writes deterministic wer_* sweep files, so the
aggregation/table logic is exercised end-to-end in seconds without
corpora or an accelerator; the real recipes are a drop-in (the driver
only relies on the --work/--seed contract and wer_* artifacts).
"""

import os
import stat
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STUB_RECIPE = """#!/bin/bash
# stub recipe: parses --work/--seed (+config args) and emits a wer sweep
work=; seed=1; bonus=0
while [ $# -gt 0 ]; do
  case "$1" in
    --work) work=$2; shift 2;;
    --seed) seed=$2; shift 2;;
    --bonus) bonus=$2; shift 2;;
    *) shift;;
  esac
done
mkdir -p "$work/exp/decode_test"
# best point of the sweep: 10 + seed - bonus (so configs differ)
for acwt in 8 9 10; do
  wer=$(( 10 + seed - bonus + acwt - 8 ))
  echo "summary wer: ${wer}.5000 num: 45 cor: 40 sub: 3 ins: 1 del: 1" \\
    > "$work/exp/decode_test/wer_$acwt"
done
"""


def test_run_parity_emits_reference_format_table(tmp_path):
    recipe = tmp_path / "stub_recipe.sh"
    recipe.write_text(STUB_RECIPE)
    recipe.chmod(recipe.stat().st_mode | stat.S_IEXEC)
    out = tmp_path / "RESULT.md"

    result = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "run_parity.sh"),
         "--recipe", str(recipe),
         "--seeds", "1 2 3",
         "--configs", "baseline=--bonus 0;treatment=--bonus 2",
         "--work-root", str(tmp_path / "work"),
         "--out", str(out)],
        capture_output=True, text=True)
    assert result.returncode == 0, result.stdout + result.stderr

    table = out.read_text()
    # best WER per run = acwt 8 point: 10 + seed - bonus (+ .5)
    # baseline seeds 1,2,3 → 11.5, 12.5, 13.5 → mean 12.5 std 1.0
    # treatment → 9.5, 10.5, 11.5 → mean 10.5 std 1.0
    assert "| baseline | 3 | 12.5000 (1.0000) | 11.5000 / 12.5000 / 13.5000 |" \
        in table
    assert "| treatment | 3 | 10.5000 (1.0000) | 9.5000 / 10.5000 / 11.5000 |" \
        in table
    assert "mean (std)" in table


def test_run_parity_resumes_completed_seeds(tmp_path):
    """An interrupted protocol picks up where it stopped: runs whose work
    dir already holds wer files are recorded and skipped, never re-run."""
    recipe = tmp_path / "stub_recipe.sh"
    recipe.write_text(STUB_RECIPE)
    recipe.chmod(recipe.stat().st_mode | stat.S_IEXEC)
    out = tmp_path / "RESULT.md"
    argv = ["bash", os.path.join(REPO, "scripts", "run_parity.sh"),
            "--seeds", "1 2",
            "--configs", "baseline=--bonus 0",
            "--work-root", str(tmp_path / "work"),
            "--out", str(out)]

    first = subprocess.run(argv + ["--recipe", str(recipe)],
                           capture_output=True, text=True)
    assert first.returncode == 0, first.stdout + first.stderr
    table1 = out.read_text()

    # second pass: the recipe now hard-fails — resume must not invoke it
    bomb = tmp_path / "bomb.sh"
    bomb.write_text("#!/bin/bash\nexit 1\n")
    bomb.chmod(bomb.stat().st_mode | stat.S_IEXEC)
    second = subprocess.run(argv + ["--recipe", str(bomb)],
                            capture_output=True, text=True)
    assert second.returncode == 0, second.stdout + second.stderr
    assert second.stdout.count("already done") == 2
    assert out.read_text() == table1


def test_run_parity_reruns_partial_sweeps(tmp_path):
    """wer files WITHOUT the completion sentinel mean the run was
    interrupted mid-scoring (the acoustic-scale sweep writes wer_* one
    by one) — resume must re-run it, not record the partial-sweep WER."""
    recipe = tmp_path / "stub_recipe.sh"
    recipe.write_text(STUB_RECIPE)
    recipe.chmod(recipe.stat().st_mode | stat.S_IEXEC)
    out = tmp_path / "RESULT.md"

    # fake an interrupted run: only the worst point of the sweep exists,
    # and no .parity_done sentinel
    work = tmp_path / "work" / "baseline_seed1"
    (work / "exp" / "decode_test").mkdir(parents=True)
    (work / "exp" / "decode_test" / "wer_10").write_text(
        "summary wer: 99.0000 num: 45 cor: 1 sub: 40 ins: 1 del: 4\n")

    result = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "run_parity.sh"),
         "--recipe", str(recipe),
         "--seeds", "1",
         "--configs", "baseline=--bonus 0",
         "--work-root", str(tmp_path / "work"),
         "--out", str(out)],
        capture_output=True, text=True)
    assert result.returncode == 0, result.stdout + result.stderr
    assert "already done" not in result.stdout
    # the partial 99.0 WER was discarded; the full sweep's best is 11.5
    assert "| baseline | 1 | 11.5000 (0.0000) | 11.5000 |" \
        in out.read_text()
    assert (work / ".parity_done").exists()
