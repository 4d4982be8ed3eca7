"""compute-wer.py unit tests: tokenization, alignment counts, summary."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "bin", "compute-wer.py")


def score(ref_lines, hyp_lines, tmp_path, *flags):
    ref = tmp_path / "ref.txt"
    ref.write_text("".join(l + "\n" for l in ref_lines))
    proc = subprocess.run(
        [sys.executable, TOOL, *flags, str(ref)],
        input="".join(l + "\n" for l in hyp_lines),
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def summary_fields(out):
    line = [l for l in out.splitlines() if l.startswith("summary")][0]
    parts = line.split()
    return {parts[i].rstrip(":"): float(parts[i + 1])
            for i in range(1, len(parts), 2)}


def test_perfect_match(tmp_path):
    out = score(["u1 hello world"], ["u1 hello world"], tmp_path)
    s = summary_fields(out)
    assert s["wer"] == 0.0 and s["num"] == 2 and s["cor"] == 2


def test_substitution_insertion_deletion(tmp_path):
    out = score(["u1 a b c d"], ["u1 a x c d e"], tmp_path)
    s = summary_fields(out)
    # one substitution (b→x), one insertion (e)
    assert s["sub"] == 1 and s["ins"] == 1 and s["del"] == 0
    assert abs(s["wer"] - 2 / 4) < 1e-6
    out = score(["u1 a b c d"], ["u1 a c d"], tmp_path)
    s = summary_fields(out)
    assert s["del"] == 1 and abs(s["wer"] - 1 / 4) < 1e-6


def test_multiple_utterances_accumulate(tmp_path):
    out = score(["u1 a b", "u2 c d"], ["u1 a b", "u2 c x"], tmp_path)
    s = summary_fields(out)
    assert s["num"] == 4 and s["cor"] == 3 and s["sub"] == 1


def test_alignment_rows_printed(tmp_path):
    out = score(["u1 a b c"], ["u1 a c"], tmp_path)
    lines = out.splitlines()
    assert any("ref:" in l for l in lines)
    assert any("rec:" in l for l in lines)


def test_cjk_character_splitting(tmp_path):
    # --to-character splits CJK tokens into characters
    out = score(["u1 你好 world"], ["u1 你好 world"], tmp_path,
                "--to-character", "true")
    s = summary_fields(out)
    assert s["num"] == 3  # 你, 好, world


def test_to_lower(tmp_path):
    out = score(["u1 Hello"], ["u1 hello"], tmp_path, "--to-lower", "true")
    assert summary_fields(out)["wer"] == 0.0
