"""bench.py --smoke: every benchmark row must execute and emit valid
JSON on CPU with tiny shapes, so a bench.py regression is caught in CI
instead of by the driver's one-shot on-chip recording."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_emits_full_json():
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               LSTM_CTC_TPU_LSTM_IMPL="scan",
               LSTM_CTC_TPU_CTC_IMPL="scan")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1500)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    data = json.loads(r.stdout.strip().splitlines()[-1])
    assert data["metric"] == "train_frames_per_sec_per_chip"
    assert data["value"] > 0
    assert data["forward_frames_per_sec"] > 0
    labels = {row["config"] for row in data["configs"]}
    assert {"flagship_b32_t384", "flagship_b64_t384",
            "recipe_packed_pf3_b32", "lstm_b32_t384",
            "cudnnlstm_b32_t384"} <= labels
    errors = [row for row in data["configs"] if "error" in row]
    assert not errors, errors
    for row in data["configs"]:
        assert row["frames_per_sec"] > 0
