"""Featurizer tests: fbank properties, CMVN, deltas, and the featbin CLI
tools piped together like the recipes do."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from lstm_ctc_tpu import kaldi
from lstm_ctc_tpu.data.features import (
    accumulate_cmvn_stats,
    add_deltas,
    apply_cmvn,
    compute_fbank,
    compute_mfcc,
    delta_coefficients,
    mel_filterbank,
    mel_scale,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, "bin")


def tone(freq, seconds=0.5, rate=16000.0, amp=10000.0):
    t = np.arange(int(seconds * rate)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_fbank_shape_and_frame_count():
    wave = tone(440.0, seconds=0.5)
    feats = compute_fbank(wave, num_mel_bins=40, dither=0.0)
    # 8000 samples, 400-sample window, 160 shift → 1 + (8000-400)//160 = 48
    assert feats.shape == (48, 40)
    assert np.isfinite(feats).all()


def test_fbank_peak_tracks_tone_frequency():
    bank = mel_filterbank(40, 512, 16000.0)
    for freq in (300.0, 1000.0, 3000.0):
        feats = compute_fbank(tone(freq), num_mel_bins=40, dither=0.0)
        peak_bin = int(np.argmax(feats.mean(axis=0)))
        # find the mel bin whose filter center is closest to freq
        centers = np.array([
            np.argmax(bank[b]) * (16000.0 / 512) for b in range(40)])
        expected_bin = int(np.argmin(np.abs(centers - freq)))
        assert abs(peak_bin - expected_bin) <= 1, \
            "freq %.0f: peak %d expected %d" % (freq, peak_bin, expected_bin)


def test_mfcc_shape():
    feats = compute_mfcc(tone(500.0), num_mel_bins=23, num_ceps=13,
                         dither=0.0)
    assert feats.shape[1] == 13
    assert np.isfinite(feats).all()


def test_cmvn_roundtrip():
    rng = np.random.RandomState(0)
    feats = (rng.randn(200, 13) * 3.0 + 7.0).astype(np.float32)
    stats = accumulate_cmvn_stats(feats)
    normed = apply_cmvn(feats, stats, norm_means=True, norm_vars=True)
    np.testing.assert_allclose(normed.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(normed.std(axis=0), 1.0, atol=1e-3)


def test_delta_coefficients_match_kaldi():
    # Kaldi order-1 window-2 filter: [-2,-1,0,1,2]/10
    scales = delta_coefficients(order=2, window=2)
    np.testing.assert_allclose(scales[1],
                               np.array([-2, -1, 0, 1, 2]) / 10.0)
    assert len(scales[2]) == 9


def test_add_deltas_linear_ramp():
    # on a linear ramp the delta is the slope, delta-delta ~ 0 (interior)
    feats = np.arange(20, dtype=np.float32)[:, None] * 2.0
    out = add_deltas(feats, order=2, window=2)
    assert out.shape == (20, 3)
    np.testing.assert_allclose(out[5:15, 1], 2.0, atol=1e-5)
    np.testing.assert_allclose(out[8:12, 2], 0.0, atol=1e-5)


def write_wav(path, samples, rate=16000):
    data = np.asarray(samples, np.int16).tobytes()
    with open(path, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                       rate * 2, 2, 16))
        fh.write(b"data" + struct.pack("<I", len(data)) + data)


def run_tool(cmd, **kw):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=REPO, **kw)
    assert proc.returncode == 0, "%s failed:\n%s" % (cmd, proc.stderr[-1500:])
    return proc


@pytest.mark.slow
def test_featbin_pipeline(tmp_path):
    """wav.scp → fbank → cmvn stats → apply-cmvn|add-deltas pipe, like
    the recipe feature prep (reference decode_ctc_lat.sh:85-88)."""
    wav_scp = str(tmp_path / "wav.scp")
    with open(wav_scp, "w") as fh:
        for i, freq in enumerate([300.0, 800.0, 2000.0]):
            path = str(tmp_path / ("u%d.wav" % i))
            write_wav(path, tone(freq, 0.3))
            fh.write("u%d %s\n" % (i, path))

    fbank_ark = str(tmp_path / "fbank.ark")
    run_tool([sys.executable, os.path.join(BIN, "compute-fbank-feats.py"),
              "--num-mel-bins=40", "--dither=0.0",
              "scp:" + wav_scp, "ark:" + fbank_ark])
    feats = dict(kaldi.SequentialBaseFloatMatrixReader("ark:" + fbank_ark))
    assert len(feats) == 3 and feats["u0"].shape[1] == 40

    cmvn = str(tmp_path / "cmvn.mat")
    run_tool([sys.executable, os.path.join(BIN, "compute-cmvn-stats.py"),
              "ark:" + fbank_ark, cmvn])

    # pipe: apply-cmvn | add-deltas | select-feats identity, all as one
    # shell pipeline through our kaldi pipe rspecifier support
    pipe = ("ark:%s %s --norm-means=true --norm-vars=true %s ark:%s ark:- | "
            "%s %s --delta-order=2 --delta-window=2 ark:- ark:- |") % (
        sys.executable, os.path.join(BIN, "apply-cmvn.py"), cmvn, fbank_ark,
        sys.executable, os.path.join(BIN, "add-deltas.py"))
    out = dict(kaldi.SequentialBaseFloatMatrixReader(pipe))
    assert out["u1"].shape[1] == 120  # 40 * (1 + 2 deltas)

    # select-feats blank rotation semantics
    sel_ark = str(tmp_path / "sel.ark")
    run_tool([sys.executable, os.path.join(BIN, "select-feats.py"),
              "39,0-38", "ark:" + fbank_ark, "ark:" + sel_ark])
    sel = dict(kaldi.SequentialBaseFloatMatrixReader("ark:" + sel_ark))
    np.testing.assert_allclose(sel["u0"][:, 0], feats["u0"][:, 39])
    np.testing.assert_allclose(sel["u0"][:, 1:], feats["u0"][:, :39])


@pytest.mark.slow
def test_analyze_counts_and_class_prior(tmp_path):
    labels_ark = str(tmp_path / "labels.ark")
    with kaldi.Int32VectorWriter("ark:" + labels_ark) as writer:
        writer.Write("a", np.array([0, 0, 1, 2], np.int32))
        writer.Write("b", np.array([2, 3], np.int32))
    counts = str(tmp_path / "label.counts")
    run_tool([sys.executable, os.path.join(BIN, "analyze-counts.py"),
              "ark:" + labels_ark, counts])
    assert open(counts).read().split() == \
        "[ 2 1 2 1 ]".split()

    from lstm_ctc_tpu.train.class_prior import get_class_prior
    prior = get_class_prior(counts)
    # blank (index 0, count 2) rotated to the end
    np.testing.assert_allclose(prior[-1], np.log(2 / 6), atol=1e-5)
    np.testing.assert_allclose(prior[0], np.log(1 / 6), atol=1e-5)


def test_subtract_log_prior_suppresses_unseen_classes(tmp_path):
    """A class with zero training count must come out hugely NEGATIVE
    (never hypothesized), not +1e10 as the reference's subtraction
    yields (reference nnet/class_prior.py:36-38 + bin/nnet-forward.py:
    87-91 — a latent bug that only fires when a unit never occurs)."""
    from lstm_ctc_tpu.train.class_prior import (
        LOG_ZERO, get_class_prior, subtract_log_prior)

    counts = tmp_path / "label.counts"
    counts.write_text("[ 3 2 0 1 ]\n")   # class 2 (→ net index 1) unseen
    prior = get_class_prior(str(counts))
    assert prior[1] == LOG_ZERO

    log_post = np.log(np.full((5, 4), 0.25, np.float32))
    out = subtract_log_prior(log_post, prior)
    assert np.all(out[:, 1] <= LOG_ZERO)
    # seen classes get the ordinary subtraction
    np.testing.assert_allclose(out[:, 0], log_post[:, 0] - prior[0],
                               atol=1e-5)


def test_mfcc_use_energy_kaldi_semantics():
    """use_energy=True (the Kaldi default): DCT runs over the mel bins
    and C0 is REPLACED by the log energy (this crashed with a matmul
    shape mismatch before)."""
    rng = np.random.RandomState(0)
    wave = (rng.randn(16000) * 1000).astype(np.float32)
    with_e = compute_mfcc(wave, use_energy=True, dither=0.0)
    without = compute_mfcc(wave, use_energy=False, dither=0.0)
    assert with_e.shape == without.shape == (with_e.shape[0], 13)
    # all higher cepstra identical; only C0 differs (energy vs DCT-C0)
    np.testing.assert_allclose(with_e[:, 1:], without[:, 1:], rtol=1e-5)
    assert not np.allclose(with_e[:, 0], without[:, 0])


def test_fbank_raw_energy_is_pre_window():
    """raw_energy=True (Kaldi default) measures the frame energy before
    preemphasis/windowing — systematically larger than the processed-
    frame energy (the window attenuates edges, preemphasis removes
    low-frequency power)."""
    rng = np.random.RandomState(1)
    wave = (rng.randn(8000) * 1000).astype(np.float32)
    raw = compute_fbank(wave, use_energy=True, raw_energy=True,
                                 dither=0.0)
    proc = compute_fbank(wave, use_energy=True,
                                  raw_energy=False, dither=0.0)
    np.testing.assert_allclose(raw[:, 1:], proc[:, 1:], rtol=1e-5)
    assert np.all(raw[:, 0] > proc[:, 0])
