"""Fixture-corpus tests for the WSJ / LibriSpeech recipe data-prep stages.

Real corpora (LDC WSJ, OpenSLR LibriSpeech) are not present in CI, so
these tests build miniature fake corpus trees — WSJ .ndx indices, .dot
transcripts and "sphere" audio behind a sph2pipe stub; the LibriSpeech
directory layout with .trans.txt chapters — and drive the actual recipe
scripts (egs/wsj/run_wsj_phn.sh stages 1-6, egs/libri/run_libri_ph.sh
stages 1-6) end-to-end: data prep → phone dict → LM training → TLG
graph → fbank/CMVN → CTC labels → records → micro training → lattice
decode + WER sweep → const-arpa rescore.

This executes every helper in egs/wsj/local/ and egs/libri/local/ that
the recipes use (ndx2flist.pl, flist2scp.pl, find_transcripts.pl,
normalize_transcript.pl, wsj_data_prep.sh, wsj_prepare_phn_dict.sh,
libri_data_prep.sh, libri_prepare_phn_dict.sh), mirroring the behavior
of the reference's local/wsj_data_prep.sh:1 and libri_data_prep.sh:1.
"""

import os
import struct
import subprocess
import sys
import wave

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORDS = {
    # word → phones (CMU style, with stress digits for the WSJ dict)
    "ONE": "W AH1 N",
    "TWO": "T UW1",
    "THREE": "TH R IY1",
    "FOUR": "F AO1 R",
    "FIVE": "F AY1 V",
    "SIX": "S IH1 K S",
    "SEVEN": "S EH1 V AH0 N",
    "EIGHT": "EY1 T",
    "NINE": "N AY1 N",
    "TEN": "T EH1 N",
}


def _write_wav(path, seed, seconds=0.7, rate=16000):
    rng = np.random.RandomState(seed)
    n = int(seconds * rate)
    pcm = (rng.randn(n) * 3000).astype(np.int16)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with wave.open(path, "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(rate)
        fh.writeframes(struct.pack("<%dh" % n, *pcm))


def _sentence(rng):
    n = rng.randint(3, 8)
    words = list(WORDS)
    return " ".join(words[rng.randint(len(words))] for _ in range(n))


def _run(cmd, cwd, extra_env=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"   # CLIs must not touch the accelerator
    env["PYTHON"] = sys.executable
    if extra_env:
        env.update(extra_env)
    proc = subprocess.run(cmd, cwd=cwd, env=env,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          text=True)
    if proc.returncode != 0:
        raise AssertionError("command failed (%d): %s\n%s"
                             % (proc.returncode, " ".join(map(str, cmd)),
                                proc.stdout[-6000:]))
    return proc.stdout


def _scp_cols(scp_path):
    cols = set()
    with open(scp_path) as fh:
        for line in fh:
            parts = line.split()
            assert len(parts) == 5, line
            cols.add(int(parts[2]))
    return cols


# ---------------------------------------------------------------- WSJ ---

def _build_wsj_fixture(root):
    """Fake WSJ0/WSJ1 discs: ndx indices, .wv1 'sphere' audio (actually
    RIFF wav behind the sph2pipe stub), per-speaker .dot transcripts."""
    rng = np.random.RandomState(42)
    wsj0 = root / "wsj0"
    wsj1 = root / "wsj1"

    def add_set(corpus, subdir, speakers, utts_per_spk, ndx_rel, disk):
        entries = []
        for spk in speakers:
            dot_lines = []
            for u in range(utts_per_spk):
                utt = "%sc02%02d" % (spk, u + 1)
                rel = "%s/%s/%s/%s.wv1" % (
                    corpus.name, subdir, spk, utt)
                _write_wav(str(corpus / corpus.name / subdir / spk /
                               (utt + ".wv1")),
                           seed=hash((spk, u)) % 2 ** 31)
                dot_lines.append("%s (%s)" % (_sentence(rng).lower(), utt))
                entries.append("%s:%s" % (disk, rel))
            dot = corpus / corpus.name / subdir / spk / (spk + "c0200.dot")
            dot.write_text("\n".join(dot_lines) + "\n")
        ndx = corpus / corpus.name / "doc" / "indices" / ndx_rel
        ndx.parent.mkdir(parents=True, exist_ok=True)
        ndx.write_text("; fake WSJ index\n" + "\n".join(entries) + "\n")
        return entries

    # si84 (wsj0) + si200 (wsj1) → train_si284; 24 train utts total
    add_set(wsj0, "si_tr_s", ["011", "012"], 8,
            "train/tr_s_wv1.ndx", "11_1_1")
    add_set(wsj1, "si_tr_s", ["4k1"], 8, "si_tr_s.ndx", "13_1_1")
    add_set(wsj1, "si_dt_20", ["4k0"], 2, "h1_p0.ndx", "13_16_1")
    add_set(wsj0, "si_et_20", ["440"], 2, "test/nvp/si_et_20.ndx",
            "11_2_1")

    # one transcript with WSJ verbalized noise/emphasis artifacts to
    # exercise normalize_transcript.pl (reference normalize_transcript.pl)
    spk_dir = wsj0 / "wsj0" / "si_tr_s" / "011"
    dot = spk_dir / "011c0200.dot"
    lines = dot.read_text().splitlines()
    lines[0] = "one [loud_breath] *two* three . (011c0201)"
    dot.write_text("\n".join(lines) + "\n")

    cmudict = root / "cmudict.0.7a"
    entries = [";;; fake CMU dict"]
    for w, phones in WORDS.items():
        entries.append("%s  %s" % (w, phones))
    entries.append("ONE(2)  HH W AH1 N")   # alternate pronunciation
    cmudict.write_text("\n".join(entries) + "\n")

    stub_dir = root / "stub_bin"
    stub_dir.mkdir()
    sph = stub_dir / "sph2pipe"
    # fixture .wv1 files already hold RIFF bytes; real sph2pipe would
    # convert SPHERE→RIFF here
    sph.write_text("#!/bin/bash\nexec cat \"${@: -1}\"\n")
    sph.chmod(0o755)
    return wsj0, wsj1, cmudict, stub_dir


@pytest.mark.slow
def test_wsj_recipe_stages_1_to_6(tmp_path):
    wsj0, wsj1, cmudict, stub_dir = _build_wsj_fixture(tmp_path)
    work = tmp_path / "work"
    path_with_stub = str(stub_dir) + os.pathsep + os.environ.get("PATH", "")
    _run(["bash", os.path.join(REPO, "egs/wsj/run_wsj_phn.sh"),
          "--wsj0", str(wsj0), "--wsj1", str(wsj1),
          "--cmudict", str(cmudict), "--work", str(work),
          "--stage", "1", "--stop-stage", "6", "--nj", "2",
          # micro model so the 1-iteration CPU training finishes fast
          "--num-layers", "1", "--num-neurons", "16",
          "--num-projects", "8", "--num-experts", "0",
          "--batch-size", "4", "--max-iter", "1", "--pack-factor", "2"],
         cwd=REPO, extra_env={"PATH": path_with_stub})

    data = work / "data"
    # --- data prep (wsj_data_prep.sh + perl helpers) ---
    text = dict(line.split(" ", 1) for line in
                (data / "train_si284" / "text").read_text().splitlines())
    assert len(text) == 24
    # normalize_transcript.pl: noise → <NOISE>, *emphasis* stripped,
    # "." dropped, uppercased
    assert text["011c0201"].strip() == "ONE <NOISE> TWO THREE"
    for name, expect in [("test_dev93", 2), ("test_eval92", 2)]:
        assert len((data / name / "text").read_text().splitlines()) == expect
    wav_line = (data / "train_si284" / "wav.scp").read_text().splitlines()[0]
    assert "sph2pipe -f wav" in wav_line and wav_line.endswith("|")
    spk2utt = (data / "train_si284" / "spk2utt").read_text().splitlines()
    assert sorted(line.split()[0] for line in spk2utt) == \
        ["011", "012", "4k1"]

    # --- dict (wsj_prepare_phn_dict.sh): stress digits stripped,
    # alternates merged, <UNK>/<NOISE> → nsn ---
    lex = (data / "local/dict_phn/lexicon.txt").read_text()
    assert "ONE w ah n\n" in lex and "ONE hh w ah n\n" in lex
    assert "<NOISE> nsn\n" in lex
    units = (data / "local/dict_phn/units.txt").read_text().splitlines()
    assert all(len(line.split()) == 2 for line in units)

    # --- self-trained LMs + TLG + const-arpa (stage 1 tail) ---
    assert (data / "local/local_lm/tg.arpa").stat().st_size > 0
    assert (data / "lang_phn_test_tgpr/TLG.fst").stat().st_size > 0
    assert (data / "lang_phn_test_tgconst/G.carpa").stat().st_size > 0

    # --- fbank + records: conversion must add Δ+ΔΔ so record dims match
    # the recipe's input_dim=120 contract (reference run_wsj_phn.sh:162-168
    # add-deltas in the conversion pipe) ---
    assert _scp_cols(data / "records_phn" / "tr" / "tfrecords.scp") == {120}
    assert _scp_cols(data / "records_phn" / "cv" / "tfrecords.scp") == {120}
    n_tr = len((data / "records_phn/tr/tfrecords.scp")
               .read_text().splitlines())
    n_cv = len((data / "records_phn/cv/tfrecords.scp")
               .read_text().splitlines())
    assert n_tr == 23 and n_cv == 1   # 95/5 split of 24

    # length-sorted scp is non-decreasing in frame count
    exp = work / "exp" / "train_phn_l1_c16_m0"
    counts = (exp / "label.counts").read_text()
    assert counts.startswith("[") and counts.rstrip().endswith("]")

    # --- stage 4: the 1-iteration micro training ran on the records ---
    assert (exp / "final.nnet").exists()
    assert (exp / "nnet.1").exists()

    # --- stage 5: lattice decode of both test sets (decode_ctc_lat.sh
    # inside the recipe: forward → blank reorder → native latgen →
    # acwt-sweep scoring; reference run_wsj_phn.sh:267-277) ---
    for set_name in ("dev93", "eval92"):
        wers = list((exp / ("decode_" + set_name)).glob("wer_*"))
        assert wers, "no wer files for %s" % set_name
        assert any("summary" in w.read_text() for w in wers)

    # --- stage 6: const-arpa rescore produced its own scored decode dir
    # (lmrescore_const_arpa.sh; reference run_wsj_phn.sh:279-286) ---
    for set_name in ("dev93", "eval92"):
        rescored = exp / ("decode_%s_tgconst" % set_name)
        assert list(rescored.glob("wer_*")), "no rescored wer files"


# ---------------------------------------------------------- LibriSpeech ---

def _build_libri_fixture(root):
    rng = np.random.RandomState(7)
    libri = root / "LibriSpeech"
    subsets = {
        "train-clean-100": [("103", "1240", 6), ("198", "126831", 6)],
        "train-clean-360": [("332", "1000", 6)],
        "train-other-500": [("700", "2000", 6)],
        "dev-clean": [("251", "118436", 2)],
        "dev-other": [("116", "288045", 2)],
        "test-clean": [("1089", "134686", 2)],
        "test-other": [("1688", "142285", 2)],
    }
    for subset, chapters in subsets.items():
        for spk, chap, n in chapters:
            chap_dir = libri / subset / spk / chap
            chap_dir.mkdir(parents=True, exist_ok=True)
            lines = []
            for u in range(n):
                utt = "%s-%s-%04d" % (spk, chap, u)
                _write_wav(str(chap_dir / (utt + ".wav")),
                           seed=hash(utt) % 2 ** 31)
                lines.append("%s %s" % (utt, _sentence(rng)))
            (chap_dir / ("%s-%s.trans.txt" % (spk, chap))).write_text(
                "\n".join(lines) + "\n")

    phn_dict = root / "librispeech_phn_fixture_dict.txt"
    phn_dict.write_text("".join(
        "%s %s\n" % (w, " ".join(p.rstrip("012").lower()
                                 for p in ph.split()))
        for w, ph in WORDS.items()))
    return libri, phn_dict


@pytest.mark.slow
def test_libri_recipe_stages_1_to_6(tmp_path):
    import gzip

    libri, phn_dict = _build_libri_fixture(tmp_path)
    work = tmp_path / "work"

    # tiny ARPAs stand in for the downloadable OpenSLR-11 LMs: tgsmall
    # passed via --lm-arpa; tgmed/tglarge/fglarge dropped into --lm-dir
    # so stage 1 builds the tgmed graph and the const-arpa rescore dirs
    lm = tmp_path / "tgsmall.arpa"
    rng = np.random.RandomState(1)
    corpus = tmp_path / "lm_corpus.txt"
    corpus.write_text("".join("utt%d %s\n" % (i, _sentence(rng))
                              for i in range(50)))
    with open(lm, "w") as fh:
        subprocess.run([sys.executable, os.path.join(REPO, "bin/train-lm.py"),
                        "--order", "2", str(corpus)],
                       stdout=fh, check=True,
                       env=dict(os.environ, JAX_PLATFORMS="cpu"))
    lm_dir = tmp_path / "lm_dir"
    lm_dir.mkdir()
    arpa_bytes = lm.read_bytes()
    for name in ("lm_tgmed", "lm_tglarge", "lm_fglarge"):
        with gzip.open(lm_dir / (name + ".arpa.gz"), "wb") as fh:
            fh.write(arpa_bytes)

    _run(["bash", os.path.join(REPO, "egs/libri/run_libri_ph.sh"),
          "--librispeech", str(libri), "--phn-dict", str(phn_dict),
          "--lm-arpa", str(lm), "--lm-dir", str(lm_dir),
          "--work", str(work),
          "--stage", "1", "--stop-stage", "6", "--nj", "1",
          # micro model so CPU training + decode stay fast
          "--num-layers", "1", "--num-neurons", "16",
          "--num-projects", "8", "--num-experts", "0",
          "--batch-size", "4", "--max-iter", "1", "--pack-factor", "2"],
         cwd=REPO)

    data = work / "data"
    # libri_data_prep.sh: every subset prepared, sorted, spk2utt grouped
    for subset, n_expected in [("train_clean_100", 12),
                               ("train_clean_360", 6),
                               ("train_other_500", 6),
                               ("dev_clean", 2), ("test_other", 2)]:
        lines = (data / subset / "text").read_text().splitlines()
        assert len(lines) == n_expected, subset
        assert lines == sorted(lines)
    utt2spk = dict(line.split() for line in
                   (data / "train_clean_100" / "utt2spk")
                   .read_text().splitlines())
    assert utt2spk["103-1240-0000"] == "103"

    # merged 960 set and 95/5 split
    assert len((data / "train_960" / "text").read_text().splitlines()) == 24
    # records carry Δ+ΔΔ (input_dim=120 contract)
    assert _scp_cols(data / "records_phn" / "tr" / "tfrecords.scp") == {120}
    n_tr = len((data / "records_phn/tr/tfrecords.scp")
               .read_text().splitlines())
    n_cv = len((data / "records_phn/cv/tfrecords.scp")
               .read_text().splitlines())
    assert n_tr + n_cv == 24 and n_cv == 1

    # dict + priors
    units = (data / "local/dict_phn/units.txt").read_text().splitlines()
    assert all(len(line.split()) == 2 for line in units)
    exp = work / "exp" / "train_phn_l1_c16_m0"
    assert (exp / "label.counts").exists()
    # stage-1 graphs: tgsmall + tgmed TLG, tglarge/fglarge const-arpa
    assert (data / "lang_phn_test_tgsmall" / "TLG.fst").stat().st_size > 0
    assert (data / "lang_phn_test_tgmed" / "TLG.fst").stat().st_size > 0
    for lm in ("tglarge", "fglarge"):
        assert (data / ("lang_phn_test_" + lm) / "G.carpa").stat().st_size > 0

    # stage 4 micro training
    assert (exp / "final.nnet").exists()

    # stage 5: 4 test sets × {tgsmall, tgmed} lattice decodes, scored
    # (reference run_libri_ph.sh:322-331)
    for set_name in ("dev_clean", "dev_other", "test_clean", "test_other"):
        for lm in ("tgsmall", "tgmed"):
            wers = list((exp / ("decode_%s_%s" % (set_name, lm)))
                        .glob("wer_*"))
            assert wers, "no wer files for %s/%s" % (set_name, lm)

    # stage 6: tglarge/fglarge const-arpa rescores of the tgsmall decodes
    # (reference run_libri_ph.sh:333-337)
    for set_name in ("dev_clean", "dev_other", "test_clean", "test_other"):
        for lm in ("tglarge", "fglarge"):
            rescored = exp / ("decode_%s_tgsmall_%s" % (set_name, lm))
            assert list(rescored.glob("wer_*")), \
                "no rescored wer files for %s/%s" % (set_name, lm)
