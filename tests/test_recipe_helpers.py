"""Fixture tests for the niche recipe helpers not exercised by the main
stage-1..4 fixture runs (tests/test_recipe_dataprep.py):

  egs/wsj/local/wsj_prepare_char_dict.sh   (reference local/wsj_prepare_char_dict.sh)
  egs/wsj/local/wsj_expand_vocab.sh        (reference local/wsj_expand_vocab.sh:1-85)
  egs/wsj/local/wsj_decode_graph_local_lms.sh (reference local/wsj_decode_graph_local_lms.sh:1-73)
  egs/wsj/local/make_phone_syll.sh         (reference local/make_phone_syll.sh:1-48)
  egs/libri/local/download_lm.sh           (reference local/download_lm.sh — offline
                                            skip path + symlink layout only; no network in CI)
"""

import gzip
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHON=sys.executable)
    proc = subprocess.run(cmd, cwd=cwd, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    if proc.returncode != 0:
        raise AssertionError("command failed (%d): %s\n%s"
                             % (proc.returncode, " ".join(map(str, cmd)),
                                proc.stdout[-4000:]))
    return proc.stdout


def _char_dict(tmp_path):
    """Run wsj_prepare_char_dict.sh on a small word list; returns the
    dict dir (script writes data/local/dict_char under its cwd)."""
    words = tmp_path / "wordlist.txt"
    words.write_text("CAT\nDOG\nDON'T\n<UNK>\nU.S.\n")
    _run(["bash", os.path.join(REPO, "egs/wsj/local/wsj_prepare_char_dict.sh"),
          str(words)], cwd=str(tmp_path))
    return tmp_path / "data/local/dict_char"


def test_wsj_prepare_char_dict(tmp_path):
    d = _char_dict(tmp_path)
    lex = dict(line.split(" ", 1) for line in
               (d / "lexicon.txt").read_text().splitlines())
    assert lex["CAT"] == "C A T"
    assert lex["DON'T"] == "D O N ' T"       # apostrophe kept
    assert lex["U.S."] == "U . S ."          # periods kept as units
    assert lex["<UNK>"] == "<nsn>"           # marker → noise unit
    units = dict(line.split() for line in
                 (d / "units.txt").read_text().splitlines())
    assert min(int(v) for v in units.values()) == 1   # ids start at 1
    # numeric lexicon consistent with units.txt
    nums = dict(line.split(" ", 1) for line in
                (d / "lexicon_numbers.txt").read_text().splitlines())
    assert nums["CAT"] == " ".join(units[c] for c in ["C", "A", "T"])


def test_wsj_expand_vocab(tmp_path):
    srcdir = _char_dict(tmp_path)
    np_data = tmp_path / "np_data"
    # WSJ LM training text: year subdirs of compress'd (here gzip'd) .z
    # shards, with SGML markup lines and sentence-final glued periods
    text87 = ("<s> headline markup line\n"
              "the cat sat.\n"
              "TACO TACO TACO dog\n")
    text88 = "taco GNU's\n"
    for year, text in [("87", text87), ("88", text88), ("89", "")]:
        ydir = np_data / year
        ydir.mkdir(parents=True)
        with gzip.open(ydir / ("wsj_%s.z" % year), "wt") as fh:
            fh.write(text)
    out = tmp_path / "dict_larger"
    log = _run(["bash", os.path.join(REPO, "egs/wsj/local/wsj_expand_vocab.sh"),
                "--min-count", "2", str(np_data), str(srcdir), str(out)],
               cwd=str(tmp_path))
    assert "OOV entries" in log
    lex = (out / "lexicon.txt").read_text().splitlines()
    # TACO appears 4x (3 + 1 lowercased-then-uppercased) ≥ min-count
    # and all its chars are known units → added, character-spelled
    assert "TACO T A C O" in lex
    # GNU'S appears once → below min-count, excluded
    assert not any(line.startswith("GNU'S") for line in lex)
    # original entries survive
    assert "CAT C A T" in lex
    # markup line was dropped before counting
    unigrams = (out / "unigrams").read_text()
    assert "MARKUP" not in unigrams.upper() or "<S>" not in unigrams
    # sentence-final period split off: "SAT." counted as "SAT"
    oov = (out / "oov.counts").read_text()
    assert "SAT." not in oov


def test_wsj_decode_graph_local_lms(tmp_path):
    srcdir = _char_dict(tmp_path)
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("utt1 CAT DOG CAT\nutt2 DOG CAT\nutt3 CAT CAT DOG\n")
    lm_dir = tmp_path / "local_lm"
    lm_dir.mkdir()
    with open(lm_dir / "tg.arpa", "w") as fh:
        subprocess.run([sys.executable, os.path.join(REPO, "bin/train-lm.py"),
                        "--order", "2", str(corpus)], stdout=fh, check=True,
                       env=dict(os.environ, JAX_PLATFORMS="cpu"))
    (lm_dir / "tgpr.arpa").write_bytes((lm_dir / "tg.arpa").read_bytes())
    _run(["bash",
          os.path.join(REPO, "egs/wsj/local/wsj_decode_graph_local_lms.sh"),
          "--lm-dir", str(lm_dir), str(srcdir), str(tmp_path / "lang")],
         cwd=str(tmp_path))
    for name in ("tg", "tgpr"):
        lang = tmp_path / ("lang_test_%s" % name)
        assert (lang / "TLG.fst").stat().st_size > 0, name
        assert (lang / "tokens.txt").exists() and (lang / "words.txt").exists()


def test_make_phone_syll(tmp_path):
    # syllable symbol table (underscore-joined phones) + int transcripts
    table = tmp_path / "syms.txt"
    table.write_text("k_ae_t 0\nd_ao_g 1\nax 2\n")
    text = tmp_path / "trans.txt"
    text.write_text("utt1 0 2 1\nutt2 1 0\n")
    _run([sys.executable, os.path.join(REPO, "bin/copy-int-vector.py"),
          "ark,t:%s" % text,
          "ark,scp:%s/labels.ark,%s/labels.scp" % (tmp_path, tmp_path)],
         cwd=str(tmp_path))
    out = tmp_path / "out"
    _run(["bash", os.path.join(REPO, "egs/wsj/local/make_phone_syll.sh"),
          "--trans-file", str(tmp_path / "labels.scp"),
          "--trans-table", str(table), "--tgt-dir", str(out)],
         cwd=str(tmp_path))

    # symbol tables: observed units + <blk>, ids from 0
    syll_tab = dict(line.rsplit(" ", 1) for line in
                    (out / "trans.syll.txt").read_text().splitlines())
    assert set(syll_tab) == {"k_ae_t", "d_ao_g", "ax", "<blk>"}
    ph_tab = dict(line.rsplit(" ", 1) for line in
                  (out / "trans.ph.txt").read_text().splitlines())
    assert set(ph_tab) == {"k", "ae", "t", "d", "ao", "g", "ax", "<blk>"}

    # phone-level re-encoding round-trips: utt1 = k ae t ax d ao g
    dump = _run([sys.executable, os.path.join(REPO, "bin/copy-int-vector.py"),
                 "scp:%s" % (out / "feats_ph.scp"), "ark,t:-"],
                cwd=str(tmp_path))
    rows = {line.split()[0]: line.split()[1:]
            for line in dump.splitlines() if line and " " in line}
    inv = {v: k for k, v in ph_tab.items()}
    assert [inv[i] for i in rows["utt1"]] == \
        ["k", "ae", "t", "ax", "d", "ao", "g"]
    # syllable-level archive exists and has both utts
    assert (out / "feats_syll.scp").read_text().count("\n") == 2


def test_download_lm_offline_skip(tmp_path):
    # all six artifacts already present → the script must not touch the
    # network, must report skips, and must lay down the conventional
    # lm_{tgsmall,tgmed,tglarge,fglarge} symlinks
    files = ["3-gram.arpa.gz", "3-gram.pruned.1e-7.arpa.gz",
             "3-gram.pruned.3e-7.arpa.gz", "4-gram.arpa.gz",
             "librispeech-vocab.txt", "librispeech-lexicon.txt"]
    for f in files:
        (tmp_path / f).write_text("stub\n")
    log = _run(["bash", os.path.join(REPO, "egs/libri/local/download_lm.sh"),
                str(tmp_path)], cwd=str(tmp_path))
    assert log.count("already present") == len(files)
    for name, target in [("lm_tgsmall.arpa.gz", "3-gram.pruned.3e-7.arpa.gz"),
                         ("lm_tgmed.arpa.gz", "3-gram.pruned.1e-7.arpa.gz"),
                         ("lm_tglarge.arpa.gz", "3-gram.arpa.gz"),
                         ("lm_fglarge.arpa.gz", "4-gram.arpa.gz")]:
        link = tmp_path / name
        assert link.is_symlink() and os.readlink(str(link)) == target
