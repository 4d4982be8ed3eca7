"""N-gram LM trainer: modified-KN estimation, ARPA validity, pruning,
perplexity sanity, and interop with the native ARPA consumers."""

import math
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
FSTBIN = os.path.join(REPO, "native", "build")

from lstm_ctc_tpu.lm import perplexity, train_ngram_lm, write_arpa
from lstm_ctc_tpu.lm.ngram import BOS, EOS, NgramLm


def corpus(n=400, seed=0):
    """Synthetic Markov-ish text: structure for KN to exploit."""
    rng = np.random.RandomState(seed)
    nouns = ["cat", "dog", "bird", "fish"]
    verbs = ["sees", "chases", "likes"]
    sents = []
    for _ in range(n):
        s = ["the", nouns[rng.randint(4)], verbs[rng.randint(3)],
             "the", nouns[rng.randint(4)]]
        if rng.rand() < 0.3:
            s.append("today")
        sents.append(s)
    return sents


def test_probabilities_sum_to_one():
    """For any seen history, sum_w p(w|h) over the full vocab ≈ 1 —
    the core ARPA backoff invariant (discount mass goes to backoff)."""
    lm = train_ngram_lm(corpus(), order=3)
    vocab = [g[0] for g in lm.probs[1] if g[0] != BOS]
    for history in [(), ("the",), ("the", "cat"), ("cat", "sees")]:
        total = sum(10.0 ** lm.logprob(history, w) for w in vocab)
        assert abs(total - 1.0) < 1e-4, (history, total)


def test_kn_beats_unigram_and_raw_addone():
    train = corpus(400, seed=0)
    heldout = corpus(100, seed=1)
    tri = train_ngram_lm(train, order=3)
    uni = train_ngram_lm(train, order=1)
    ppl_tri = perplexity(tri, heldout)
    ppl_uni = perplexity(uni, heldout)
    assert ppl_tri < ppl_uni / 2, (ppl_tri, ppl_uni)
    # the structured corpus should be nearly memorized by a trigram
    assert ppl_tri < 8.0, ppl_tri


def test_oov_maps_to_unk():
    vocab = {"the", "cat", "dog", "bird", "fish", "sees", "chases",
             "likes", "today"}
    lm = train_ngram_lm(corpus(), order=2, vocab=vocab)
    assert ("<unk>",) not in lm.probs[1] or True
    # a completely new word scores as <unk> (finite) when <unk> trained
    lm2 = train_ngram_lm(corpus() + [["zebra"]], order=2,
                         vocab=vocab)
    assert lm2.logprob(("the",), "qqq") > -99.0


def test_pruning_shrinks_and_keeps_quality():
    train = corpus(400)
    heldout = corpus(100, seed=1)
    full = train_ngram_lm(train, order=3)
    # 0.01 genuinely prunes this small corpus's trigrams; the previous
    # 1e-4 only "shrank" the model by wrongly dooming <s>-history grams
    # (the bug test_pruning_keeps_sentence_initial_grams pins)
    pruned = train_ngram_lm(train, order=3, prune_threshold=0.01)
    assert len(pruned.probs[3]) < len(full.probs[3])
    assert any(g[0] == BOS for g in pruned.probs[2])
    # pruned model still far better than unigram
    uni = train_ngram_lm(train, order=1)
    assert perplexity(pruned, heldout) < perplexity(uni, heldout) / 2
    # probabilities still normalized after bow recomputation
    vocab = [g[0] for g in pruned.probs[1] if g[0] != BOS]
    for history in [("the",), ("the", "cat")]:
        total = sum(10.0 ** pruned.logprob(history, w) for w in vocab)
        assert abs(total - 1.0) < 1e-4, (history, total)


def test_arpa_roundtrip_format(tmp_path):
    """write_arpa output is well-formed: section counts match, bows only
    below the top order."""
    lm = train_ngram_lm(corpus(50), order=3)
    arpa = tmp_path / "lm.arpa"
    with open(arpa, "w") as fh:
        write_arpa(lm, fh)
    text = arpa.read_text().splitlines()
    counts = {}
    for line in text:
        if line.startswith("ngram "):
            k, n = line[6:].split("=")
            counts[int(k)] = int(n)
    for k in (1, 2, 3):
        section = text.index("\\%d-grams:" % k)
        grams = 0
        for line in text[section + 1:]:
            if not line.strip():
                break
            parts = line.split("\t")
            assert len(parts) in (2, 3)
            if k == 3:
                assert len(parts) == 2       # no bow at top order
            grams += 1
        assert grams == counts[k], k


@pytest.mark.skipif(
    not os.path.exists(os.path.join(FSTBIN, "fst-tools")),
    reason="native tools not built")
def test_trained_arpa_feeds_native_consumers(tmp_path):
    """The trainer's ARPA loads through arpa2fst AND arpa-to-const-arpa —
    the end-to-end LM estimation → decode-graph path."""
    lm = train_ngram_lm(corpus(100), order=3, prune_threshold=1e-5)
    arpa = tmp_path / "lm.arpa"
    with open(arpa, "w") as fh:
        write_arpa(lm, fh)
    words = sorted({g[0] for g in lm.probs[1]} - {BOS, EOS})
    words_txt = tmp_path / "words.txt"
    words_txt.write_text(
        "<eps> 0\n"
        + "".join("%s %d\n" % (w, i + 1) for i, w in enumerate(words))
        + "#0 %d\n" % (len(words) + 1))
    g_fst = tmp_path / "G.fst"
    subprocess.run(
        [os.path.join(FSTBIN, "fst-tools"), "arpa2fst",
         "--disambig-symbol=#0", "--read-symbol-table=%s" % words_txt,
         str(arpa), str(g_fst)], check=True, capture_output=True)
    assert g_fst.stat().st_size > 0
    carpa = tmp_path / "G.carpa"
    out = subprocess.run(
        [os.path.join(FSTBIN, "arpa-to-const-arpa"),
         str(arpa), str(words_txt), str(carpa)],
        check=True, capture_output=True, text=True)
    assert carpa.stat().st_size > 0
    assert "dropped (missing prefix)" in out.stderr
    # prefix closure must hold even after pruning
    assert " 0 dropped (missing prefix)" in out.stderr


def test_train_lm_cli(tmp_path):
    text = tmp_path / "text"
    text.write_text("".join(
        "utt%d %s\n" % (i, " ".join(s)) for i, s in enumerate(corpus(60))))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "train-lm.py"),
         "--order", "2", "--ppl-text", str(text), str(text)],
        capture_output=True, text=True, check=True)
    assert out.stdout.startswith("\\data\\")
    assert "\\2-grams:" in out.stdout
    assert "perplexity" in out.stderr


def test_native_counter_matches_python(tmp_path):
    """native/build/count-ngrams must reproduce _count_ngrams exactly
    (incl. vocab OOV mapping, min-count cutoffs, kaldi id columns)."""
    import os
    import numpy as np
    import pytest as _pytest
    from lstm_ctc_tpu.lm.ngram import (
        BOS, EOS, UNK, _count_ngrams, _native_counter_path,
        count_ngrams_file, read_sentences)

    if _native_counter_path() is None:
        _pytest.skip("count-ngrams not built")

    rng = np.random.RandomState(0)
    words = ["w%d" % i for i in range(30)]
    lines = []
    for u in range(200):
        n = rng.randint(1, 12)
        lines.append("utt%03d %s" % (
            u, " ".join(rng.choice(words) for _ in range(n))))
    lines.append("utt_empty")      # id-only line: skipped by both
    text = tmp_path / "text"
    text.write_text("\n".join(lines) + "\n", encoding="utf-8")
    vocab_file = tmp_path / "vocab"
    vocab_file.write_text("\n".join(words[:20]) + "\n", encoding="utf-8")

    for vocab_path, min_counts in [(None, None),
                                   (str(vocab_file), None),
                                   (str(vocab_file), [1, 1, 2])]:
        native = count_ngrams_file(str(text), 3, vocab_path=vocab_path,
                                   kaldi_text=True, min_counts=min_counts)
        os.environ["LSTM_CTC_TPU_NATIVE_COUNTS"] = "0"
        try:
            ref = count_ngrams_file(str(text), 3, vocab_path=vocab_path,
                                    kaldi_text=True,
                                    min_counts=min_counts)
        finally:
            os.environ.pop("LSTM_CTC_TPU_NATIVE_COUNTS")
        for k in range(1, 4):
            assert native[k] == ref[k], "order %d, vocab=%s cuts=%s" % (
                k, vocab_path, min_counts)


def test_native_counter_gz_streams(tmp_path):
    """A .gz corpus must produce identical counts to the plain file —
    via the chunk-streamed stdin pipe (no full-corpus buffering; the
    native counter exists for corpora that do not fit in RAM)."""
    import gzip
    import numpy as np
    import pytest as _pytest
    from lstm_ctc_tpu.lm.ngram import _native_counter_path, count_ngrams_file

    if _native_counter_path() is None:
        _pytest.skip("count-ngrams not built")

    rng = np.random.RandomState(3)
    words = ["w%d" % i for i in range(15)]
    lines = ["utt%03d %s" % (u, " ".join(
        rng.choice(words) for _ in range(rng.randint(1, 10))))
        for u in range(300)]
    text = tmp_path / "text"
    text.write_text("\n".join(lines) + "\n", encoding="utf-8")
    gz = tmp_path / "text.gz"
    with gzip.open(gz, "wt", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")

    plain = count_ngrams_file(str(text), 3, kaldi_text=True)
    zipped = count_ngrams_file(str(gz), 3, kaldi_text=True)
    for k in range(1, 4):
        assert plain[k] == zipped[k]


def test_train_lm_cli_native_and_python_identical(tmp_path):
    """The full train-lm.py ARPA output must be byte-identical whether
    counting ran in C++ or Python."""
    import os
    import subprocess
    import sys as _sys
    import numpy as np
    import pytest as _pytest
    from lstm_ctc_tpu.lm.ngram import _native_counter_path

    if _native_counter_path() is None:
        _pytest.skip("count-ngrams not built")

    rng = np.random.RandomState(7)
    words = ["a", "b", "c", "d", "e", "f"]
    text = tmp_path / "text"
    text.write_text("\n".join(
        "u%d %s" % (u, " ".join(rng.choice(words)
                                for _ in range(rng.randint(2, 9))))
        for u in range(150)) + "\n", encoding="utf-8")

    def run(env_extra):
        env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
        out = subprocess.run(
            [_sys.executable, "bin/train-lm.py", "--order", "3",
             "--prune", "1e-8", str(text)],
            capture_output=True, check=True, env=env,
            cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
        return out.stdout

    native = run({})
    python = run({"LSTM_CTC_TPU_NATIVE_COUNTS": "0"})
    assert native == python
    assert b"\\1-grams:" in native


def test_pruning_keeps_sentence_initial_grams():
    """The history-marginal chain must not multiply in the -99 <s>
    placeholder — that doomed EVERY sentence-initial n-gram at any
    threshold, collapsing sentence starts to bare unigrams."""
    rng = __import__("random").Random(0)
    words = ["a", "b", "c", "d", "e"]
    sents = [[rng.choice(words) for _ in range(rng.randint(3, 8))]
             for _ in range(400)]
    lm = train_ngram_lm(sents, order=3, prune_threshold=1e-7)
    bos_bigrams = [g for g in lm.probs[2] if g[0] == "<s>"]
    assert bos_bigrams, "pruning removed every <s>-history bigram"


def test_unk_symbol_follows_wordlist_convention():
    """Kaldi wordlists carry '<UNK>'; OOVs must map to the wordlist's
    symbol or every OOV n-gram is dropped as out-of-symbol-table when
    the ARPA is compiled against words.txt."""
    import io

    sents = [["hello", "world"], ["hello", "there"],
             ["rareword", "world"]]
    vocab = {"hello", "world", "there", "<UNK>"}
    lm = train_ngram_lm(sents, order=2, vocab=vocab)
    buf = io.StringIO()
    write_arpa(lm, buf)
    arpa = buf.getvalue()
    assert "<UNK>" in arpa
    assert "<unk>" not in arpa
    # OOV queries hit the wordlist's symbol
    assert lm.logprob((), "neverseen") == lm.logprob((), "<UNK>")
