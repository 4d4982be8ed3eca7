"""External validation of the modified-KN trainer (lm/ngram.py).

SRILM/KenLM are not installable in CI, so the "known-good KN
implementation" contract the reference's LMs meet (reference
local/wsj_train_lms.sh:1) is checked two ways:

1. hand-derived golden probabilities: Chen & Goodman (1998) interpolated
   modified-KN computed symbolically for a 3-sentence corpus (full
   derivation in comments) — an implementation-independent check of the
   discount, interpolation and backoff-weight formulas;
2. cross-implementation perplexity: held-out perplexity within a few %
   of NLTK's KneserNeyInterpolated on the same corpus with identical
   prediction counts.
"""

import math

import numpy as np
import pytest

from lstm_ctc_tpu.lm.ngram import perplexity, train_ngram_lm


def test_modified_kn_matches_hand_derivation():
    """Corpus: "a b a c" / "a b" / "c a"  (order 2).

    Bigram raw counts: <s>a:2 ab:2 ba:1 ac:1 c</s>:1 b</s>:1 <s>c:1
    ca:1 a</s>:1.
    Unigram continuation counts (distinct left contexts):
      a:{<s>,b,c}=3  b:{a}=1  c:{<s>,a}=2  </s>:{a,b,c}=3; total 9.

    Bigram discounts from counts-of-counts (n1=7, n2=2, n3=n4=1 after
    the ≥1 clamp): y=7/11, D1=1-2y·n2/n1=7/11, D2=2-3y·n3/n2=23/22,
    D3=3-4y·n4/n3=5/11.
    Unigram discounts (cont. counts incl. the <s> bow host 3:
    n1=1, n2=1, n3=3, n4=1): y=1/3, D1=1/3, D2=2-3·(1/3)·3=-1→0.1
    (clamp), D3=3-4/9=23/9.

    Unigrams (history total 9, N1=1, N2=1, N3+=2, uniform=1/4):
      γ=(1/3+0.1+2·23/9)/9,  p(w)=(c-D(c))/9+γ/4:
      p(a)=p(</s>)=0.2033951  p(b)=0.2280864  p(c)=0.3651235 (sum=1).
    History (a,) (total 4, N1=2, N2=1): γa=(2·7/11+23/22)/4=51/88:
      p(b|a)=(2-23/22)/4+γa·p(b)=0.3708228
      p(c|a)=(1-7/11)/4+γa·p(c)=0.3025147
      p(</s>|a)=(1-7/11)/4+γa·p(</s>)=0.2087858
    History (<s>,) (total 3, N1=1, N2=1): γs=(7/11+23/22)/3=37/66:
      p(a|<s>)=(2-23/22)/3+γs·p(a)=0.4322063
      p(c|<s>)=(1-7/11)/3+γs·p(c)=0.3259025
    bow(a)=(1-Σ p(·|a))/(1-Σ p(·))=51/88=0.5795455.
    """
    lm = train_ngram_lm(
        [["a", "b", "a", "c"], ["a", "b"], ["c", "a"]], order=2)

    def p(order, gram):
        return 10.0 ** lm.probs[order][gram]

    golden_uni = {("a",): 0.2033951, ("b",): 0.2280864,
                  ("c",): 0.3651235, ("</s>",): 0.2033951}
    for gram, want in golden_uni.items():
        assert abs(p(1, gram) - want) < 1e-6, gram
    assert abs(sum(golden_uni.values()) - 1.0) < 1e-6

    golden_bi = {("a", "b"): 0.3708228, ("a", "c"): 0.3025147,
                 ("a", "</s>"): 0.2087858,
                 ("<s>", "a"): 0.4322063, ("<s>", "c"): 0.3259025}
    for gram, want in golden_bi.items():
        assert abs(p(2, gram) - want) < 1e-6, gram

    assert abs(10.0 ** lm.bows[1][("a",)] - 51.0 / 88.0) < 1e-6


def test_heldout_perplexity_matches_nltk_kn():
    """Held-out perplexity vs NLTK's KneserNeyInterpolated (order 3) on
    a closed-vocabulary synthetic corpus: the two KN variants (modified
    vs single-discount) must land within a few % of each other — the
    contract an SRILM/KenLM comparison would check."""
    nltk_lm = pytest.importorskip("nltk.lm")
    from nltk.lm.preprocessing import pad_both_ends, \
        padded_everygram_pipeline
    from nltk.util import ngrams as nltk_ngrams

    rng = np.random.RandomState(5)
    vocab = ["w%d" % i for i in range(20)]
    probs = rng.dirichlet(np.ones(20) * 0.5)

    def gen(n):
        return [[vocab[i] for i in
                 rng.choice(20, size=rng.randint(3, 12), p=probs)]
                for _ in range(n)]

    train, held = gen(400), gen(60)
    ours = train_ngram_lm(train, order=3)
    ppl_ours = perplexity(ours, held)

    model = nltk_lm.KneserNeyInterpolated(3)
    data, voc = padded_everygram_pipeline(3, train)
    model.fit(data, voc)
    logp, toks = 0.0, 0
    for sent in held:
        padded = list(pad_both_ends(sent, n=3))
        for g in nltk_ngrams(padded, 3):
            logp += math.log(max(model.score(g[-1], g[:-1]), 1e-12))
            toks += 1
    ppl_nltk = math.exp(-logp / toks)

    ratio = ppl_ours / ppl_nltk
    assert 0.85 < ratio < 1.10, (ppl_ours, ppl_nltk)
