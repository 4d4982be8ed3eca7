"""Native C++ WFST toolkit tests: fst-tools algorithms on small examples
and the full TLG build + lattice decode chain."""

import math
import os
import subprocess
import sys

import numpy as np
import pytest

from lstm_ctc_tpu import kaldi

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FSTBIN = os.path.join(REPO, "native", "build")
SCRIPTS = os.path.join(REPO, "scripts")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FSTBIN, "fst-tools")),
    reason="native toolkit not built (cmake -B native/build native && "
           "ninja -C native/build)")


def run(cmd, stdin=None, **kw):
    proc = subprocess.run(cmd, input=stdin, capture_output=True, text=True,
                          cwd=REPO, **kw)
    assert proc.returncode == 0, "%s failed:\n%s" % (cmd, proc.stderr[-2000:])
    return proc.stdout


def fst_tools(*args, stdin=None):
    return run([os.path.join(FSTBIN, "fst-tools"), *args], stdin=stdin)


def compile_text(text, tmp_path, name):
    out = str(tmp_path / name)
    run([os.path.join(FSTBIN, "fst-tools"), "compile", "-", out],
        stdin=text)
    return out


def test_compile_print_roundtrip(tmp_path):
    text = "0\t1\t1\t2\t0.5\n1\t2\t3\t0\n2\n"
    path = compile_text(text, tmp_path, "a.fst")
    printed = fst_tools("print", path)
    assert "0\t1\t1\t2\t0.5" in printed
    assert printed.strip().splitlines()[-1] == "2"


def test_compose_simple(tmp_path):
    # A: maps 1->10, 2->20 in sequence; B: maps 10->100
    a = compile_text("0\t1\t1\t10\n1\t2\t2\t20\n2\n", tmp_path, "a.fst")
    b = compile_text("0\t1\t10\t100\n1\t2\t20\t200\n2\n", tmp_path, "b.fst")
    c = str(tmp_path / "c.fst")
    fst_tools("compose", a, b, c)
    printed = fst_tools("print", c)
    # composed: 1->100 then 2->200
    lines = [l.split("\t") for l in printed.strip().splitlines()]
    arcs = [l for l in lines if len(l) >= 4]
    assert (arcs[0][2], arcs[0][3]) == ("1", "100")
    assert (arcs[1][2], arcs[1][3]) == ("2", "200")


def test_determinize_merges_paths(tmp_path):
    # two equal-input paths with probability 0.5 each (weight ln2);
    # determinized should merge into one arc with the log-sum (weight 0)
    w = "%f" % math.log(2.0)
    text = ("0\t1\t1\t5\t%s\n0\t2\t1\t5\t%s\n1\t3\t2\t0\n2\t3\t2\t0\n3\n"
            % (w, w))
    path = compile_text(text, tmp_path, "nondet.fst")
    det = str(tmp_path / "det.fst")
    fst_tools("determinizestar", path, det)
    printed = fst_tools("print", det)
    arcs = [l.split("\t") for l in printed.strip().splitlines()
            if len(l.split("\t")) >= 4]
    # deterministic: exactly one arc with ilabel 1 from start
    start_arcs = [a for a in arcs if a[0] == arcs[0][0] and a[2] == "1"]
    assert len(start_arcs) == 1
    weight = float(start_arcs[0][4]) if len(start_arcs[0]) > 4 else 0.0
    assert abs(weight) < 1e-4  # -log(0.5 + 0.5)


def test_determinize_epsilon_removal(tmp_path):
    text = "0\t1\t0\t7\n1\t2\t3\t8\n2\n"  # eps-input arc carrying olabel 7
    path = compile_text(text, tmp_path, "eps.fst")
    det = str(tmp_path / "det.fst")
    fst_tools("determinizestar", path, det)
    printed = fst_tools("print", det)
    arcs = [l.split("\t") for l in printed.strip().splitlines()
            if len(l.split("\t")) >= 4]
    # input epsilons removed; outputs 7 then 8 preserved on a path with
    # input 3
    assert all(a[2] != "0" or a[3] != "0" for a in arcs)
    ins = [a[2] for a in arcs]
    outs = [a[3] for a in arcs]
    assert "3" in ins and "7" in outs and "8" in outs


def test_minimize_merges_equivalent_states(tmp_path):
    # two states with identical continuations must merge
    text = ("0\t1\t1\t1\n0\t2\t2\t2\n1\t3\t5\t5\n2\t4\t5\t5\n3\n4\n")
    path = compile_text(text, tmp_path, "m.fst")
    mini = str(tmp_path / "min.fst")
    fst_tools("minimizeencoded", path, mini)
    info = fst_tools("info", mini)
    states = int([l for l in info.splitlines()
                  if l.startswith("states")][0].split()[1])
    assert states == 3  # 0, merged {1,2}, merged {3,4}


def make_tlg(tmp_path):
    """Tiny 3-word lexicon + bigram LM → TLG via make_TLG.sh."""
    dict_dir = tmp_path / "dict"
    dict_dir.mkdir()
    (dict_dir / "lexicon.txt").write_text(
        "cat k ae t\ndog d ao g\ncab k ae b\n")
    units = ["k", "ae", "t", "d", "ao", "g", "b"]
    (dict_dir / "units.txt").write_text(
        "".join("%s %d\n" % (u, i + 1) for i, u in enumerate(units)))
    arpa = tmp_path / "lm.arpa"
    arpa.write_text("""
\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-0.60206 </s>
-99 <s> -0.30103
-0.60206 cat -0.30103
-0.60206 dog -0.30103
-0.60206 cab -0.30103

\\2-grams:
-0.30103 <s> cat
-0.47712 <s> dog
-0.30103 cat dog
-0.30103 dog </s>

\\end\\
""")
    lang = tmp_path / "lang"
    run(["bash", os.path.join(SCRIPTS, "make_TLG.sh"), str(dict_dir),
         str(arpa), str(lang)])
    return lang, units


def test_make_tlg_and_latgen(tmp_path):
    lang, units = make_tlg(tmp_path)
    assert (lang / "TLG.fst").exists()

    # posterior matrix for "cat dog": peaked one-hots with blanks between;
    # EESEN column order: blank at 0, unit k at column k
    unit_id = {u: i + 1 for i, u in enumerate(units)}
    blank = 0

    def frames_for(phones, reps=2, blanks=1):
        cols = []
        for ph in phones:
            cols.extend([unit_id[ph]] * reps)
            cols.extend([blank] * blanks)
        return cols

    seq = frames_for(["k", "ae", "t"]) + [blank] * 2 + \
        frames_for(["d", "ao", "g"]) + [blank] * 2
    num_cols = len(units) + 1
    mat = np.full((len(seq), num_cols), -8.0, np.float32)
    for t, c in enumerate(seq):
        mat[t, c] = 0.0

    post_ark = str(tmp_path / "post.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + post_ark) as writer:
        writer.Write("utt1", mat)

    lat_ark = str(tmp_path / "lat.ark")
    run([os.path.join(FSTBIN, "latgen-faster"),
         "--acoustic-scale=1.0", "--beam=16.0", "--lattice-beam=8.0",
         "--allow-partial=true",
         "--word-symbol-table=%s" % (lang / "words.txt"),
         str(lang / "TLG.fst"), "ark:" + post_ark, "ark:" + lat_ark])

    # best path through the lattice → words
    tra = run([os.path.join(FSTBIN, "lattice-best-path"),
               "ark:" + lat_ark, "ark,t:-"])
    words_txt = (lang / "words.txt").read_text().split()
    word_of = {words_txt[i + 1]: words_txt[i]
               for i in range(0, len(words_txt), 2)}
    tokens = tra.split()
    assert tokens[0] == "utt1"
    decoded = [word_of[t] for t in tokens[1:]]
    assert decoded == ["cat", "dog"], decoded


def test_make_tlg_accepts_gzipped_arpa(tmp_path):
    """The OpenSLR/Kaldi LMs ship gzipped; make_TLG.sh must decompress
    (regression: the .gz used to reach arpa2fst raw, yielding an empty
    G → empty TLG → latgen segfault)."""
    import gzip

    lang, _ = make_tlg(tmp_path)
    plain_info = fst_tools("info", str(lang / "TLG.fst"))
    gz = tmp_path / "lm.arpa.gz"
    with gzip.open(gz, "wb") as fh:
        fh.write((tmp_path / "lm.arpa").read_bytes())
    lang_gz = tmp_path / "lang_gz"
    run(["bash", os.path.join(SCRIPTS, "make_TLG.sh"),
         str(tmp_path / "dict"), str(gz), str(lang_gz)])
    assert fst_tools("info", str(lang_gz / "TLG.fst")) == plain_info


def test_arpa2fst_rejects_junk_input(tmp_path):
    """Unparseable (e.g. still-compressed) ARPA must be a hard error,
    not a silent empty G.fst."""
    words = tmp_path / "words.txt"
    words.write_text("<eps> 0\ncat 1\n#0 2\n")
    junk = tmp_path / "junk.arpa"
    junk.write_bytes(b"\x1f\x8b\x08\x00garbage-not-arpa\x00" * 4)
    proc = subprocess.run(
        [os.path.join(FSTBIN, "fst-tools"), "arpa2fst",
         "--disambig-symbol=#0", "--read-symbol-table=%s" % words,
         str(junk), str(tmp_path / "G.fst")],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode != 0
    assert "no n-grams parsed" in proc.stderr


def test_latgen_refuses_empty_graph(tmp_path):
    """An empty graph (0 states) must fail cleanly, not segfault."""
    empty = tmp_path / "empty.fst"
    empty.write_text("")   # text FST with no states
    proc = subprocess.run(
        [os.path.join(FSTBIN, "latgen-faster"), str(empty),
         "ark:/dev/null", "ark:/dev/null"],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 1
    assert "empty" in proc.stderr


def test_lattice_lmrescore(tmp_path):
    """LM swap through lattice-lmrescore flips an acoustically ambiguous
    decision; same-LM roundtrip (−1 then +1) preserves the best path."""
    lang, units = make_tlg(tmp_path)
    unit_id = {u: i + 1 for i, u in enumerate(units)}

    # ambiguous third phone: "k ae" then t/b equally likely → cat vs cab
    seq = [unit_id["k"]] * 2 + [0] + [unit_id["ae"]] * 2 + [0]
    mat = np.full((len(seq) + 3, len(units) + 1), -8.0, np.float32)
    for t, c in enumerate(seq):
        mat[t, c] = 0.0
    amb = len(seq)
    mat[amb, unit_id["t"]] = -0.7
    mat[amb, unit_id["b"]] = -0.7
    mat[amb + 1, unit_id["t"]] = -0.7
    mat[amb + 1, unit_id["b"]] = -0.7
    mat[amb + 2, 0] = 0.0

    post_ark = str(tmp_path / "amb.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + post_ark) as writer:
        writer.Write("u", mat)
    lat_ark = str(tmp_path / "amb_lat.ark")
    run([os.path.join(FSTBIN, "latgen-faster"), "--acoustic-scale=1.0",
         "--beam=20", "--lattice-beam=12", "--allow-partial=true",
         str(lang / "TLG.fst"), "ark:" + post_ark, "ark:" + lat_ark])

    words_txt = (lang / "words.txt").read_text().split()
    word_of = {words_txt[i + 1]: words_txt[i]
               for i in range(0, len(words_txt), 2)}
    id_of = {v: k for k, v in word_of.items()}

    def best(ark):
        tra = run([os.path.join(FSTBIN, "lattice-best-path"),
                   "ark:" + ark, "ark,t:-"])
        return [word_of[t] for t in tra.split()[1:]]

    # baseline LM has a <s> cat bigram → prefers cat
    assert best(lat_ark) == ["cat"]

    # roundtrip with the same G: unchanged
    mid = str(tmp_path / "mid.ark")
    back = str(tmp_path / "back.ark")
    run([os.path.join(FSTBIN, "lattice-lmrescore"), "--lm-scale=-1.0",
         "ark:" + lat_ark, str(lang / "G.fst"), "ark:" + mid])
    run([os.path.join(FSTBIN, "lattice-lmrescore"), "--lm-scale=1.0",
         "ark:" + mid, str(lang / "G.fst"), "ark:" + back])
    assert best(back) == ["cat"]

    # new LM strongly preferring cab → decision flips
    arpa2 = tmp_path / "lm2.arpa"
    arpa2.write_text("""
\\data\\
ngram 1=5

\\1-grams:
-0.3 </s>
-99 <s>
-2.5 cat
-2.5 dog
-0.2 cab

\\end\\
""")
    run([os.path.join(FSTBIN, "fst-tools"), "arpa2fst",
         "--disambig-symbol=#0",
         "--read-symbol-table=%s" % (lang / "words.txt"),
         str(arpa2), str(tmp_path / "G2.fst")])
    out = str(tmp_path / "resc.ark")
    run([os.path.join(FSTBIN, "lattice-lmrescore"), "--lm-scale=-1.0",
         "ark:" + lat_ark, str(lang / "G.fst"), "ark:" + mid])
    run([os.path.join(FSTBIN, "lattice-lmrescore"), "--lm-scale=1.0",
         "ark:" + mid, str(tmp_path / "G2.fst"), "ark:" + out])
    assert best(out) == ["cab"]


def test_lattice_scale_sweep_changes_nothing_here(tmp_path):
    """lattice-scale roundtrip: scaling acoustic costs preserves the best
    path when acoustics dominate."""
    lang, units = make_tlg(tmp_path)
    unit_id = {u: i + 1 for i, u in enumerate(units)}
    seq = []
    for ph in ["d", "ao", "g"]:
        seq.extend([unit_id[ph]] * 2 + [0])
    mat = np.full((len(seq), len(units) + 1), -8.0, np.float32)
    for t, c in enumerate(seq):
        mat[t, c] = 0.0
    post_ark = str(tmp_path / "post.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + post_ark) as writer:
        writer.Write("u", mat)
    lat_ark = str(tmp_path / "lat.ark")
    run([os.path.join(FSTBIN, "latgen-faster"), "--acoustic-scale=1.0",
         "--allow-partial=true", str(lang / "TLG.fst"),
         "ark:" + post_ark, "ark:" + lat_ark])
    scaled = str(tmp_path / "scaled.ark")
    run([os.path.join(FSTBIN, "lattice-scale"), "--acoustic-scale=5",
         "--ascale-factor=0.1", "ark:" + lat_ark, "ark:" + scaled])
    tra1 = run([os.path.join(FSTBIN, "lattice-best-path"),
                "ark:" + lat_ark, "ark,t:-"])
    tra2 = run([os.path.join(FSTBIN, "lattice-best-path"),
                "ark:" + scaled, "ark,t:-"])
    assert tra1.split()[1:] == tra2.split()[1:]


def test_lattice_oracle(tmp_path):
    """Oracle WER: 0 when the reference is in the lattice, >0 otherwise."""
    lang, units = make_tlg(tmp_path)
    unit_id = {u: i + 1 for i, u in enumerate(units)}
    seq = []
    for ph in ["k", "ae", "t"]:
        seq.extend([unit_id[ph]] * 2 + [0])
    for ph in ["d", "ao", "g"]:
        seq.extend([unit_id[ph]] * 2 + [0])
    mat = np.full((len(seq), len(units) + 1), -8.0, np.float32)
    for t, c in enumerate(seq):
        mat[t, c] = 0.0
    post_ark = str(tmp_path / "post.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + post_ark) as writer:
        writer.Write("u", mat)
    lat_ark = str(tmp_path / "lat.ark")
    run([os.path.join(FSTBIN, "latgen-faster"), "--acoustic-scale=1.0",
         "--beam=16", "--lattice-beam=10", "--allow-partial=true",
         str(lang / "TLG.fst"), "ark:" + post_ark, "ark:" + lat_ark])

    words_txt = (lang / "words.txt").read_text().split()
    id_of = {words_txt[i]: words_txt[i + 1]
             for i in range(0, len(words_txt), 2)}

    # correct reference "cat dog" → oracle distance 0
    ref = tmp_path / "ref.txt"
    ref.write_text("u %s %s\n" % (id_of["cat"], id_of["dog"]))
    out = run([os.path.join(FSTBIN, "lattice-oracle"),
               "ark:" + lat_ark, str(ref), "-"])
    key, dist, ref_len = out.split()
    assert (key, dist, ref_len) == ("u", "0", "2")

    # wrong reference "dog dog" → at least one error
    ref.write_text("u %s %s\n" % (id_of["dog"], id_of["dog"]))
    out = run([os.path.join(FSTBIN, "lattice-oracle"),
               "ark:" + lat_ark, str(ref), "-"])
    assert int(out.split()[1]) >= 1


def test_const_arpa_equivalence(tmp_path):
    """arpa-to-const-arpa + lattice-lmrescore(carpa) produces the SAME
    best paths and total costs as rescoring with the arpa2fst G built
    from the same ARPA — the mmap-able large-LM path is score-equivalent
    to the FST path (Kaldi lmrescore_const_arpa.sh parity)."""
    lang, units = make_tlg(tmp_path)
    unit_id = {u: i + 1 for i, u in enumerate(units)}

    # several utterances with ambiguity so LM scores matter
    post_ark = str(tmp_path / "post.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + post_ark) as writer:
        for n, (a, b) in enumerate([("t", "b"), ("b", "t")]):
            seq = [unit_id["k"]] * 2 + [0] + [unit_id["ae"]] * 2 + [0]
            mat = np.full((len(seq) + 3, len(units) + 1), -8.0, np.float32)
            for t, c in enumerate(seq):
                mat[t, c] = 0.0
            amb = len(seq)
            mat[amb, unit_id[a]] = -0.6
            mat[amb, unit_id[b]] = -0.8
            mat[amb + 1, unit_id[a]] = -0.6
            mat[amb + 1, unit_id[b]] = -0.8
            mat[amb + 2, 0] = 0.0
            writer.Write("u%d" % n, mat)
    lat_ark = str(tmp_path / "lat.ark")
    run([os.path.join(FSTBIN, "latgen-faster"), "--acoustic-scale=1.0",
         "--beam=20", "--lattice-beam=12", "--allow-partial=true",
         str(lang / "TLG.fst"), "ark:" + post_ark, "ark:" + lat_ark])

    # a 2-gram rescoring LM with real backoffs
    arpa2 = tmp_path / "lm2.arpa"
    arpa2.write_text("""
\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-0.4 </s>
-99 <s> -0.30103
-1.2 cat -0.2
-1.2 dog -0.2
-0.5 cab -0.30103

\\2-grams:
-0.15 <s> cab
-0.9 <s> cat
-0.3 cab </s>

\\end\\
""")
    g2 = str(tmp_path / "G2.fst")
    run([os.path.join(FSTBIN, "fst-tools"), "arpa2fst",
         "--disambig-symbol=#0",
         "--read-symbol-table=%s" % (lang / "words.txt"),
         str(arpa2), g2])
    carpa = str(tmp_path / "G2.carpa")
    run([os.path.join(FSTBIN, "arpa-to-const-arpa"),
         str(arpa2), str(lang / "words.txt"), carpa])

    def rescore_and_score(lm_file, tag):
        mid = str(tmp_path / ("mid_%s.ark" % tag))
        out = str(tmp_path / ("out_%s.ark" % tag))
        run([os.path.join(FSTBIN, "lattice-lmrescore"), "--lm-scale=-1.0",
             "ark:" + lat_ark, str(lang / "G.fst"), "ark:" + mid])
        run([os.path.join(FSTBIN, "lattice-lmrescore"), "--lm-scale=1.0",
             "ark:" + mid, lm_file, "ark:" + out])
        costs_file = str(tmp_path / ("costs_%s.txt" % tag))
        tra = run([os.path.join(FSTBIN, "lattice-best-path"),
                   "--write-costs=" + costs_file,
                   "ark:" + out, "ark,t:-"])
        costs = {}
        for line in open(costs_file):
            key, cost = line.split()
            costs[key] = float(cost)
        return tra.split("\n"), costs

    fst_tra, fst_costs = rescore_and_score(g2, "fst")
    carpa_tra, carpa_costs = rescore_and_score(carpa, "carpa")
    assert fst_tra == carpa_tra
    assert set(fst_costs) == set(carpa_costs) == {"u0", "u1"}
    for key in fst_costs:
        assert abs(fst_costs[key] - carpa_costs[key]) < 1e-3, key


def test_const_arpa_trigram_backoff_queries(tmp_path):
    """Direct 3-gram const-arpa semantics: rescoring adds exactly the
    backoff-interpolated ARPA scores (hand-computed) to a linear
    single-path lattice."""
    lang, units = make_tlg(tmp_path)
    unit_id = {u: i + 1 for i, u in enumerate(units)}

    # single unambiguous path "cat dog"
    seq = ([unit_id["k"]] * 2 + [0] + [unit_id["ae"]] * 2 + [0]
           + [unit_id["t"]] * 2 + [0]
           + [unit_id["d"]] * 2 + [0] + [unit_id["ao"]] * 2 + [0]
           + [unit_id["g"]] * 2 + [0])
    mat = np.full((len(seq), len(units) + 1), -8.0, np.float32)
    for t, c in enumerate(seq):
        mat[t, c] = 0.0
    post_ark = str(tmp_path / "post.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + post_ark) as writer:
        writer.Write("u", mat)
    lat_ark = str(tmp_path / "lat.ark")
    run([os.path.join(FSTBIN, "latgen-faster"), "--acoustic-scale=1.0",
         "--beam=20", "--lattice-beam=12", "--allow-partial=true",
         str(lang / "TLG.fst"), "ark:" + post_ark, "ark:" + lat_ark])

    # 3-gram LM covering the path: p(cat|<s>) is a bigram, p(dog|<s> cat)
    # a trigram, p(</s>|cat dog) backs off through (dog) to the unigram:
    # bow(cat dog) + bow(dog) + p(</s>)
    arpa3 = tmp_path / "lm3.arpa"
    arpa3.write_text("""
\\data\\
ngram 1=4
ngram 2=2
ngram 3=1

\\1-grams:
-0.5 </s>
-99 <s> -0.1
-1.0 cat -0.2
-1.0 dog -0.25

\\2-grams:
-0.4 <s> cat -0.15
-0.6 cat dog -0.35

\\3-grams:
-0.2 <s> cat dog

\\end\\
""")
    carpa = str(tmp_path / "G3.carpa")
    run([os.path.join(FSTBIN, "arpa-to-const-arpa"),
         str(arpa3), str(lang / "words.txt"), carpa])

    def best_cost(ark):
        costs_file = str(tmp_path / "costs.txt")
        run([os.path.join(FSTBIN, "lattice-best-path"),
             "--write-costs=" + costs_file, "ark:" + ark, "ark,t:-"])
        return float(open(costs_file).read().split()[1])

    mid = str(tmp_path / "mid.ark")
    out = str(tmp_path / "out.ark")
    run([os.path.join(FSTBIN, "lattice-lmrescore"), "--lm-scale=-1.0",
         "ark:" + lat_ark, str(lang / "G.fst"), "ark:" + mid])
    base = best_cost(mid)
    run([os.path.join(FSTBIN, "lattice-lmrescore"), "--lm-scale=1.0",
         "ark:" + mid, carpa, "ark:" + out])
    got = best_cost(out) - base

    ln10 = math.log(10.0)
    expected = ln10 * (0.4          # p(cat | <s>)      bigram
                       + 0.2        # p(dog | <s> cat)  trigram
                       + 0.35 + 0.25 + 0.5)  # p(</s> | cat dog) backoff
    assert abs(got - expected) < 1e-3, (got, expected)


def test_lattice_prune_keeps_best_path(tmp_path):
    """lattice-prune: best path is invariant, in-beam structure shrinks,
    and a beam-0 prune leaves exactly the best-path cost reachable."""
    lang, units = make_tlg(tmp_path)
    unit_id = {u: i + 1 for i, u in enumerate(units)}
    seq = [unit_id["k"]] * 2 + [0] + [unit_id["ae"]] * 2 + [0]
    mat = np.full((len(seq) + 3, len(units) + 1), -8.0, np.float32)
    for t, c in enumerate(seq):
        mat[t, c] = 0.0
    amb = len(seq)
    mat[amb, unit_id["t"]] = -0.6
    mat[amb, unit_id["b"]] = -0.9
    mat[amb + 1, unit_id["t"]] = -0.6
    mat[amb + 1, unit_id["b"]] = -0.9
    mat[amb + 2, 0] = 0.0
    post_ark = str(tmp_path / "post.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + post_ark) as writer:
        writer.Write("u", mat)
    lat_ark = str(tmp_path / "lat.ark")
    run([os.path.join(FSTBIN, "latgen-faster"), "--acoustic-scale=1.0",
         "--beam=20", "--lattice-beam=12", "--allow-partial=true",
         str(lang / "TLG.fst"), "ark:" + post_ark, "ark:" + lat_ark])

    def best_and_cost(ark):
        costs_file = str(tmp_path / "c.txt")
        tra = run([os.path.join(FSTBIN, "lattice-best-path"),
                   "--write-costs=" + costs_file, "ark:" + ark, "ark,t:-"])
        return tra.strip(), float(open(costs_file).read().split()[1])

    ref_tra, ref_cost = best_and_cost(lat_ark)
    pruned = str(tmp_path / "pruned.ark")
    run([os.path.join(FSTBIN, "lattice-prune"), "--beam=5",
         "ark:" + lat_ark, "ark:" + pruned])
    got_tra, got_cost = best_and_cost(pruned)
    assert got_tra == ref_tra
    assert abs(got_cost - ref_cost) < 1e-4
    assert os.path.getsize(pruned) <= os.path.getsize(lat_ark)

    tight = str(tmp_path / "tight.ark")
    run([os.path.join(FSTBIN, "lattice-prune"), "--beam=0.0001",
         "ark:" + lat_ark, "ark:" + tight])
    t_tra, t_cost = best_and_cost(tight)
    assert t_tra == ref_tra and abs(t_cost - ref_cost) < 1e-4
    assert os.path.getsize(tight) < os.path.getsize(lat_ark)


def test_latgen_max_mem_bounds_lattice_growth(tmp_path):
    """--max-mem / periodic in-progress pruning: a long high-entropy
    utterance decodes with bounded in-progress lattice states, and the
    best path matches an unpruned decode (PruneActiveTokens semantics,
    EESEN latgen-faster --max-mem behavior)."""
    lang, units = make_tlg(tmp_path)
    rng = np.random.RandomState(0)
    # 600 nearly-flat frames → every in-beam alternative survives
    mat = rng.uniform(-2.2, -1.8,
                      (600, len(units) + 1)).astype(np.float32)
    post_ark = str(tmp_path / "post.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + post_ark) as writer:
        writer.Write("u", mat)

    def decode(tag, *extra):
        lat_ark = str(tmp_path / ("lat_%s.ark" % tag))
        proc = subprocess.run(
            [os.path.join(FSTBIN, "latgen-faster"),
             "--acoustic-scale=1.0", "--beam=17",
             "--lattice-beam=8", "--allow-partial=true", *extra,
             str(lang / "TLG.fst"), "ark:" + post_ark,
             "ark:" + lat_ark], capture_output=True, text=True,
            check=True)
        peak = int(proc.stderr.split("peak in-progress lattice states")[1]
                   .strip(" )\n"))
        costs_file = str(tmp_path / ("costs_%s.txt" % tag))
        tra = run([os.path.join(FSTBIN, "lattice-best-path"),
                   "--write-costs=" + costs_file,
                   "ark:" + lat_ark, "ark,t:-"])
        cost = float(open(costs_file).read().split()[1])
        return peak, tra, cost

    peak_off, tra_off, cost_off = decode("off", "--prune-interval=0",
                                         "--max-mem=0")
    peak_on, tra_on, cost_on = decode("on")  # defaults: 25 frames, 50MB
    assert tra_on == tra_off                  # best path invariant
    assert peak_on <= peak_off

    # a binding memory budget tightens the beam until the lattice
    # fits: bounded peak, best-path cost within a small margin (beam
    # tightening trades lattice richness for memory, like Kaldi's
    # beam-halving under --max-mem)
    peak_tight, _, cost_tight = decode("tight", "--max-mem=500000")
    assert peak_tight < peak_off / 2, (peak_tight, peak_off)
    assert cost_tight <= cost_off * 1.005, (cost_tight, cost_off)

    # even a pathological budget stays correct-by-construction: it
    # decodes, and cost degrades gracefully (within a few percent)
    peak_tiny, _, cost_tiny = decode("tiny", "--max-mem=50000")
    assert peak_tiny < peak_tight
    assert cost_tiny <= cost_off * 1.03, (cost_tiny, cost_off)


def test_arpa2fst_implicit_backoff_for_missing_bow_field(tmp_path):
    """ARPA's backoff column is optional (SRILM/kaldi_lm omit it for
    n-grams never seen as a context; bow = 0 by convention).  Without
    the implicit backoff arc the destination state was a dead end that
    Connect() trimmed — silently deleting the n-gram's word arc and
    rerouting through the shorter history at the wrong score."""
    words = tmp_path / "words.txt"
    words.write_text("<eps> 0\ncat 1\ndog 2\n#0 3\n")
    arpa = tmp_path / "lm.arpa"
    arpa.write_text("""
\\data\\
ngram 1=4
ngram 2=3
ngram 3=1

\\1-grams:
-0.5 </s>
-99 <s> -0.4
-0.5 cat -0.4
-0.5 dog -0.4

\\2-grams:
-0.2 <s> cat -0.3
-0.25 cat dog
-0.3 dog </s>

\\3-grams:
-0.1 <s> cat dog

\\end\\
""")
    g = str(tmp_path / "G.fst")
    fst_tools("arpa2fst", "--disambig-symbol=#0",
              "--read-symbol-table=%s" % words, str(arpa), g)
    text = fst_tools("print", g)
    arcs = {}       # src -> list of (ilabel, dest, weight)
    first_src = None
    for line in text.splitlines():
        tok = line.split()
        if len(tok) >= 4:
            src, dst, il = int(tok[0]), int(tok[1]), int(tok[2])
            w = float(tok[4]) if len(tok) >= 5 else 0.0
            arcs.setdefault(src, []).append((il, dst, w))
            if first_src is None:
                first_src = src

    def follow(state, label):
        hits = [(d, w) for il, d, w in arcs.get(state, []) if il == label]
        assert hits, "no arc labeled %d from state %d" % (label, state)
        return hits[0]

    ln10 = math.log(10.0)
    # start --cat--> {<s>,cat} --dog (trigram)--> {cat,dog}
    s1, _ = follow(first_src, 1)
    s2, w_tri = follow(s1, 2)
    assert abs(w_tri - 0.1 * ln10) < 1e-4
    # {cat,dog} carries the IMPLICIT bow=0 backoff arc (#0 = id 3)
    dests = [(il, w) for il, d, w in arcs.get(s2, [])]
    assert (3, 0.0) in [(il, round(w, 6)) for il, w in dests], dests
    # and the bigram arc cat->dog (the one the old Connect() trimmed)
    s_cat, _ = follow(s1, 3)          # backoff {<s>,cat} -> {cat}
    _, w_bi = follow(s_cat, 2)
    assert abs(w_bi - 0.25 * ln10) < 1e-4


def test_minimize_keeps_weight_distinct_states(tmp_path):
    """States whose arcs differ only in weight are NOT equivalent."""
    f = compile_text(
        "0 1 1 1 0.5\n"
        "0 2 2 2 0.0\n"
        "1 3 1 1 0.25\n"
        "2 3 1 1 0.75\n"
        "3\n", tmp_path, "w.fst")
    out = str(tmp_path / "w_min.fst")
    fst_tools("minimizeencoded", f, out)
    info = fst_tools("info", out)
    n_states = int([l for l in info.splitlines()
                    if "states" in l][0].split()[-1])
    assert n_states == 4, info


def test_compile_rejects_three_token_arc_line(tmp_path):
    """'src dst ilabel' is acceptor syntax; the transducer compiler must
    error out, not read past the token vector."""
    proc = subprocess.run(
        [os.path.join(FSTBIN, "fst-tools"), "compile", "-",
         str(tmp_path / "bad.fst")],
        input="0 1 2\n1\n", capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 1, proc.returncode
    assert "bad FST text line" in proc.stderr


def test_latgen_rejects_truncated_archive(tmp_path):
    """A posterior ark cut mid-matrix must be a clean hard error, not
    garbage rows/cols from uninitialized memory."""
    lang, units = make_tlg(tmp_path)
    mat = np.zeros((20, len(units) + 1), np.float32)
    post_ark = str(tmp_path / "post.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + post_ark) as writer:
        writer.Write("utt1", mat)
    data = open(post_ark, "rb").read()
    open(post_ark, "wb").write(data[:len(data) // 2])
    proc = subprocess.run(
        [os.path.join(FSTBIN, "latgen-faster"), "--acoustic-scale=1.0",
         "--allow-partial=true", str(lang / "TLG.fst"),
         "ark:" + post_ark, "ark:" + str(tmp_path / "lat.ark")],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode != 0
    err = proc.stderr.lower()
    assert "truncated" in err or "short read" in err, proc.stderr


def test_latgen_prune_interval_invariance_and_active_flags(tmp_path):
    """The in-progress prune is frontier-relative (each active token is
    its own reference), so the best path is EXACTLY invariant to
    --prune-interval; --max-active=0 means unlimited (no UB); a
    --min-active floor loosens the beam cutoff instead of letting a
    tight beam starve the search."""
    lang, units = make_tlg(tmp_path)
    rng = np.random.RandomState(3)
    mat = rng.uniform(-2.2, -1.8, (300, len(units) + 1)).astype(np.float32)
    post_ark = str(tmp_path / "post.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + post_ark) as writer:
        writer.Write("u", mat)

    def decode(tag, *extra):
        lat_ark = str(tmp_path / ("lat_%s.ark" % tag))
        proc = subprocess.run(
            [os.path.join(FSTBIN, "latgen-faster"), "--acoustic-scale=1.0",
             "--beam=14", "--lattice-beam=7", "--allow-partial=true",
             *extra, str(lang / "TLG.fst"), "ark:" + post_ark,
             "ark:" + lat_ark],
            capture_output=True, text=True, check=True, cwd=REPO)
        peak = int(proc.stderr.split("peak in-progress lattice states")[1]
                   .strip(" )\n"))
        tra = run([os.path.join(FSTBIN, "lattice-best-path"),
                   "ark:" + lat_ark, "ark,t:-"])
        return peak, tra

    _, tra_off = decode("off", "--prune-interval=0", "--max-mem=0")
    _, tra_every = decode("every", "--prune-interval=1", "--max-mem=0")
    assert tra_every == tra_off

    # --max-active=0 → unlimited, decodes fine (was UB via nth_element)
    _, tra_unl = decode("unl", "--max-active=0", "--prune-interval=0",
                        "--max-mem=0")
    assert tra_unl == tra_off

    # min-active floor loosens a starving beam: more lattice states
    # survive than with the floor disabled
    peak_floor, _ = decode("floor", "--beam=0.6", "--min-active=60",
                           "--prune-interval=0", "--max-mem=0")
    peak_bare, _ = decode("bare", "--beam=0.6", "--min-active=1",
                          "--prune-interval=0", "--max-mem=0")
    assert peak_floor > peak_bare, (peak_floor, peak_bare)


def test_latgen_survives_nonfinite_posteriors(tmp_path):
    """A collapsed model (deliberate lr×10 divergence in the parity
    protocol) emits all-NaN pseudo-likelihoods; latgen-faster must
    sanitize them to zero evidence and still emit scoreable lattices —
    NaN costs broke std::nth_element's strict weak ordering (observed
    segfault, latgen.cc ProcessEmitting)."""
    lang, units = make_tlg(tmp_path)
    num_cols = len(units) + 1
    nan_mat = np.full((40, num_cols), np.nan, np.float32)
    inf_mat = np.full((40, num_cols), -np.inf, np.float32)
    post_ark = str(tmp_path / "post_nan.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + post_ark) as writer:
        writer.Write("utt_nan", nan_mat)
        writer.Write("utt_inf", inf_mat)

    lat_ark = str(tmp_path / "lat_nan.ark")
    proc = subprocess.run(
        [os.path.join(FSTBIN, "latgen-faster"),
         "--acoustic-scale=1.0", "--beam=16.0", "--lattice-beam=8.0",
         "--allow-partial=true",
         "--word-symbol-table=%s" % (lang / "words.txt"),
         str(lang / "TLG.fst"), "ark:" + post_ark, "ark:" + lat_ark],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    assert "sanitized" in proc.stderr
    assert "decoded 2 utterances, 0 failed" in proc.stderr
    # the lattices are valid input for the scoring tools
    tra = run([os.path.join(FSTBIN, "lattice-best-path"),
               "ark:" + lat_ark, "ark,t:-"])
    assert "utt_nan" in tra and "utt_inf" in tra
