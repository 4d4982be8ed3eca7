#!/usr/bin/env python3
"""Generate the synthetic tone-word corpus for the end-to-end recipe.

Each phone is a pure tone at a distinct frequency (80-140 ms); words are
2-4-phone sequences; utterances sample 2-5 words.  Emits Kaldi-style data
dirs (wav.scp, text, utt2spk, spk2utt) plus the dict dir (lexicon.txt,
units.txt, lexicon_numbers.txt).

Three difficulty profiles:

  * ``easy`` (default) — widely-spaced tones (22%/step), ~40 dB SNR:
    the model saturates at ~0% WER, proving the pipeline end-to-end.
  * ``hard`` (``--hard``) — a NON-SATURATED accuracy gate: tones 9%
    apart (inside one low-frequency mel bin's width), ~10 dB SNR,
    shorter tones with per-token amplitude and frequency jitter, and a
    larger vocabulary full of minimal pairs.  Calibrated so 3-seed WER
    lands in a 5-20%% band where a real regression (mixed-precision
    drift, a 10x learning rate, a broken kernel) visibly moves the
    number instead of hiding under a ceiling.
  * ``capacity`` (``--capacity``) — a CAPACITY-BOUND task for the MoE
    treatment experiment (reference egs/wsj/RESULT.md:118: the
    mixture-of-softmaxes head's value is breaking the softmax rank
    bottleneck): 36 tones (V = 37 network targets) and an
    auto-generated 72-word vocabulary with NO homophones, clean-ish
    acoustics.  Paired with a small projection (run.sh
    --num-projects 8 → 16-dim head input ≪ 37 targets) the dense
    head's log-posterior rank is the binding constraint, which
    num_experts > 0 lifts — error is head-capacity-bound, not
    LM-bound like the hard profile's homophone floor.

Usage: gen_data.py <out-root> [num_train] [num_dev] [num_test] [seed]
                   [--hard | --capacity]
"""

import os
import struct
import sys

import numpy as np

PHONES = ["aa", "iy", "uw", "eh", "ow", "k", "s", "m", "t", "r"]
WORDS = {
    "kam": ["k", "aa", "m"],
    "sit": ["s", "iy", "t"],
    "rue": ["r", "uw"],
    "tesso": ["t", "eh", "s", "ow"],
    "mira": ["m", "iy", "r", "aa"],
    "oak": ["ow", "k"],
    "sura": ["s", "uw", "r", "aa"],
    "kit": ["k", "iy", "t"],
}
# hard mode adds minimal pairs / near-anagrams of the base words — the
# decoder has to separate words that differ by one confusable phone
HARD_EXTRA_WORDS = {
    "sam": ["s", "aa", "m"],      # vs kam (k/s onset)
    "kat": ["k", "aa", "t"],      # vs kam (m/t coda), kit (aa/iy)
    "mit": ["m", "iy", "t"],      # vs sit/kit (onset)
    "rit": ["r", "iy", "t"],      # vs sit/kit/mit
    "sot": ["s", "ow", "t"],      # vs sit (iy/ow)
    "tesko": ["t", "eh", "s", "k"],   # vs tesso (ow/k coda)
    "mura": ["m", "uw", "r", "aa"],   # vs sura (onset), mira (iy/uw)
    "ook": ["uw", "k"],           # vs oak (ow/uw)
    # TRUE homophones under the hard profile's k/t frequency alias —
    # identical audio, resolvable only by the LM prior: a stable,
    # budget-immune WER floor (see Profile docstring)
    "tam": ["t", "aa", "m"],      # ≡ kam acoustically
    "oat": ["ow", "t"],           # ≡ oak acoustically
}
RATE = 16000


def _capacity_words(phones, n_words=72, lex_seed=20260819):
    """Deterministic 2-3-phone vocabulary over the capacity profile's
    phone set, with NO duplicate pronunciations (no homophones — the
    capacity experiment wants head-capacity-bound error, not an
    LM-bound floor).  The lexicon seed is FIXED so every training seed
    sees the same task."""
    rng = np.random.RandomState(lex_seed)
    words = {}
    seen = set()
    while len(words) < n_words:
        length = 2 + int(rng.randint(2))
        pron = tuple(phones[rng.randint(len(phones))]
                     for _ in range(length))
        if pron in seen:
            continue
        seen.add(pron)
        words["w%02d" % len(words)] = list(pron)
    return words


class Profile:
    """Synthesis parameters per difficulty profile.

    The hard defaults are CALIBRATED, not maximal — two measured
    findings shaped them:

    1. Frame-level phone separability (nearest-centroid on CMVN'd fbank
       center frames) is controlled by SPACING, not SNR (narrowband
       tones concentrate mel energy): step 1.22 → 1.00, 1.18 → 0.96,
       1.14 → 0.83 regardless of noise in [60, 2000].  The 0.83 regime
       is unlearnable at recipe budgets (CTC pinned at ~ln V), while
       anything ≥ 0.90 SATURATES once the budget is generous (measured
       WER sweep at 160 utts / 60 iters: step 1.18 → ~0%, 1.16 → 4.7%,
       1.15 → 0.0%, 1.13 → ~2% — per-run variance straddles zero, so
       spacing alone cannot hold a non-zero band).
    2. The stable non-zero floor therefore comes from TRUE AMBIGUITY,
       not marginal acoustics: the k/t frequency alias makes kam/tam
       and oak/oat exact homophones that only the LM prior can resolve
       — an irreducible error floor no training budget erases — while
       the 1.15 spacing keeps the rest merely hard (regression-
       sensitive).  Measured at the protocol budget (160 train utts,
       60 iters, keep-lr 30): 14.8% WER, mixed sub/ins/del.

    Knobs stay overridable for re-calibration (--noise-sigma /
    --freq-step / --dur-lo/--dur-hi)."""

    def __init__(self, hard, noise_sigma=None, freq_step=None,
                 dur_lo=None, dur_hi=None, capacity=False):
        self.hard = hard
        self.capacity = capacity
        self.phones = list(PHONES)
        if capacity:
            assert not hard, "--hard and --capacity are exclusive"
            # 36 tones on a 9%% ladder (220 Hz → ~4.5 kHz: inside the
            # fbank's mel range at 16 kHz); moderate noise + slight
            # jitter keeps frames informative — the intended bottleneck
            # is the HEAD, not the acoustics
            step = freq_step if freq_step is not None else 1.09
            self.phones = ["p%02d" % i for i in range(36)]
            self.freqs = [220.0 * (step ** i)
                          for i in range(len(self.phones))]
            self.noise_sigma = (noise_sigma if noise_sigma is not None
                                else 300.0)
            self.dur_lo = dur_lo if dur_lo is not None else 0.07
            self.dur_hi = dur_hi if dur_hi is not None else 0.12
            self.amp_lo, self.amp_hi = 4000.0, 6000.0
            self.freq_jitter = 0.01
            self.words = _capacity_words(self.phones)
            return
        if hard:
            # 15% steps: marginal-but-learnable separability (the
            # regression-sensitive part of the gate)
            step = freq_step if freq_step is not None else 1.15
            self.freqs = [220.0 * (step ** i) for i in range(len(PHONES))]
            # k/t frequency ALIAS: "t" borrows "k"'s tone, making the
            # twin words (kam/tam, oak/oat) true homophones — an
            # irreducible, seed-stable WER floor no training budget can
            # erase, so the gate can never saturate back to 0%
            self.freqs[PHONES.index("t")] = self.freqs[PHONES.index("k")]
            self.noise_sigma = (noise_sigma if noise_sigma is not None
                                else 1200.0)
            self.dur_lo = dur_lo if dur_lo is not None else 0.06
            self.dur_hi = dur_hi if dur_hi is not None else 0.11
            self.amp_lo, self.amp_hi = 3000.0, 6000.0
            self.freq_jitter = 0.03
            self.words = dict(WORDS, **HARD_EXTRA_WORDS)
        else:
            step = freq_step if freq_step is not None else 1.22
            self.freqs = [220.0 * (step ** i) for i in range(len(PHONES))]
            self.noise_sigma = (noise_sigma if noise_sigma is not None
                                else 60.0)
            self.dur_lo = dur_lo if dur_lo is not None else 0.08
            self.dur_hi = dur_hi if dur_hi is not None else 0.14
            self.amp_lo = self.amp_hi = 6000.0
            self.freq_jitter = 0.0
            self.words = dict(WORDS)


def write_wav(path, samples):
    data = np.asarray(np.clip(samples, -32767, 32767), "<i2").tobytes()
    with open(path, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, RATE,
                                       RATE * 2, 2, 16))
        fh.write(b"data" + struct.pack("<I", len(data)) + data)


def synth_utt(words, rng, prof):
    chunks = [np.zeros(int(0.05 * RATE))]
    for word in words:
        for ph in prof.words[word]:
            freq = prof.freqs[prof.phones.index(ph)]
            if prof.freq_jitter:
                freq *= 1.0 + rng.uniform(-prof.freq_jitter,
                                          prof.freq_jitter)
            dur = rng.uniform(prof.dur_lo, prof.dur_hi)
            amp = rng.uniform(prof.amp_lo, prof.amp_hi)
            t = np.arange(int(dur * RATE)) / RATE
            env = np.minimum(1.0, np.minimum(t / 0.01, (dur - t) / 0.01))
            tone = amp * env * np.sin(2 * np.pi * freq * t)
            chunks.append(tone
                          + prof.noise_sigma * rng.randn(len(t)))
        chunks.append(prof.noise_sigma
                      * rng.randn(int(rng.uniform(0.03, 0.08) * RATE))
                      if prof.hard else
                      np.zeros(int(rng.uniform(0.03, 0.08) * RATE)))
    return np.concatenate(chunks)


def make_set(root, name, count, rng, prof):
    dset = os.path.join(root, "data", name)
    wav_dir = os.path.join(root, "wav", name)
    os.makedirs(dset, exist_ok=True)
    os.makedirs(wav_dir, exist_ok=True)
    word_list = sorted(prof.words)
    with open(os.path.join(dset, "wav.scp"), "w") as wscp, \
            open(os.path.join(dset, "text"), "w") as text, \
            open(os.path.join(dset, "utt2spk"), "w") as u2s, \
            open(os.path.join(dset, "spk2utt"), "w") as s2u:
        utts = []
        for i in range(count):
            utt = "%s_%04d" % (name, i)
            words = [word_list[rng.randint(len(word_list))]
                     for _ in range(rng.randint(2, 6))]
            wav_path = os.path.join(wav_dir, utt + ".wav")
            write_wav(wav_path, synth_utt(words, rng, prof))
            wscp.write("%s %s\n" % (utt, wav_path))
            text.write("%s %s\n" % (utt, " ".join(words)))
            u2s.write("%s global\n" % utt)
            utts.append(utt)
        s2u.write("global %s\n" % " ".join(utts))


def main():
    argv = sys.argv[1:]
    opts = {}
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--hard":
            opts["hard"] = True
        elif a == "--capacity":
            opts["capacity"] = True
        elif a in ("--noise-sigma", "--freq-step", "--dur-lo",
                   "--dur-hi"):
            opts[a[2:].replace("-", "_")] = float(argv[i + 1])
            i += 1
        else:
            args.append(a)
        i += 1
    prof = Profile(hard=opts.pop("hard", False),
                   capacity=opts.pop("capacity", False), **opts)
    root = args[0]
    num_train = int(args[1]) if len(args) > 1 else 80
    num_dev = int(args[2]) if len(args) > 2 else 12
    num_test = int(args[3]) if len(args) > 3 else 12
    seed = int(args[4]) if len(args) > 4 else 7
    rng = np.random.RandomState(seed)

    dict_dir = os.path.join(root, "data", "dict")
    os.makedirs(dict_dir, exist_ok=True)
    phones = prof.phones
    with open(os.path.join(dict_dir, "lexicon.txt"), "w") as fh:
        fh.write("<UNK> %s\n" % phones[0])
        for word in sorted(prof.words):
            fh.write("%s %s\n" % (word, " ".join(prof.words[word])))
    with open(os.path.join(dict_dir, "units.txt"), "w") as fh:
        for i, ph in enumerate(phones):
            fh.write("%s %d\n" % (ph, i + 1))
    with open(os.path.join(dict_dir, "lexicon_numbers.txt"), "w") as fh:
        fh.write("<UNK> %d\n" % (phones.index(phones[0]) + 1))
        for word in sorted(prof.words):
            ids = " ".join(str(phones.index(p) + 1)
                           for p in prof.words[word])
            fh.write("%s %s\n" % (word, ids))

    make_set(root, "train", num_train, rng, prof)
    make_set(root, "dev", num_dev, rng, prof)
    make_set(root, "test", num_test, rng, prof)
    print("generated %s corpus under %s"
          % ("capacity" if prof.capacity
             else ("hard" if prof.hard else "easy"), root))


if __name__ == "__main__":
    main()
