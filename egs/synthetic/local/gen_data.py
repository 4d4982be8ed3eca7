#!/usr/bin/env python3
"""Generate the synthetic tone-word corpus for the end-to-end recipe.

Each phone is a pure tone at a distinct frequency (80-140 ms); words are
2-3-phone sequences; utterances sample 2-5 words.  Emits Kaldi-style data
dirs (wav.scp, text, utt2spk, spk2utt) plus the dict dir (lexicon.txt,
units.txt, lexicon_numbers.txt).

Usage: gen_data.py <out-root> [num_train] [num_dev] [num_test] [seed]
"""

import os
import struct
import sys

import numpy as np

PHONES = ["aa", "iy", "uw", "eh", "ow", "k", "s", "m", "t", "r"]
FREQS = [220.0 * (1.22 ** i) for i in range(len(PHONES))]
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
RATE = 16000


def write_wav(path, samples):
    data = np.asarray(np.clip(samples, -32767, 32767), "<i2").tobytes()
    with open(path, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, RATE,
                                       RATE * 2, 2, 16))
        fh.write(b"data" + struct.pack("<I", len(data)) + data)


def synth_utt(words, rng):
    chunks = [np.zeros(int(0.05 * RATE))]
    for word in words:
        for ph in WORDS[word]:
            freq = FREQS[PHONES.index(ph)]
            dur = rng.uniform(0.08, 0.14)
            t = np.arange(int(dur * RATE)) / RATE
            env = np.minimum(1.0, np.minimum(t / 0.01, (dur - t) / 0.01))
            tone = 6000.0 * env * np.sin(2 * np.pi * freq * t)
            chunks.append(tone + 60.0 * rng.randn(len(t)))
        chunks.append(np.zeros(int(rng.uniform(0.03, 0.08) * RATE)))
    return np.concatenate(chunks)


def make_set(root, name, count, rng):
    dset = os.path.join(root, "data", name)
    wav_dir = os.path.join(root, "wav", name)
    os.makedirs(dset, exist_ok=True)
    os.makedirs(wav_dir, exist_ok=True)
    word_list = sorted(WORDS)
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
            write_wav(wav_path, synth_utt(words, rng))
            wscp.write("%s %s\n" % (utt, wav_path))
            text.write("%s %s\n" % (utt, " ".join(words)))
            u2s.write("%s global\n" % utt)
            utts.append(utt)
        s2u.write("global %s\n" % " ".join(utts))


def main():
    root = sys.argv[1]
    num_train = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    num_dev = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    num_test = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    seed = int(sys.argv[5]) if len(sys.argv) > 5 else 7
    rng = np.random.RandomState(seed)

    dict_dir = os.path.join(root, "data", "dict")
    os.makedirs(dict_dir, exist_ok=True)
    with open(os.path.join(dict_dir, "lexicon.txt"), "w") as fh:
        fh.write("<UNK> %s\n" % PHONES[0])
        for word in sorted(WORDS):
            fh.write("%s %s\n" % (word, " ".join(WORDS[word])))
    with open(os.path.join(dict_dir, "units.txt"), "w") as fh:
        for i, ph in enumerate(PHONES):
            fh.write("%s %d\n" % (ph, i + 1))
    with open(os.path.join(dict_dir, "lexicon_numbers.txt"), "w") as fh:
        fh.write("<UNK> %d\n" % (PHONES.index(PHONES[0]) + 1))
        for word in sorted(WORDS):
            ids = " ".join(str(PHONES.index(p) + 1) for p in WORDS[word])
            fh.write("%s %s\n" % (word, ids))

    make_set(root, "train", num_train, rng)
    make_set(root, "dev", num_dev, rng)
    make_set(root, "test", num_test, rng)
    print("generated corpus under %s" % root)


if __name__ == "__main__":
    main()
