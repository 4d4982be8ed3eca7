"""nnet3 example reader, nnet1 model reader, randomizers, n-best utils."""

import io
import struct

import numpy as np
import pytest

from lstm_ctc_tpu import kaldi
from lstm_ctc_tpu.kaldi import binio
from lstm_ctc_tpu.kaldi.nnet_example import read_nnet_example
from lstm_ctc_tpu.kaldi.nnet1 import Nnet1Model
from lstm_ctc_tpu.kaldi.randomizer import (
    MatrixRandomizer,
    NnetDataRandomizerOptions,
    RandomizerMask,
)
from lstm_ctc_tpu.kaldi.streams import InputStream, OutputStream
from lstm_ctc_tpu.ops.nbest import (
    combine_label_nbest,
    fill_blank_path,
    nbest_from_logits,
)


def out_stream():
    buf = io.BytesIO()
    return OutputStream(buf), buf


def wtok(out, tok):
    out.write(tok.encode() + b" ")


def wi32(out, v):
    out.write(b"\x04" + struct.pack("<i", v))


def test_nnet3_example_roundtrip():
    """Hand-assemble a binary <Nnet3Eg> with dense input and sparse output."""
    out, buf = out_stream()
    wtok(out, "<Nnet3Eg>")
    wtok(out, "<NumIo>")
    wi32(out, 2)
    # io 1: dense input features, 3 frames
    wtok(out, "<NnetIo>")
    wtok(out, "input")
    wtok(out, "<I1V>")
    wi32(out, 3)
    out.write(struct.pack("b", 127))  # escape: explicit n,t,x
    wi32(out, 0)
    wi32(out, -1)                     # negative t (the reference's bug case)
    wi32(out, 0)
    out.write(struct.pack("b", 1))    # delta +1
    out.write(struct.pack("b", 1))
    feats = np.arange(6, dtype=np.float32).reshape(3, 2)
    binio.write_matrix(out, True, feats)
    wtok(out, "</NnetIo>")
    # io 2: sparse output labels
    wtok(out, "<NnetIo>")
    wtok(out, "output")
    wtok(out, "<I1V>")
    wi32(out, 1)
    out.write(struct.pack("b", 127))
    wi32(out, 0)
    wi32(out, 0)
    wi32(out, 0)
    wtok(out, "SM")
    wi32(out, 1)          # rows
    wtok(out, "SV")
    wi32(out, 10)         # dim
    wi32(out, 1)          # one element
    wi32(out, 7)          # label index
    out.write(b"\x04" + struct.pack("<f", 1.0))
    wtok(out, "</NnetIo>")
    wtok(out, "</Nnet3Eg>")

    stream = InputStream(io.BytesIO(buf.getvalue()))
    eg = read_nnet_example(stream, binary=True)
    np.testing.assert_array_equal(eg.get_feature("input"), feats)
    assert eg.get_label("output") == [7]
    assert eg.io[0].indexes[0].t == -1
    assert eg.io[0].indexes[2].t == 1


def test_nnet1_model_reader(tmp_path):
    out, buf = out_stream()
    out.write(b"\x00B")
    wtok(out, "<Nnet>")
    wtok(out, "<AffineTransform>")
    wi32(out, 3)   # Kaldi wire order: output_dim first ...
    wi32(out, 2)   # ... then input_dim
    wtok(out, "<LearnRateCoef>")
    out.write(b"\x04" + struct.pack("<f", 1.0))
    lin = np.arange(6, dtype=np.float32).reshape(3, 2)
    binio.write_matrix(out, True, lin)
    binio.write_vector(out, True, np.zeros(3, np.float32))
    wtok(out, "<!EndOfComponent>")
    wtok(out, "<Sigmoid>")
    wi32(out, 3)
    wi32(out, 3)
    wtok(out, "<!EndOfComponent>")
    wtok(out, "</Nnet>")
    path = tmp_path / "final.nnet1"
    path.write_bytes(buf.getvalue())

    model = Nnet1Model(str(path))
    assert model.num_components() == 2
    kind, params = model.dump_component(0)
    assert kind == "AffineTransform"
    np.testing.assert_array_equal(params[0], lin)
    # dims land in the right fields (wire order is out, in)
    assert model.components[0].output_dim == 3
    assert model.components[0].input_dim == 2
    assert model.components[1].kind == "Sigmoid"


def test_matrix_randomizer():
    opts = NnetDataRandomizerOptions(randomizer_size=8, randomizer_seed=1,
                                     minibatch_size=4)
    rand = MatrixRandomizer(opts)
    mask_gen = RandomizerMask(opts)
    data = np.arange(24, dtype=np.float32).reshape(12, 2)
    rand.add_data(data)
    assert rand.is_full()
    rand.randomize(mask_gen.generate(12))
    seen = []
    while not rand.done():
        batch = rand.value()
        assert batch.shape == (4, 2)
        seen.extend(batch[:, 0].tolist())
        rand.next()
    assert sorted(seen) == sorted(data[:len(seen), 0].tolist() +
                                  data[len(seen):, 0].tolist())[:len(seen)] \
        or len(seen) == 12


def test_nbest_utilities():
    # peaked log-probs: best path "0 1", runner-up paths differ
    V, blank = 3, 2
    log_probs = np.full((1, 4, V), -5.0, np.float32)
    for t, c in enumerate([0, blank, 1, blank]):
        log_probs[0, t, c] = 0.0
    nbest = nbest_from_logits(log_probs, np.array([4]), num_paths=3)
    assert nbest[0][0] == [0, 1]
    labels, lengths, distances = combine_label_nbest(nbest, [[0, 1]])
    assert labels.shape[0] == 1
    np.testing.assert_array_equal(labels[0, 0, :2], [0, 1])
    assert distances[0, 0] == 0.0
    assert distances[0, 1] == 0.0  # best hyp == ref
    assert (distances[0, 2:] > 0).all()


def test_fill_blank_path():
    path = fill_blank_path([3, 4], num_frames=6, blank_id=9)
    assert len(path) == 6
    assert [p for p in path if p != 9] == [3, 4]
    # repeated labels need a blank between them
    path = fill_blank_path([5, 5], num_frames=6, blank_id=9)
    idx = [i for i, p in enumerate(path) if p == 5]
    assert idx[1] - idx[0] >= 2
    with pytest.raises(ValueError):
        fill_blank_path([1, 1], num_frames=2, blank_id=9)


def test_is_token():
    assert kaldi.is_token("utt_001")
    assert not kaldi.is_token("")
    assert not kaldi.is_token("a b")
