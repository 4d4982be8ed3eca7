"""Kaldi I/O codec tests: golden bytes, round-trips, tables, pipes."""

import io
import os
import struct

import numpy as np
import pytest

from lstm_ctc_tpu import kaldi
from lstm_ctc_tpu.kaldi import binio, specifiers
from lstm_ctc_tpu.kaldi.streams import InputStream, OutputStream


def bytes_stream(data: bytes) -> InputStream:
    return InputStream(io.BytesIO(data))


def make_output():
    buf = io.BytesIO()
    return OutputStream(buf), buf


# ---------------------------------------------------------------------------
# Golden byte-level checks against hand-assembled Kaldi wire format
# ---------------------------------------------------------------------------

def golden_float_matrix_bytes(mat: np.ndarray) -> bytes:
    out = b"\x00BFM "
    out += b"\x04" + struct.pack("<i", mat.shape[0])
    out += b"\x04" + struct.pack("<i", mat.shape[1])
    out += mat.astype("<f4").tobytes()
    return out


def test_float_matrix_golden_bytes():
    mat = np.arange(12, dtype=np.float32).reshape(3, 4)
    golden = golden_float_matrix_bytes(mat)

    # our writer produces exactly the golden bytes
    out, buf = make_output()
    binio.init_output_stream(out, True)
    binio.write_matrix(out, True, mat)
    assert buf.getvalue() == golden

    # our reader decodes the golden bytes
    stream = bytes_stream(golden)
    assert binio.init_input_stream(stream) is True
    got = binio.read_matrix(stream, True)
    np.testing.assert_array_equal(got, mat)


def test_float_vector_golden_bytes():
    vec = np.array([1.5, -2.25, 3.0], dtype=np.float32)
    golden = b"\x00BFV " + b"\x04" + struct.pack("<i", 3) + vec.tobytes()
    out, buf = make_output()
    binio.init_output_stream(out, True)
    binio.write_vector(out, True, vec)
    assert buf.getvalue() == golden
    stream = bytes_stream(golden)
    assert binio.init_input_stream(stream)
    np.testing.assert_array_equal(binio.read_vector(stream, True), vec)


def test_int32_vector_golden_bytes():
    vec = np.array([7, -1, 100000], dtype=np.int32)
    golden = b"\x00B" + b"\x04" + struct.pack("<i", 3)
    for v in vec:
        golden += b"\x04" + struct.pack("<i", int(v))
    out, buf = make_output()
    binio.init_output_stream(out, True)
    binio.write_int32_vector(out, True, vec)
    assert buf.getvalue() == golden
    stream = bytes_stream(golden)
    assert binio.init_input_stream(stream)
    np.testing.assert_array_equal(binio.read_int32_vector(stream, True), vec)


def test_text_matrix_roundtrip():
    mat = np.array([[1.0, -2.5], [3.25, 4.0]], dtype=np.float32)
    out, buf = make_output()
    binio.write_matrix(out, False, mat)
    stream = bytes_stream(buf.getvalue())
    got = binio.read_matrix(stream, False)
    np.testing.assert_allclose(got, mat, atol=1e-6)


def test_text_int32_vector_roundtrip():
    vec = np.array([3, 1, 4, 1, 5], dtype=np.int32)
    out, buf = make_output()
    binio.write_int32_vector(out, False, vec)
    stream = bytes_stream(buf.getvalue())
    got = binio.read_int32_vector(stream, False)
    np.testing.assert_array_equal(got, vec)


def test_compressed_matrix_roundtrip_cm1():
    rng = np.random.RandomState(0)
    mat = rng.randn(50, 13).astype(np.float32) * 3.0
    out, buf = make_output()
    binio.write_matrix(out, True, mat, compress=True)
    stream = bytes_stream(buf.getvalue())
    got = binio.read_matrix(stream, True)
    assert got.shape == mat.shape
    # 8-bit piecewise-linear quantization: tolerance scales with range
    assert np.abs(got - mat).max() < (mat.max() - mat.min()) / 64.0


def test_compressed_matrix_roundtrip_cm2():
    rng = np.random.RandomState(1)
    mat = rng.randn(5, 7).astype(np.float32)  # rows <= 8 → CM2
    out, buf = make_output()
    binio.write_matrix(out, True, mat, compress=True)
    stream = bytes_stream(buf.getvalue())
    got = binio.read_matrix(stream, True)
    assert np.abs(got - mat).max() < (mat.max() - mat.min()) / 1000.0


def test_posterior_roundtrip():
    post = [[(1, 0.5), (2, 0.25)], [], [(0, 1.0)]]
    for binary in (True, False):
        out, buf = make_output()
        binio.write_posterior(out, binary, post)
        got = binio.read_posterior(bytes_stream(buf.getvalue()), binary)
        assert len(got) == 3
        assert got[0][0][0] == 1 and abs(got[0][0][1] - 0.5) < 1e-6
        assert got[1] == []


# ---------------------------------------------------------------------------
# Specifier classification
# ---------------------------------------------------------------------------

def test_classify_rxfilename():
    K = specifiers.InputKind
    assert specifiers.classify_rxfilename("-") == K.STDIN
    assert specifiers.classify_rxfilename("") == K.STDIN
    assert specifiers.classify_rxfilename("foo.ark") == K.FILE
    assert specifiers.classify_rxfilename("gunzip -c x.gz |") == K.PIPE
    assert specifiers.classify_rxfilename("/a/b.ark:12345") == K.OFFSET
    assert specifiers.classify_rxfilename("file123") == K.FILE


def test_parse_rspecifier():
    spec = specifiers.parse_rspecifier("ark,s,cs:foo.ark")
    assert spec.kind == "ark" and spec.sorted and spec.called_sorted
    spec = specifiers.parse_rspecifier("scp,p:foo.scp")
    assert spec.kind == "scp" and spec.permissive
    spec = specifiers.parse_rspecifier("ark:cat x.ark |")
    assert spec.rxfilename == "cat x.ark |"
    with pytest.raises(ValueError):
        specifiers.parse_rspecifier("nope")


def test_parse_wspecifier():
    spec = specifiers.parse_wspecifier("ark,scp:a.ark,a.scp")
    assert spec.kind == "both"
    assert spec.archive_wxfilename == "a.ark"
    assert spec.script_wxfilename == "a.scp"
    spec = specifiers.parse_wspecifier("ark,t:-")
    assert spec.kind == "ark" and not spec.binary


# ---------------------------------------------------------------------------
# Tables end-to-end
# ---------------------------------------------------------------------------

def test_table_ark_scp_roundtrip(tmp_path):
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    rng = np.random.RandomState(7)
    mats = {"utt%03d" % i: rng.randn(5 + i, 4).astype(np.float32)
            for i in range(5)}
    with kaldi.BaseFloatMatrixWriter("ark,scp:%s,%s" % (ark, scp)) as writer:
        for key in sorted(mats):
            writer.Write(key, mats[key])

    # sequential over the archive
    got = dict(kaldi.SequentialBaseFloatMatrixReader("ark:" + ark))
    assert sorted(got) == sorted(mats)
    for key in mats:
        np.testing.assert_array_equal(got[key], mats[key])

    # sequential over the scp (exercises offset rxfilenames)
    got = dict(kaldi.SequentialBaseFloatMatrixReader("scp:" + scp))
    for key in mats:
        np.testing.assert_array_equal(got[key], mats[key])

    # random access over the scp with sorted assertion
    with kaldi.RandomAccessBaseFloatMatrixReader("scp,s:" + scp) as reader:
        assert reader.HasKey("utt003")
        np.testing.assert_array_equal(reader.Value("utt003"), mats["utt003"])
        assert not reader.HasKey("nope")

    # random access over the archive
    with kaldi.RandomAccessBaseFloatMatrixReader("ark:" + ark) as reader:
        np.testing.assert_array_equal(reader.Value("utt004"), mats["utt004"])
        np.testing.assert_array_equal(reader.Value("utt000"), mats["utt000"])


def test_table_int32_vectors_text_mode(tmp_path):
    ark = str(tmp_path / "labels.ark")
    labels = {"a": np.array([1, 2, 3], np.int32),
              "b": np.array([9], np.int32)}
    with kaldi.Int32VectorWriter("ark,t:" + ark) as writer:
        for key in sorted(labels):
            writer.Write(key, labels[key])
    text = open(ark).read()
    assert text.splitlines()[0].startswith("a 1 2 3")
    with kaldi.RandomAccessInt32VectorReader("ark:" + ark) as reader:
        assert reader.HasKey("b")
        np.testing.assert_array_equal(reader.Value("a"), labels["a"])


def test_table_pipe_input(tmp_path):
    ark = str(tmp_path / "feats.ark")
    mat = np.ones((3, 2), dtype=np.float32)
    with kaldi.BaseFloatMatrixWriter("ark:" + ark) as writer:
        writer.Write("u1", mat)
    reader = kaldi.SequentialBaseFloatMatrixReader("ark:cat %s |" % ark)
    key, value = next(iter(reader))
    assert key == "u1"
    np.testing.assert_array_equal(value, mat)


def test_table_background_prefetch(tmp_path):
    ark = str(tmp_path / "feats.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + ark) as writer:
        for i in range(10):
            writer.Write("u%d" % i, np.full((2, 2), i, np.float32))
    got = dict(kaldi.SequentialBaseFloatMatrixReader("ark,bg:" + ark))
    assert len(got) == 10
    assert got["u7"][0, 0] == 7.0


def test_sorted_archive_early_miss(tmp_path):
    ark = str(tmp_path / "feats.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + ark) as writer:
        for key in ["a", "c", "e"]:
            writer.Write(key, np.zeros((1, 1), np.float32))
    with kaldi.RandomAccessBaseFloatMatrixReader("ark,s:" + ark) as reader:
        assert reader.HasKey("c")
        assert not reader.HasKey("b")  # declared missing without full scan


def test_kaldi_style_done_key_next_surface(tmp_path):
    ark = str(tmp_path / "feats.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + ark) as writer:
        writer.Write("x", np.zeros((2, 2), np.float32))
        writer.Write("y", np.ones((2, 2), np.float32))
    reader = kaldi.SequentialBaseFloatMatrixReader("ark:" + ark)
    keys = []
    while not reader.Done():
        keys.append(reader.Key())
        assert reader.Value().shape == (2, 2)
        reader.Next()
    assert keys == ["x", "y"]
    reader.Close()


def test_compressed_matrix_cm3_decode():
    """CM3: one uint8 per element on a global scale (the reference's
    pyKaldiIO only handles CM/CM2)."""
    rng = np.random.RandomState(3)
    mat = rng.randn(6, 5).astype(np.float32)
    min_value = float(mat.min())
    value_range = float(mat.max() - mat.min())
    codes = np.clip(np.round((mat - min_value) / value_range * 255.0),
                    0, 255).astype(np.uint8)
    payload = b"\x00BCM3 " + struct.pack("<ffii", min_value, value_range,
                                         6, 5) + codes.tobytes()
    stream = bytes_stream(payload)
    assert binio.init_input_stream(stream)
    got = binio.read_matrix(stream, True)
    assert np.abs(got - mat).max() < value_range / 128.0


def test_reader_close_reaps_pipe_and_surfaces_failure(tmp_path):
    """Close() must release the underlying stream NOW — and a pipe whose
    command failed must surface its exit status at Close, not be
    swallowed at GC time."""
    ark = str(tmp_path / "m.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + ark) as writer:
        for i in range(3):
            writer.Write("u%d" % i, np.ones((2, 2), np.float32) * i)
    # healthy pipe, abandoned early: Close() succeeds and releases it
    r = kaldi.SequentialBaseFloatMatrixReader("ark:cat %s |" % ark)
    assert not r.Done()
    assert r.Close()
    # failing pipe: the nonzero exit status surfaces at Close
    r = kaldi.SequentialBaseFloatMatrixReader(
        "ark:cat %s; exit 3 |" % ark)
    keys = []
    with pytest.raises(kaldi.KaldiIOError):
        while not r.Done():
            keys.append(r.Key())
            r.Next()
        r.Close()
    assert keys == ["u0", "u1", "u2"]


def test_scp_only_writer_refuses_without_truncating(tmp_path):
    scp = tmp_path / "existing.scp"
    scp.write_text("key /some/path.ark:17\n")
    with pytest.raises(NotImplementedError):
        kaldi.BaseFloatMatrixWriter("scp:%s" % scp)
    assert scp.read_text() == "key /some/path.ark:17\n"


def test_text_matrix_tolerates_crlf_and_trailing_spaces():
    text = b" [\r\n  1 2 \r\n  3 4  \r\n  5 6 ]\n"
    stream = InputStream(io.BytesIO(text))
    mat = binio.read_matrix(stream, binary=False)
    np.testing.assert_array_equal(
        mat, np.asarray([[1, 2], [3, 4], [5, 6]], np.float32))


def test_truncated_compressed_matrix_is_kaldi_io_error(tmp_path):
    """CM decode failures must keep the KaldiIOError contract so
    permissive ('p') readers can skip them like FM truncations."""
    buf = io.BytesIO()
    out = OutputStream(buf)
    binio.write_matrix(out, True, np.random.RandomState(0)
                       .randn(6, 5).astype(np.float32), compress=True)
    out.flush()
    data = buf.getvalue()
    stream = InputStream(io.BytesIO(data[: len(data) // 2]))
    with pytest.raises(kaldi.KaldiIOError):
        binio.read_matrix(stream, binary=True)


def test_read_matrix_and_vector_are_writable(tmp_path):
    ark = str(tmp_path / "w.ark")
    with kaldi.BaseFloatMatrixWriter("ark:" + ark) as writer:
        writer.Write("u", np.ones((3, 4), np.float32))
    reader = kaldi.SequentialBaseFloatMatrixReader("ark:" + ark)
    mat = reader.Value()
    mat -= 0.5          # in-place normalization, the reference idiom
    assert float(mat[0, 0]) == 0.5
    reader.Close()


def test_output_pipe_broken_early_raises_and_reaps(tmp_path):
    out = kaldi.Output("| head -c 4 > %s" % (tmp_path / "sink"), True)
    stream = out.Stream()
    with pytest.raises(kaldi.KaldiIOError):
        for _ in range(200000):
            stream.write(b"xxxxxxxxxxxxxxxx")
        out.Close()


def test_random_access_permissive_haskey_value_cache(tmp_path):
    ark = str(tmp_path / "ra.ark")
    scp = str(tmp_path / "ra.scp")
    mats = {"a": np.full((2, 2), 1.0, np.float32),
            "b": np.full((2, 2), 2.0, np.float32)}
    with kaldi.BaseFloatMatrixWriter("ark,scp:%s,%s" % (ark, scp)) as w:
        for k, m in sorted(mats.items()):
            w.Write(k, m)
    r = kaldi.RandomAccessBaseFloatMatrixReader("scp,p:" + scp)
    # interleaved HasKey/Value stays correct (the probe cache is keyed)
    assert r.HasKey("a")
    np.testing.assert_array_equal(r.Value("b"), mats["b"])
    np.testing.assert_array_equal(r.Value("a"), mats["a"])
    assert not r.HasKey("missing")
    np.testing.assert_array_equal(r.Value("a"), mats["a"])
