"""Record shards, splice/subsample semantics, bucketed batching."""

import numpy as np
import pytest

from lstm_ctc_tpu.data import (
    BucketedBatcher,
    RecordLoader,
    RecordShardWriter,
    iterate_batches,
    iterate_utterances,
    read_record,
    scan_label_lengths,
    scan_scp,
)
from lstm_ctc_tpu.data.pipeline import splice_frames, subsample_frames


def make_dataset(tmp_path, num_utts=10, dim=4, seed=0, labeled=True):
    rng = np.random.RandomState(seed)
    shard = str(tmp_path / "data.rec")
    scp = str(tmp_path / "data.scp")
    utts = {}
    with RecordShardWriter(shard) as writer, open(scp, "w") as scp_fh:
        for i in range(num_utts):
            t_len = int(rng.randint(20, 200))
            feats = rng.randn(t_len, dim).astype(np.float32)
            labels = None
            if labeled:
                u_len = int(rng.randint(1, max(2, t_len // 6)))
                labels = rng.randint(0, 40, size=u_len).astype(np.int32)
            key = "utt%03d" % i
            meta = writer.write(key, feats, labels)
            scp_fh.write(meta.scp_line())
            utts[key] = (feats, labels)
    return scp, utts


def test_record_roundtrip(tmp_path):
    scp, utts = make_dataset(tmp_path, num_utts=3)
    metas = scan_scp(scp)
    assert len(metas) == 3
    loader = RecordLoader()
    for meta in metas:
        key, feats, labels = loader.load(meta)
        ref_feats, ref_labels = utts[key]
        np.testing.assert_array_equal(feats, ref_feats)
        np.testing.assert_array_equal(labels, ref_labels)
    loader.close()


def test_splice_matches_reference_semantics():
    # reference nnet/tfrecord.py:28-40: pad edges with first/last frame,
    # concatenate shifted copies along the feature axis
    feats = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = splice_frames(feats, 1, 1)
    assert out.shape == (4, 9)
    # first frame: left context = first frame itself
    np.testing.assert_array_equal(out[0, 0:3], feats[0])
    np.testing.assert_array_equal(out[0, 3:6], feats[0])
    np.testing.assert_array_equal(out[0, 6:9], feats[1])
    # middle frame
    np.testing.assert_array_equal(out[2, 0:3], feats[1])
    np.testing.assert_array_equal(out[2, 3:6], feats[2])
    np.testing.assert_array_equal(out[2, 6:9], feats[3])
    # last frame: right context = last frame itself
    np.testing.assert_array_equal(out[3, 6:9], feats[3])


def test_subsample_floor_semantics():
    # reference nnet/tfrecord.py:43-51: output length = floor(T/factor)
    feats = np.arange(14, dtype=np.float32).reshape(7, 2)
    out = subsample_frames(feats, 3)
    assert out.shape[0] == 2  # floor(7/3), NOT ceil
    np.testing.assert_array_equal(out[0], feats[0])
    np.testing.assert_array_equal(out[1], feats[3])


def test_bucketed_batches_fixed_shapes(tmp_path):
    scp, utts = make_dataset(tmp_path, num_utts=23)
    metas = scan_scp(scp)
    label_lengths = scan_label_lengths(metas)
    batcher = BucketedBatcher(metas, batch_size=4, left_context=1,
                              right_context=1, subsample=3,
                              label_lengths=label_lengths)
    seen_keys = set()
    shapes = set()
    total_labels = 0
    for batch in iterate_batches(batcher, shuffle=True, seed=42):
        assert batch.nnet_input.shape[0] == 4
        assert batch.nnet_input.shape[2] == 4 * 3  # dim * (1+l+r)
        shapes.add((batch.nnet_input.shape[1], batch.nnet_target.shape[1]))
        # shapes must come from the static bucket set
        assert (batch.nnet_input.shape[1],
                batch.nnet_target.shape[1]) in set(batcher.shapes())
        for row, key in enumerate(batch.keys):
            seen_keys.add(key)
            feats, labels = utts[key]
            t_len = (feats.shape[0] // 3)
            assert batch.sequence_length[row] == t_len
            assert batch.target_length[row] == len(labels)
            np.testing.assert_array_equal(
                batch.nnet_target[row, :len(labels)], labels)
            # padding beyond t_len is zero
            assert np.all(batch.nnet_input[row, t_len:] == 0.0)
        # dummy rows (beyond keys) have zero length and -1 targets
        for row in range(len(batch.keys), 4):
            assert batch.sequence_length[row] == 0
            assert np.all(batch.nnet_target[row] == -1)
        total_labels += batch.size
    assert seen_keys == set(utts)
    assert total_labels == sum(len(l) for _, l in utts.values())


def test_epoch_shuffling_is_seeded(tmp_path):
    scp, _ = make_dataset(tmp_path, num_utts=16)
    metas = scan_scp(scp)
    batcher = BucketedBatcher(metas, batch_size=4)
    plan1 = batcher.batch_plan(shuffle=True, seed=1)
    plan2 = batcher.batch_plan(shuffle=True, seed=1)
    plan3 = batcher.batch_plan(shuffle=True, seed=2)
    assert plan1 == plan2
    assert plan1 != plan3


def test_iterate_utterances(tmp_path):
    scp, utts = make_dataset(tmp_path, num_utts=4, labeled=False)
    metas = scan_scp(scp)
    keys = [k for k, mat, labels in iterate_utterances(metas, 1, 1, 2)]
    assert keys == sorted(utts)
    for key, mat, labels in iterate_utterances(metas, 1, 1, 2):
        ref, _ = utts[key]
        assert mat.shape == (ref.shape[0] // 2, ref.shape[1] * 3)
        assert labels is None


def test_scp_consistency_checks(tmp_path):
    scp, _ = make_dataset(tmp_path, num_utts=2, dim=4)
    lines = open(scp).read().splitlines()
    bad = lines[0].split()
    bad[2] = "999"  # inconsistent dim
    (tmp_path / "bad.scp").write_text("\n".join([" ".join(bad)] + lines[1:]))
    with pytest.raises(SystemExit):
        scan_scp(str(tmp_path / "bad.scp"))


def test_native_loader_matches_python(tmp_path, monkeypatch):
    """The C++ batch assembler must produce byte-identical batches to the
    numpy path (splice + subsample + padding + labels)."""
    from lstm_ctc_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native record loader not built")
    scp, _ = make_dataset(tmp_path, num_utts=12, dim=5, seed=4)
    metas = scan_scp(scp)
    label_lengths = scan_label_lengths(metas)
    batcher = BucketedBatcher(metas, batch_size=4, left_context=2,
                              right_context=1, subsample=3,
                              label_lengths=label_lengths)

    def collect():
        return [(b.nnet_input.copy(), b.sequence_length.copy(),
                 b.nnet_target.copy(), b.target_length.copy(), list(b.keys))
                for b in iterate_batches(batcher, shuffle=True, seed=9)]

    native = collect()
    monkeypatch.setenv("LSTM_CTC_TPU_NATIVE_LOADER", "0")
    monkeypatch.setattr(native_loader, "_CHECKED", False)
    monkeypatch.setattr(native_loader, "_LIB", None)
    python = collect()
    assert len(native) == len(python)
    for (nf, ns, nt, nl, nk), (pf, ps, pt, pl, pk) in zip(native, python):
        np.testing.assert_array_equal(nf, pf)
        np.testing.assert_array_equal(ns, ps)
        np.testing.assert_array_equal(nt, pt)
        np.testing.assert_array_equal(nl, pl)
        assert nk == pk


def test_long_labels_without_label_lengths_clamp_not_crash(tmp_path):
    """build_batcher(need_labels=False) leaves label_lengths unset, so
    buckets get the minimum label pad; a labeled utterance longer than
    the pad must CLAMP (the native loader's behavior) instead of
    crashing the numpy path with a broadcast error."""
    rng = np.random.RandomState(7)
    shard = str(tmp_path / "d.rec")
    scp = str(tmp_path / "d.scp")
    with RecordShardWriter(shard) as writer, open(scp, "w") as scp_fh:
        feats = rng.randn(120, 4).astype(np.float32)
        labels = rng.randint(0, 5, 30).astype(np.int32)  # > 16-label pad
        scp_fh.write(writer.write("u0", feats, labels).scp_line())
    metas = scan_scp(scp)
    batcher = BucketedBatcher(metas, batch_size=1)   # label_lengths=None
    assert batcher.buckets[0].label_steps == 16
    batch = batcher.assemble(0, [0], RecordLoader())
    assert int(batch.target_length[0]) == 16          # clamped
    assert (batch.nnet_target[0, :16] >= 0).all()
    # packed mode clamps identically
    packed = BucketedBatcher(metas, batch_size=1, pack_factor=2)
    b = packed.assemble(-1, [[0]], RecordLoader())
    assert int(b.target_length[0]) == packed.row_label


def test_validation_evaluate_rejects_packed_batches(tmp_path):
    """cv_eval over packed batches would mispair row-hypotheses with
    per-utterance references; the loop must refuse loudly."""
    from lstm_ctc_tpu.train.loop import run_validation_epoch

    class FakeBatch:
        pass

    shard = str(tmp_path / "p.rec")
    scp = str(tmp_path / "p.scp")
    rng = np.random.RandomState(0)
    with RecordShardWriter(shard) as writer, open(scp, "w") as scp_fh:
        for i in range(4):
            feats = rng.randn(30, 4).astype(np.float32)
            labels = rng.randint(0, 5, 3).astype(np.int32)
            scp_fh.write(writer.write("u%d" % i, feats, labels)
                         .scp_line())
    metas = scan_scp(scp)
    batcher = BucketedBatcher(metas, batch_size=2, pack_factor=2,
                              label_lengths=scan_label_lengths(metas))
    batch = next(iter(iterate_batches(batcher)))
    n_slots = batch.nnet_target.shape[0]
    assert n_slots > batch.nnet_input.shape[0]

    def fake_eval_step(params, net_state, device_batch):
        logits = np.zeros((batch.nnet_input.shape[0],
                           batch.nnet_input.shape[1], 6), np.float32)
        return {"size": batch.size, "eval_loss": 1.0}, logits

    with pytest.raises(ValueError, match="unpacked"):
        run_validation_epoch(fake_eval_step, None, None, [batch],
                             shard_fn=lambda b: b, evaluate=True)
