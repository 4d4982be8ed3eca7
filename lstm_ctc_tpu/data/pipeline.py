"""Host input pipeline: splice/subsample + length-bucketed padded batches.

The reference pads every batch to the longest utterance in it with tf.data's
``padded_batch`` (reference nnet/pipeline.py:35-51), which on TPU would
trigger one XLA recompilation per distinct batch shape.  Here utterances are
assigned to a small, dataset-stable set of *length buckets*; every batch from
a bucket has the same ``[B, T_bucket, D]`` / ``[B, U_bucket]`` shape, so the
jitted train step compiles once per bucket and never again.

Padding semantics match the reference: features pad with 0.0, targets with
-1 (reference nnet/pipeline.py:43-47).  Short final batches are filled with
dummy rows of ``sequence_length == 0`` whose targets are all -1, so they
contribute nothing to the label-count normalizer ``size``
(reference nnet/graph.py:105-106) nor to the CTC loss.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .records import RecordLoader, RecordMeta


# ---------------------------------------------------------------------------
# Per-utterance transforms (reference nnet/tfrecord.py:28-51 semantics)
# ---------------------------------------------------------------------------

def splice_frames(feats: np.ndarray, left_context: int,
                  right_context: int) -> np.ndarray:
    """Stack ±context frames per frame, edge-padding with the first/last
    frame.  [T, D] → [T, D*(1+left+right)]."""
    if not left_context and not right_context:
        return feats
    num_rows = feats.shape[0]
    padded = np.concatenate(
        [np.repeat(feats[:1], left_context, axis=0), feats,
         np.repeat(feats[-1:], right_context, axis=0)], axis=0)
    window = left_context + right_context + 1
    cols = [padded[i:i + num_rows] for i in range(window)]
    return np.concatenate(cols, axis=1)


def subsample_frames(feats: np.ndarray, factor: int) -> np.ndarray:
    """Keep every ``factor``-th frame; output length is floor(T/factor),
    matching the reference's ``range(T/factor)*factor`` gather
    (nnet/tfrecord.py:43-51)."""
    if not factor or factor == 1:
        return feats
    out_len = feats.shape[0] // factor
    return feats[:out_len * factor:factor]


def output_length(num_rows: int, subsample: int) -> int:
    if not subsample or subsample == 1:
        return num_rows
    return num_rows // subsample


# ---------------------------------------------------------------------------
# Bucketing
# ---------------------------------------------------------------------------

DEFAULT_TIME_QUANT = 64
DEFAULT_LABEL_QUANT = 16


def _quantize(value: int, quant: int, minimum: int) -> int:
    return max(minimum, -(-value // quant) * quant)


@dataclass
class Bucket:
    time_steps: int              # padded T for every batch in this bucket
    label_steps: int             # padded U
    member_indices: List[int] = field(default_factory=list)


@dataclass
class Batch:
    """One padded batch of host arrays, contract-named like the reference
    pipeline dict (reference nnet/pipeline.py:59-64)."""
    nnet_input: np.ndarray       # [B, T, D] float32
    sequence_length: np.ndarray  # [B] int32 (0 for padding rows)
    nnet_target: np.ndarray      # [B, U] int32, padded with -1
    target_length: np.ndarray    # [B] int32
    keys: List[str] = field(default_factory=list)

    @property
    def size(self) -> int:
        """Total number of real target labels — the loss normalizer
        (reference nnet/graph.py:105-106)."""
        return int((self.nnet_target >= 0).sum())


class BucketedBatcher:
    """Assigns utterances to static length buckets and yields fixed-shape
    padded batches in shuffled order."""

    def __init__(self,
                 metas: Sequence[RecordMeta],
                 batch_size: int,
                 left_context: int = 0,
                 right_context: int = 0,
                 subsample: int = 0,
                 time_quant: int = DEFAULT_TIME_QUANT,
                 label_quant: int = DEFAULT_LABEL_QUANT,
                 label_lengths: Optional[Sequence[int]] = None):
        self.metas = list(metas)
        self.batch_size = batch_size
        self.left_context = left_context
        self.right_context = right_context
        self.subsample = subsample
        if not self.metas:
            raise ValueError("empty dataset")
        self.input_dim = self.metas[0].num_cols * (
            1 + left_context + right_context)

        # Bucket shapes are a pure function of the dataset → stable across
        # epochs → a fixed set of XLA compilations.
        lengths = [output_length(m.num_rows, subsample) for m in self.metas]
        buckets: Dict[int, Bucket] = {}
        for idx, t_len in enumerate(lengths):
            t_pad = _quantize(t_len, time_quant, time_quant)
            bucket = buckets.setdefault(t_pad, Bucket(t_pad, 0))
            bucket.member_indices.append(idx)
        if label_lengths is None:
            label_lengths = [0] * len(self.metas)
        for bucket in buckets.values():
            max_u = max((label_lengths[i] for i in bucket.member_indices),
                        default=0)
            bucket.label_steps = _quantize(max_u, label_quant, label_quant)
        self.buckets = [buckets[k] for k in sorted(buckets)]
        self._lengths = lengths
        self._label_lengths = list(label_lengths)

    def shapes(self) -> List:
        return [(b.time_steps, b.label_steps) for b in self.buckets]

    def batch_plan(self, shuffle: bool, seed: Optional[int]):
        """Partition utterance indices into (bucket_index, indices) batches."""
        rng = np.random.RandomState(seed if seed is not None else 0)
        plan = []
        for bucket_idx, bucket in enumerate(self.buckets):
            members = list(bucket.member_indices)
            if shuffle:
                rng.shuffle(members)
            for start in range(0, len(members), self.batch_size):
                plan.append((bucket_idx,
                             members[start:start + self.batch_size]))
        if shuffle:
            rng.shuffle(plan)
        return plan

    def assemble(self, bucket_idx: int, indices: List[int],
                 loader) -> Batch:
        """Load, transform and pad a batch given utterance indices (all from
        one bucket).  ``loader`` is a RecordLoader (numpy path) or a
        native_loader.NativeRecordLoader (fused C++ path)."""
        bucket = self.buckets[bucket_idx]
        batch_b = self.batch_size
        t_pad, u_pad = bucket.time_steps, bucket.label_steps
        feats = np.zeros((batch_b, t_pad, self.input_dim), dtype=np.float32)
        seq_len = np.zeros((batch_b,), dtype=np.int32)
        targets = np.full((batch_b, u_pad), -1, dtype=np.int32)
        tgt_len = np.zeros((batch_b,), dtype=np.int32)
        keys = []
        native = hasattr(loader, "load_row")
        for row, idx in enumerate(indices):
            meta = self.metas[idx]
            if native:
                t_len, label_len = loader.load_row(
                    meta, self.left_context, self.right_context,
                    self.subsample, feats[row], targets[row])
                seq_len[row] = t_len
                tgt_len[row] = label_len
                keys.append(meta.key)
                continue
            key, mat, labels = loader.load(meta)
            mat = splice_frames(mat, self.left_context, self.right_context)
            mat = subsample_frames(mat, self.subsample)
            t_len = mat.shape[0]
            feats[row, :t_len] = mat
            seq_len[row] = t_len
            if labels is not None and len(labels):
                targets[row, :len(labels)] = labels
                tgt_len[row] = len(labels)
            keys.append(key)
        return Batch(feats, seq_len, targets, tgt_len, keys)


def iterate_batches(batcher: BucketedBatcher,
                    shuffle: bool = False,
                    seed: Optional[int] = None,
                    prefetch: int = 4) -> Iterator[Batch]:
    """Yield one epoch of batches, assembling them on a background thread."""
    plan = batcher.batch_plan(shuffle, seed)
    from . import native_loader
    if native_loader.available():
        loader = native_loader.NativeRecordLoader()
    else:
        loader = RecordLoader()

    def produce(q: "queue.Queue"):
        try:
            for bucket_idx, indices in plan:
                q.put(batcher.assemble(bucket_idx, indices, loader))
            q.put(None)
        except BaseException as exc:
            q.put(exc)

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    threading.Thread(target=produce, args=(q,), daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        loader.close()


def iterate_utterances(metas: Sequence[RecordMeta],
                       left_context: int = 0,
                       right_context: int = 0,
                       subsample: int = 0):
    """Streaming single-utterance pipeline for inference (the reference's
    ``create_pipeline_sequential``, nnet/pipeline.py:66-86)."""
    loader = RecordLoader()
    try:
        for meta in metas:
            key, mat, labels = loader.load(meta)
            mat = splice_frames(mat, left_context, right_context)
            mat = subsample_frames(mat, subsample)
            yield key, mat, labels
    finally:
        loader.close()
