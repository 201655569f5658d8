"""Batch samplers: dataset-scheduled batching, token-budget bucketing, resume.

Re-designs the reference's sampling stack for static-shape TPU execution:

- `ScheduledSampler` (reference `models/base/base_sampler.py:18-120`): batches
  never cross dataset boundaries inside a concatenated corpus; optional
  shuffle at corpus or batch granularity.
- `batch_by_size` (reference `models/base/base_trainer.py:34-88`, fairseq
  style): groups indices under a max-token budget.
- `VariableSampler` (reference `models/base/base_sampler.py:139`): wraps
  precomputed variable batches, supports `skip_steps` fast-forward on resume.
- `LengthBucketSampler` (TPU addition): token-budget batching *quantized to a
  fixed set of padded lengths*, so every emitted batch has one of a small
  number of static (batch, length) shapes — bounded XLA recompilation, unlike
  the reference's fully dynamic shapes.
"""

from __future__ import annotations

import numpy as np


class ScheduledSampler:
    """Yield batches of global indices that stay within one dataset each."""

    def __init__(
        self,
        dataset_sizes: list[int],
        batch_size: int,
        holistic_shuffle: bool = False,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.dataset_sizes = list(dataset_sizes)
        self.batch_size = batch_size
        self.holistic_shuffle = holistic_shuffle
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._offsets = np.concatenate([[0], np.cumsum(self.dataset_sizes)])

    def __iter__(self):
        all_batches = []
        for d, size in enumerate(self.dataset_sizes):
            idx = np.arange(size) + self._offsets[d]
            if self.shuffle:
                self._rng.shuffle(idx)
            n_full = size // self.batch_size
            for b in range(n_full):
                all_batches.append(idx[b * self.batch_size : (b + 1) * self.batch_size])
            if not self.drop_last and size % self.batch_size:
                all_batches.append(idx[n_full * self.batch_size :])
        if self.holistic_shuffle and self.shuffle:
            self._rng.shuffle(all_batches)
        yield from (b.tolist() for b in all_batches)

    def __len__(self):
        if self.drop_last:
            return sum(s // self.batch_size for s in self.dataset_sizes)
        return sum(-(-s // self.batch_size) for s in self.dataset_sizes)


def batch_by_size(
    indices: np.ndarray,
    num_tokens_fn,
    max_tokens: int | None = None,
    max_sentences: int | None = None,
    required_batch_size_multiple: int = 1,
) -> list[list[int]]:
    """Group indices into token-budget batches (fairseq semantics)."""
    batches: list[list[int]] = []
    cur: list[int] = []
    cur_max = 0
    for i in indices:
        t = num_tokens_fn(int(i))
        new_max = max(cur_max, t)
        overflow = (
            (max_tokens is not None and (len(cur) + 1) * new_max > max_tokens)
            or (max_sentences is not None and len(cur) + 1 > max_sentences)
        )
        if overflow and cur:
            m = required_batch_size_multiple
            keep = len(cur) if len(cur) < m else (len(cur) // m) * m
            batches.append(cur[:keep])
            cur = cur[keep:]
            cur_max = max((num_tokens_fn(j) for j in cur), default=0)
        cur.append(int(i))
        cur_max = max(cur_max, t)
    if cur:
        batches.append(cur)
    return batches


class VariableSampler:
    """Iterate precomputed batches; `skip_steps` fast-forwards after resume
    (reference `models/base/base_sampler.py:139-168`, used by
    `base_trainer.py:551-553`)."""

    def __init__(self, batches: list[list[int]], shuffle: bool = False, seed: int = 0):
        self.batches = list(batches)
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self.skip_steps = 0

    def set_skip_steps(self, n: int) -> None:
        self.skip_steps = n

    def __iter__(self):
        order = list(range(len(self.batches)))
        if self.shuffle:
            self._rng.shuffle(order)
        skipped = 0
        for i in order:
            if skipped < self.skip_steps:
                skipped += 1
                continue
            yield self.batches[i]
        self.skip_steps = 0

    def __len__(self):
        return len(self.batches)


class LengthBucketSampler:
    """Token-budget batching with shapes quantized to static buckets.

    Each emitted batch is (indices, padded_len) where padded_len comes from a
    geometric ladder of bucket lengths — the TPU-native replacement for the
    reference's dynamic shapes (bounded set of compiled programs).
    """

    def __init__(
        self,
        lengths: list[int],
        max_tokens: int,
        bucket_growth: float = 1.3,
        min_bucket: int = 128,
        shuffle: bool = True,
        seed: int = 0,
    ):
        self.lengths = np.asarray(lengths)
        self.max_tokens = max_tokens
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        # geometric bucket ladder covering [min_bucket, max length]
        buckets = [min_bucket]
        while buckets[-1] < self.lengths.max():
            buckets.append(int(np.ceil(buckets[-1] * bucket_growth)))
        self.buckets = np.asarray(buckets)

    def bucket_of(self, length: int) -> int:
        return int(self.buckets[np.searchsorted(self.buckets, length)])

    def __iter__(self):
        idx = np.argsort(self.lengths, kind="stable")  # group similar lengths
        by_bucket: dict[int, list[int]] = {}
        for i in idx:
            b = self.bucket_of(int(self.lengths[i]))
            by_bucket.setdefault(b, []).append(int(i))
        batches = []
        for b, members in by_bucket.items():
            bs = max(1, self.max_tokens // b)
            for k in range(0, len(members), bs):
                group = members[k : k + bs]
                batches.append((group, b))
        if self.shuffle:
            self._rng.shuffle(batches)
        yield from batches

    def __len__(self):
        n = 0
        by_bucket: dict[int, int] = {}
        for ln in self.lengths:
            b = self.bucket_of(int(ln))
            by_bucket[b] = by_bucket.get(b, 0) + 1
        for b, cnt in by_bucket.items():
            bs = max(1, self.max_tokens // b)
            n += -(-cnt // bs)
        return n
