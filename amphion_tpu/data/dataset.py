"""Datasets: offline feature files + online (on-device DSP) audio datasets.

Two paths, mirroring the reference's split (reference:
`models/base/base_dataset.py:18-370` offline, newer trainers online e.g.
`models/vc/flow_matching_transformer/fmt_trainer.py:61-102`):

- `OfflineFeatureDataset` reads per-utterance ``.npy`` features from the
  processed-data directory layout (``<processed>/<dataset>/<feat_dir>/<uid>.npy``).
- `SegmentAudioDataset` serves fixed-length random waveform crops; all
  spectral features are computed *inside the jitted train step* on device —
  the TPU-native replacement for the reference's offline .npy round-trip.

Both return numpy; batching/padding is done by the collators so every batch
has a static shape.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path

import numpy as np

from amphion_tpu.data.audio_io import load_wav
from amphion_tpu.data.metadata import Utterance


class SegmentAudioDataset:
    """Random fixed-length segments from a list of utterances (vocoder/codec
    training). Short clips are zero-padded to segment length."""

    def __init__(
        self,
        utterances: list[Utterance],
        sample_rate: int,
        segment_samples: int,
        seed: int = 0,
    ):
        self.utts = utterances
        self.sample_rate = sample_rate
        self.segment_samples = segment_samples
        self._rng = np.random.default_rng(seed)
        self._cache: dict[int, np.ndarray] = {}

    def __len__(self):
        return len(self.utts)

    def audio(self, i: int) -> np.ndarray:
        if i not in self._cache:
            x, _ = load_wav(self.utts[i].path, sr=self.sample_rate)
            self._cache[i] = x
        return self._cache[i]

    def __getitem__(self, i: int) -> dict:
        x = self.audio(i)
        seg = self.segment_samples
        if len(x) <= seg:
            out = np.zeros(seg, np.float32)
            out[: len(x)] = x
        else:
            start = int(self._rng.integers(0, len(x) - seg))
            out = x[start : start + seg]
        return {"audio": out, "uid": self.utts[i].uid}


class OfflineFeatureDataset:
    """Per-uid .npy features following the reference directory contract."""

    def __init__(
        self,
        utterances: list[Utterance],
        processed_dir: str | Path,
        features: dict[str, str],  # name -> dir (e.g. {"mel": "mels", "f0": "f0"})
    ):
        self.utts = utterances
        self.processed_dir = Path(processed_dir)
        self.features = dict(features)

    def __len__(self):
        return len(self.utts)

    def feature_path(self, u: Utterance, feat: str) -> Path:
        return self.processed_dir / u.dataset / self.features[feat] / f"{u.uid}.npy"

    def __getitem__(self, i: int) -> dict:
        u = self.utts[i]
        out: dict = {"uid": u.uid}
        for name in self.features:
            out[name] = np.load(self.feature_path(u, name))
        return out


def pad_batch(arrays: list[np.ndarray], target_len: int | None = None, axis: int = 0):
    """Stack variable-length arrays with zero padding; returns (batch, lengths)."""
    lengths = np.asarray([a.shape[axis] for a in arrays], np.int32)
    t = int(target_len if target_len is not None else lengths.max())
    out = []
    for a in arrays:
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, t - a.shape[axis])
        out.append(np.pad(a, pad))
    return np.stack(out), lengths


class Prefetcher:
    """Background-thread batch prefetch (host → pipeline overlap)."""

    def __init__(self, iterator_fn, depth: int = 2):
        self._fn = iterator_fn
        self._depth = depth

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        stop = object()

        def worker():
            try:
                for item in self._fn():
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
