"""Emilia-scale streaming dataset.

Reference: `models/base/emilia_dataset.py:40` — 101k-hour corpus mounted as
wav shards with pickle-cached path/meta indexes (`:111-216`), served by
index without loading everything in RAM.

TPU re-design: a JSON/JSONL shard index (built once, cached), lazy per-item
wav loading with an LRU byte cache, fixed-length crop collation for
step-based trainers.
"""

from __future__ import annotations

import json
import pickle
from collections import OrderedDict
from pathlib import Path

import numpy as np

from amphion_tpu.data.audio_io import load_wav


class EmiliaDataset:
    def __init__(
        self,
        mount_path: str | Path,
        cache_path: str | Path | None = None,
        sample_rate: int = 24000,
        segment_seconds: float = 10.0,
        cache_items: int = 256,
        seed: int = 0,
    ):
        self.mount = Path(mount_path)
        self.sample_rate = sample_rate
        self.segment = int(segment_seconds * sample_rate)
        self._rng = np.random.default_rng(seed)
        self._lru: OrderedDict[int, np.ndarray] = OrderedDict()
        self._cache_items = cache_items

        cache = Path(cache_path) if cache_path else self.mount / ".index.pkl"
        if cache.is_file():
            with open(cache, "rb") as f:
                self.paths, self.meta = pickle.load(f)
        else:
            self.paths, self.meta = self._build_index()
            try:
                with open(cache, "wb") as f:
                    pickle.dump((self.paths, self.meta), f)
            except OSError:
                pass  # read-only mount

    def _build_index(self):
        """Walk the mount for wavs + sidecar json metadata (ref `:111-216`)."""
        paths, meta = [], []
        for wav in sorted(self.mount.rglob("*.wav")):
            rec = {}
            side = wav.with_suffix(".json")
            if side.is_file():
                try:
                    rec = json.loads(side.read_text())
                except json.JSONDecodeError:
                    rec = {}
            paths.append(str(wav))
            meta.append(rec)
        return paths, meta

    def __len__(self):
        return len(self.paths)

    def _audio(self, i: int) -> np.ndarray:
        if i in self._lru:
            self._lru.move_to_end(i)
            return self._lru[i]
        x, _ = load_wav(self.paths[i], sr=self.sample_rate)
        self._lru[i] = x
        if len(self._lru) > self._cache_items:
            self._lru.popitem(last=False)
        return x

    def __getitem__(self, i: int) -> dict:
        x = self._audio(i)
        if len(x) <= self.segment:
            audio = np.zeros(self.segment, np.float32)
            audio[: len(x)] = x
            length = len(x)
        else:
            start = int(self._rng.integers(0, len(x) - self.segment))
            audio = x[start : start + self.segment]
            length = self.segment
        return {
            "audio": audio,
            "length": length,
            "meta": self.meta[i],
            "uid": Path(self.paths[i]).stem,
        }

    # -- native batched loading ----------------------------------------------

    def _lengths(self) -> list[int]:
        """Per-file sample counts at the native rate (cached in the index)."""
        if not hasattr(self, "_len_cache"):
            self._len_cache = {}
        return self._len_cache

    def batch(self, indices, rng: np.random.Generator | None = None) -> np.ndarray:
        """Decode + resample + crop a whole batch through the C++ loader
        (native/amphion_io.cpp) in one call — the streaming path for
        step-based trainers at Emilia scale (no Python per-item loop, no
        RAM caching). Falls back to the per-item path without the native
        toolchain. Returns (len(indices), segment) float32."""
        rng = rng or self._rng
        try:
            from amphion_tpu.data import native_io

            if not native_io.available():
                raise ImportError
        except ImportError:
            return np.stack([self[i]["audio"] for i in indices])
        lens = self._lengths()
        starts = []
        for i in indices:
            if i not in lens:
                try:
                    sr, n = native_io.wav_info(self.paths[i])
                    lens[i] = int(n * self.sample_rate / sr)
                except OSError:
                    lens[i] = 0
            max_start = max(lens[i] - self.segment, 0)
            starts.append(int(rng.integers(0, max_start + 1)))
        return native_io.batch_segments(
            [self.paths[i] for i in indices], starts, self.segment,
            self.sample_rate,
        )
