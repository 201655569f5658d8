"""Offline acoustic feature extraction — batched, on device.

The reference extracts features per-utterance on CPU in a python loop
(reference: `processors/acoustic_extractor.py:77-460` — mel via
`utils/mel.py`, F0 via `utils/f0.py`, energy, UV; statistics at `:462-846`).
The TPU pipeline instead buckets utterances by length, pads to static
shapes, and runs the fused STFT→mel / YIN kernels over whole batches,
writing the same per-uid ``.npy`` layout + the same normalization statistics
(mel min-max, pitch mean/std per singer) so downstream consumers match.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.audio_io import load_wav
from amphion_tpu.data.metadata import Utterance
from amphion_tpu.data.samplers import LengthBucketSampler
from amphion_tpu.ops.energy import energy_from_log_mel
from amphion_tpu.ops.f0 import F0Config, yin_f0
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram


def extract_acoustic_features(
    utterances: list[Utterance],
    output_dir: str | Path,
    mel_cfg: MelConfig,
    extract_f0: bool = True,
    extract_energy: bool = True,
    max_tokens: int = 4_000_000,  # samples per device batch
    pitch_extractor: str = "yin",  # "yin" | "pyin" (ref cfg pitch_extractor)
) -> dict:
    """Extract mel (+F0/UV, energy) for every utterance → .npy files.

    Returns the statistics dict (also written to disk).
    """
    out = Path(output_dir)
    for d in ("mels", "f0", "uv", "energy"):
        (out / d).mkdir(parents=True, exist_ok=True)

    hop = mel_cfg.hop_size
    audios: list[np.ndarray] = []
    for u in utterances:
        x, _ = load_wav(u.path, sr=mel_cfg.sample_rate)
        audios.append(x[: len(x) // hop * hop])

    lengths = [max(len(a), hop) for a in audios]
    sampler = LengthBucketSampler(lengths, max_tokens=max_tokens, shuffle=False)

    mel_min = np.full(mel_cfg.n_mel, np.inf)
    mel_max = np.full(mel_cfg.n_mel, -np.inf)
    pitch_stats: dict[str, list] = {}
    f0_cfg = F0Config(sample_rate=mel_cfg.sample_rate, hop_size=hop)
    if pitch_extractor == "pyin":
        from amphion_tpu.ops.f0 import PyinConfig, pyin_f0

        pyin_cfg = PyinConfig(base=f0_cfg)

    for idxs, bucket in sampler:
        batch = np.zeros((len(idxs), bucket), np.float32)
        for row, i in enumerate(idxs):
            batch[row, : lengths[i]] = audios[i][: lengths[i]]
        mel = np.asarray(mel_spectrogram(jnp.asarray(batch), mel_cfg))
        if extract_f0:
            if pitch_extractor == "pyin":
                f0, vp = pyin_f0(jnp.asarray(batch), pyin_cfg)
                voiced = f0 > 0
            else:
                f0, voiced = yin_f0(jnp.asarray(batch), f0_cfg)
            f0, voiced = np.asarray(f0), np.asarray(voiced)
        if extract_energy:
            energy = np.asarray(energy_from_log_mel(jnp.asarray(mel)))
        for row, i in enumerate(idxs):
            u = utterances[i]
            n = lengths[i] // hop
            m = mel[row, :, :n]
            np.save(out / "mels" / f"{u.uid}.npy", m)
            mel_min = np.minimum(mel_min, m.min(axis=1))
            mel_max = np.maximum(mel_max, m.max(axis=1))
            if extract_f0:
                np.save(out / "f0" / f"{u.uid}.npy", f0[row, :n])
                np.save(out / "uv" / f"{u.uid}.npy", voiced[row, :n])
                key = u.singer or u.speaker or "default"
                voiced_f0 = f0[row, :n][voiced[row, :n]]
                if voiced_f0.size:
                    pitch_stats.setdefault(key, []).append(voiced_f0)
            if extract_energy:
                np.save(out / "energy" / f"{u.uid}.npy", energy[row, :n])

    # statistics (ref `acoustic_extractor.py:462-577, :669-846`)
    stats = {
        "mel_min": mel_min.tolist(),
        "mel_max": mel_max.tolist(),
        "pitch": {},
    }
    for key, chunks in pitch_stats.items():
        allf0 = np.concatenate(chunks)
        stats["pitch"][key] = {
            "mean": float(allf0.mean()),
            "std": float(allf0.std()),
            "min": float(allf0.min()),
            "max": float(allf0.max()),
            "median": float(np.median(allf0)),
        }
    with open(out / "statistics.json", "w") as f:
        json.dump(stats, f, indent=2)
    return stats
