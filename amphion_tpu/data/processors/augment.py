"""Data augmentation (reference: `processors/data_augment.py` — pitch shift,
formant shift, equalizer, time stretch producing derived datasets, wired in
`bins/tts/preprocess.py:125-138`).

All native DSP: resampling-based pitch/time manipulation, random biquad
equalization via scipy.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import lfilter

from amphion_tpu.data.audio_io import resample


def time_stretch(x: np.ndarray, sr: int, rate: float) -> np.ndarray:
    """Phase-vocoder-free WSOLA-lite time stretch (overlap-add of windows at
    modified hops)."""
    if abs(rate - 1.0) < 1e-6:
        return x.copy()
    win = 1024
    hop_out = win // 4
    hop_in = int(round(hop_out * rate))
    n_frames = max(1, (len(x) - win) // hop_in)
    out_len = n_frames * hop_out + win
    out = np.zeros(out_len, np.float64)
    norm = np.zeros(out_len, np.float64)
    w = np.hanning(win)
    for i in range(n_frames):
        seg = x[i * hop_in : i * hop_in + win]
        if len(seg) < win:
            break
        out[i * hop_out : i * hop_out + win] += seg * w
        norm[i * hop_out : i * hop_out + win] += w
    out /= np.maximum(norm, 1e-8)
    return out.astype(np.float32)


def pitch_shift(x: np.ndarray, sr: int, semitones: float) -> np.ndarray:
    """Pitch shift preserving duration: resample then time-stretch back."""
    factor = 2.0 ** (semitones / 12.0)
    # resample to shift pitch (changes duration), then stretch back
    shifted = resample(x, sr, int(round(sr / factor)))
    out = time_stretch(shifted, sr, len(shifted) / len(x))
    if len(out) < len(x):
        out = np.pad(out, (0, len(x) - len(out)))
    return out[: len(x)]


def formant_shift(x: np.ndarray, sr: int, factor: float = 1.1) -> np.ndarray:
    """Crude formant shift: pitch-shift then pitch-shift back at a different
    rate, warping the spectral envelope (ref uses praat-style manipulation)."""
    semis = 12.0 * np.log2(factor)
    up = pitch_shift(x, sr, semis)
    return pitch_shift(up, sr, -semis * 0.5)


def random_equalizer(x: np.ndarray, sr: int, rng: np.random.Generator,
                     n_bands: int = 3, max_gain_db: float = 6.0) -> np.ndarray:
    """Random peaking-EQ chain (biquads)."""
    y = np.asarray(x, np.float64)
    for _ in range(n_bands):
        f0 = rng.uniform(100, min(8000, sr / 2 * 0.9))
        gain_db = rng.uniform(-max_gain_db, max_gain_db)
        q = rng.uniform(0.5, 2.0)
        a_ = 10 ** (gain_db / 40)
        w0 = 2 * np.pi * f0 / sr
        alpha = np.sin(w0) / (2 * q)
        b = [1 + alpha * a_, -2 * np.cos(w0), 1 - alpha * a_]
        a = [1 + alpha / a_, -2 * np.cos(w0), 1 - alpha / a_]
        y = lfilter(np.asarray(b) / a[0], np.asarray(a) / a[0], y)
    return y.astype(np.float32)


AUGMENTATIONS = {
    "pitch_shift": lambda x, sr, rng: pitch_shift(x, sr, rng.uniform(-4, 4)),
    "formant_shift": lambda x, sr, rng: formant_shift(x, sr, rng.uniform(0.9, 1.2)),
    "equalizer": lambda x, sr, rng: random_equalizer(x, sr, rng),
    "time_stretch": lambda x, sr, rng: time_stretch(x, sr, rng.uniform(0.85, 1.2)),
}


def augment_dataset(utterances, output_dir, sample_rate: int,
                    augmentations: list[str], seed: int = 0):
    """Produce derived datasets per augmentation (ref creates
    '<dataset>_pitch_shift' style variants)."""
    from pathlib import Path

    from amphion_tpu.data.audio_io import load_wav, save_wav
    from amphion_tpu.data.metadata import Utterance

    rng = np.random.default_rng(seed)
    derived = {}
    for aug in augmentations:
        fn = AUGMENTATIONS[aug]
        out = Path(output_dir) / aug
        out.mkdir(parents=True, exist_ok=True)
        new_utts = []
        for u in utterances:
            x, _ = load_wav(u.path, sr=sample_rate)
            y = fn(x, sample_rate, rng)
            path = out / f"{u.uid}.wav"
            save_wav(path, y, sample_rate)
            new_utts.append(
                Utterance(f"{u.dataset}_{aug}", u.uid, str(path),
                          len(y) / sample_rate, u.index, u.speaker, u.singer,
                          u.text, u.language)
            )
        derived[aug] = new_utts
    return derived
