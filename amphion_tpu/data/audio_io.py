"""Audio file IO + resampling without librosa/soundfile.

WAV read/write via scipy (PCM16/24/32/float), resampling via polyphase
filtering (`scipy.signal.resample_poly`) — behaviorally equivalent to the
reference's `librosa.load(sr=...)` front door (`utils/audio.py`).
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load_wav(path: str | Path, sr: int | None = None) -> tuple[np.ndarray, int]:
    """Load a wav file as float32 mono in [-1, 1]; optionally resample."""
    file_sr, data = wavfile.read(str(path))
    if data.dtype == np.int16:
        x = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        x = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        x = (data.astype(np.float32) - 128.0) / 128.0
    else:
        x = data.astype(np.float32)
    if x.ndim == 2:
        x = x.mean(axis=1)
    if sr is not None and sr != file_sr:
        x = resample(x, file_sr, sr)
        file_sr = sr
    return x, file_sr


def save_wav(path: str | Path, x: np.ndarray, sr: int) -> None:
    """Write float waveform as PCM16."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    x = np.nan_to_num(np.asarray(x, np.float32))
    x = np.clip(x, -1.0, 1.0)
    wavfile.write(str(path), sr, (x * 32767.0).astype(np.int16))


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling with the minimal rational ratio."""
    if orig_sr == target_sr:
        return x
    g = math.gcd(orig_sr, target_sr)
    return resample_poly(x, target_sr // g, orig_sr // g).astype(np.float32)
