"""Audio file IO + resampling without librosa/soundfile.

Front door is the native C++ core (native/amphion_io.cpp via
`data/native_io.py`: single-pass decode + Kaiser-sinc polyphase resample,
parallel batch loader); this module keeps the scipy implementation as the
reference oracle and automatic fallback. Behaviorally equivalent to the
reference's `librosa.load(sr=...)` (`utils/audio.py`).

Set AMPHION_NATIVE_IO=0 to force the scipy path.
"""

from __future__ import annotations

import math
import os
from pathlib import Path

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load_wav(path: str | Path, sr: int | None = None) -> tuple[np.ndarray, int]:
    """Load a wav file as float32 mono in [-1, 1]; optionally resample."""
    if os.environ.get("AMPHION_NATIVE_IO", "1") != "0":
        try:
            from amphion_tpu.data import native_io

            if native_io.available():
                return native_io.load_wav(path, sr)
        except Exception:
            pass  # fall back to the scipy path below
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
