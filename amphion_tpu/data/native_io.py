"""ctypes binding for the native data-loading core (native/amphion_io.cpp).

WAV decode + Kaiser-sinc polyphase resample + batched segment assembly in
C++ — the framework's native equivalent of the reference's libsndfile/
librosa IO stack (`utils/audio.py`). Builds on demand with `make` the first
time it's imported (cached .so); callers fall back to the scipy path in
`audio_io.py` when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libamphion_io.so"
_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True,
            capture_output=True, timeout=120,
        )
        return _LIB_PATH.is_file()
    except Exception:
        return False


def get_lib():
    """The loaded library, or None when unavailable (no toolchain)."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.is_file() and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_failed = True
        return None
    lib.amphion_wav_load.restype = ctypes.c_int64
    lib.amphion_wav_load.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.amphion_wav_info.restype = ctypes.c_int
    lib.amphion_wav_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.amphion_batch_segments.restype = ctypes.c_int
    lib.amphion_batch_segments.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def wav_info(path: str | Path) -> tuple[int, int]:
    """(sample_rate, n_samples); raises on parse failure."""
    lib = get_lib()
    assert lib is not None
    sr = ctypes.c_int(0)
    n = ctypes.c_int64(0)
    rc = lib.amphion_wav_info(str(path).encode(), ctypes.byref(sr),
                              ctypes.byref(n))
    if rc != 0:
        raise OSError(f"native wav parse failed: {path}")
    return sr.value, n.value


def load_wav(path: str | Path, sr: int | None = None) -> tuple[np.ndarray, int]:
    """float32 mono in [-1, 1], optionally resampled. Same contract as
    `audio_io.load_wav` (buffer sized from the file — no silent cap)."""
    lib = get_lib()
    assert lib is not None
    file_sr, n_samples = wav_info(path)
    target = sr or 0
    out_sr = sr or file_sr
    cap = int(n_samples * (out_sr / file_sr)) + 16 if file_sr else 16
    buf = np.empty(max(cap, 16), np.float32)
    got_sr = ctypes.c_int(0)
    n = lib.amphion_wav_load(
        str(path).encode(), target,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.size,
        ctypes.byref(got_sr),
    )
    if n < 0:
        raise OSError(f"native wav load failed: {path}")
    return buf[:n].copy(), got_sr.value


def batch_segments(paths: list[str], starts: list[int], segment_len: int,
                   sr: int, n_threads: int = 4) -> np.ndarray:
    """Decode + resample + crop a batch of segments in parallel C++ threads.
    Returns (len(paths), segment_len) float32; short clips are zero-padded."""
    lib = get_lib()
    assert lib is not None
    n = len(paths)
    out = np.zeros((n, segment_len), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    c_starts = np.asarray(starts, np.int64)
    failures = lib.amphion_batch_segments(
        c_paths, n, sr,
        c_starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        segment_len, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if failures:
        raise OSError(f"native batch load: {failures}/{n} files failed")
    return out
