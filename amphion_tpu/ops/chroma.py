"""Device-native chromagram (pitch-class energy profile).

The reference extracts chroma features on CPU through librosa
(``chroma_stft(y, sr, n_fft, hop_length, win_length, n_chroma=24)`` —
reference `models/svc/vevosing/vevosing_utils.py:380-398` ``get_chromagram``,
consumed by the Coco style / content-style tokenizers as the 24-dim prosody
stream, `models/codec/coco/rep_coco_model.py`). librosa runs on CPU numpy;
here the whole thing is a filterbank matmul over the existing fused STFT,
so it jits into the same XLA program as the rest of the front end.

The filterbank reproduces librosa's Gaussian-bump chroma filters
(`librosa.filters.chroma` semantics: log-frequency bin mapping relative to
A440/16, wrap-around distance, per-filter width = local bin spacing, L2
column norm, Gaussian octave weighting centered at ``ctroct``, rolled so
bin 0 = C). Frame layout is centered (librosa ``center=True``): exactly
``1 + T // hop`` frames; use :func:`chromagram_for_frames` for the
reference's edge-pad/truncate-to-``T // hop`` convention.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from amphion_tpu.ops.stft import stft


@functools.lru_cache(maxsize=8)
def chroma_filterbank(
    sr: int,
    n_fft: int,
    n_chroma: int = 24,
    tuning: float = 0.0,
    ctroct: float = 5.0,
    octwidth: float = 2.0,
    base_c: bool = True,
) -> np.ndarray:
    """(n_chroma, n_fft//2 + 1) chroma filterbank, librosa-compatible."""
    a440 = 440.0 * 2.0 ** (tuning / n_chroma)
    frequencies = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    # log-frequency position of every FFT bin, in chroma bins (A440/16 = A0
    # is octave 0); DC gets an artificial position 1.5 octaves below bin 1
    frqbins = n_chroma * np.log2(frequencies / (a440 / 16))
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidthbins = np.concatenate(
        (np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1.0]))
    d = frqbins[None, :] - np.arange(n_chroma, dtype=np.float64)[:, None]
    half = np.round(n_chroma / 2.0)
    d = np.remainder(d + half + 10 * n_chroma, n_chroma) - half
    wts = np.exp(-0.5 * (2 * d / binwidthbins[None, :]) ** 2)
    # L2-normalize each FFT-bin column
    norm = np.sqrt(np.sum(wts**2, axis=0, keepdims=True))
    wts = wts / np.maximum(norm, 1e-20)
    if octwidth is not None:
        wts *= np.exp(
            -0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2))[None, :]
    if base_c:
        # filterbank is built relative to A; roll so bin 0 = C
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return np.ascontiguousarray(wts[:, : n_fft // 2 + 1]).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def chroma_stft(
    y: jax.Array,
    sr: int,
    n_fft: int = 1024,
    hop_size: int = 120,
    win_size: int = 480,
    n_chroma: int = 24,
    power: float = 2.0,
) -> jax.Array:
    """(B, T) waveform → (B, n_chroma, 1 + T//hop) chromagram.

    Energy spectrogram (``power=2``) through the chroma filterbank, each
    frame normalized by its max (librosa ``norm=inf``; silent frames are
    left unnormalized rather than divided by ~0).
    """
    if y.ndim == 1:
        y = y[None]
    re, im = stft(y.astype(jnp.float32), n_fft, hop_size, win_size, True)
    s = re * re + im * im  # (B, F, N)
    if power != 2.0:
        s = jnp.power(jnp.sqrt(jnp.maximum(s, 1e-30)), power)
    fb = jnp.asarray(chroma_filterbank(sr, n_fft, n_chroma))
    raw = jnp.einsum("cf,bfn->bcn", fb, s,
                     precision=jax.lax.Precision.HIGHEST)
    peak = jnp.max(raw, axis=1, keepdims=True)
    return raw / jnp.where(peak > 1e-10, peak, 1.0)


def chromagram_for_frames(
    y: np.ndarray,
    n_frames: int,
    sr: int,
    n_fft: int = 1024,
    hop_size: int = 120,
    win_size: int = 480,
    n_chroma: int = 24,
    frame_len_ratio: float = 1.0,
) -> np.ndarray:
    """(T,) waveform → (n_frames, n_chroma), the reference's
    ``get_chromagram`` convention (`vevosing_utils.py:380-398`): transpose
    to time-major, edge-pad or truncate to exactly ``n_frames`` (the mel
    frame count ``T // hop``). ``frame_len_ratio != 1`` linearly resamples
    the time axis (the reference's duration-ratio knob for AR style input,
    `vevosing_utils.py:340-357`)."""
    c = np.asarray(
        chroma_stft(jnp.asarray(np.asarray(y, np.float32)), sr, n_fft,
                    hop_size, win_size, n_chroma))[0].T  # (N, C)
    if frame_len_ratio != 1.0:
        new_len = int(round(c.shape[0] * frame_len_ratio))
        # torch F.interpolate(mode="linear", align_corners=False) grid
        src = (np.arange(new_len) + 0.5) / frame_len_ratio - 0.5
        lo = np.clip(np.floor(src).astype(int), 0, c.shape[0] - 1)
        hi = np.clip(lo + 1, 0, c.shape[0] - 1)
        w = np.clip(src - lo, 0.0, 1.0)[:, None]
        c = c[lo] * (1 - w) + c[hi] * w
    if c.shape[0] < n_frames:
        c = np.pad(c, ((0, n_frames - c.shape[0]), (0, 0)), mode="edge")
    return c[:n_frames]
