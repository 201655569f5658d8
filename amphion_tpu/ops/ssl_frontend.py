"""Device-native front ends for the SSL content encoders.

The reference (and HF) computes these per-frame in a Python loop on the
host (`transformers/audio_utils.py::spectrogram`); here frame extraction,
windowing, rFFT, mel projection and normalization are batched jnp ops that
jit onto the accelerator, so the whole extract path (front end + encoder)
runs on device.

Two recipes, matched to their torch/numpy oracles:
- `seamless_fbank` — Kaldi-style log-mel + 2-frame stacking, the
  w2v-bert-2.0 input (SeamlessM4TFeatureExtractor: povey window,
  preemphasis 0.97, dc-offset removal, kaldi mel scale triangularized in
  mel space, per-bin mean/var normalization, stride-2 stacking).
- `whisper_log_mel` — Whisper's log10 mel (hann window, centered reflect
  pad, slaney mel + slaney norm, max-8 clamp, (x+4)/4), over the fixed
  30 s window.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _hertz_to_mel(freq, scale: str):
    freq = np.asarray(freq, np.float64)
    if scale == "kaldi":
        return 1127.0 * np.log(1.0 + freq / 700.0)
    # slaney: linear below 1 kHz, log above
    mels = 3.0 * freq / 200.0
    min_log_hertz, min_log_mel = 1000.0, 15.0
    logstep = 27.0 / np.log(6.4)
    log_region = freq >= min_log_hertz
    mels = np.where(log_region,
                    min_log_mel + np.log(np.maximum(freq, 1e-9)
                                         / min_log_hertz) * logstep,
                    mels)
    return mels


def _mel_to_hertz(mels, scale: str):
    mels = np.asarray(mels, np.float64)
    if scale == "kaldi":
        return 700.0 * (np.exp(mels / 1127.0) - 1.0)
    min_log_hertz, min_log_mel = 1000.0, 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    log_region = mels >= min_log_mel
    return np.where(log_region,
                    min_log_hertz * np.exp(logstep * (mels - min_log_mel)),
                    freq)


def _triangular_bank(fft_freqs: np.ndarray, filter_freqs: np.ndarray):
    diff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]
    down = -slopes[:, :-2] / diff[:-1]
    up = slopes[:, 2:] / diff[1:]
    return np.maximum(0.0, np.minimum(down, up))


@lru_cache(maxsize=None)
def kaldi_mel_filters(n_freq: int = 257, n_mels: int = 80,
                      fmin: float = 20.0, fmax: float = 8000.0,
                      sample_rate: int = 16000) -> np.ndarray:
    """(n_freq, n_mels) Kaldi-scale bank, triangularized in mel space
    (= transformers `mel_filter_bank(..., mel_scale="kaldi",
    triangularize_in_mel_space=True, norm=None)`)."""
    mel_min = _hertz_to_mel(fmin, "kaldi")
    mel_max = _hertz_to_mel(fmax, "kaldi")
    filter_freqs = np.linspace(mel_min, mel_max, n_mels + 2)
    fft_bin_width = sample_rate / ((n_freq - 1) * 2)
    fft_freqs = _hertz_to_mel(fft_bin_width * np.arange(n_freq), "kaldi")
    return _triangular_bank(fft_freqs, filter_freqs).astype(np.float32)


@lru_cache(maxsize=None)
def slaney_mel_filters(n_freq: int = 201, n_mels: int = 80,
                       fmin: float = 0.0, fmax: float = 8000.0,
                       sample_rate: int = 16000) -> np.ndarray:
    """(n_freq, n_mels) slaney-scale area-normalized bank (= transformers
    `mel_filter_bank(..., mel_scale="slaney", norm="slaney")`)."""
    mel_min = _hertz_to_mel(fmin, "slaney")
    mel_max = _hertz_to_mel(fmax, "slaney")
    mel_freqs = np.linspace(mel_min, mel_max, n_mels + 2)
    filter_freqs = _mel_to_hertz(mel_freqs, "slaney")
    fft_freqs = np.linspace(0, sample_rate // 2, n_freq)
    bank = _triangular_bank(fft_freqs, filter_freqs)
    enorm = 2.0 / (filter_freqs[2:n_mels + 2] - filter_freqs[:n_mels])
    return (bank * enorm[None, :]).astype(np.float32)


@lru_cache(maxsize=None)
def povey_window(n: int = 400) -> np.ndarray:
    return (np.hanning(n) ** 0.85).astype(np.float32)


@lru_cache(maxsize=None)
def _rdft_mats(frame_length: int, n_fft: int):
    """Real-DFT basis (cos, -sin) of shape (frame_length, n_fft//2+1) —
    the zero-padded rFFT expressed as two matmuls, the idiomatic TPU
    formulation (MXU, no FFT op; same trick as `ops/stft.py`)."""
    n = np.arange(frame_length, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


def _power_spectrum(frames, n_fft: int):
    """|rfft(frames zero-padded to n_fft)|^2 via DFT matmuls."""
    c, s = _rdft_mats(frames.shape[-1], n_fft)
    re = frames @ jnp.asarray(c)
    im = frames @ jnp.asarray(s)
    return re * re + im * im


def _frame(x, frame_length: int, hop: int):
    """(B, T) → (B, F, frame_length) gather framing (center=False)."""
    num = 1 + (x.shape[-1] - frame_length) // hop
    idx = np.arange(num)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[:, idx]


def num_fbank_frames(num_samples, frame_length: int = 400, hop: int = 160):
    """Frame count of the center=False framing (works on ints or arrays)."""
    return 1 + (num_samples - frame_length) // hop


def seamless_fbank(wav, n_mels: int = 80, stride: int = 2,
                   num_valid_samples=None):
    """Waveform (B, T) @16 kHz → stacked fbank (B, ceil(F/stride),
    n_mels*stride), jit-able. Matches SeamlessM4TFeatureExtractor with
    `do_normalize_per_mel_bins=True` (padded stack-remainder frames are
    zeros, like the HF pad-to-multiple-of-stride).

    `num_valid_samples` (B,) — when the batch is bucket-padded, the per-bin
    normalization statistics (which are GLOBAL over time) are computed over
    valid frames only and padded frames are zeroed, so valid outputs match
    the unpadded oracle exactly."""
    wav = jnp.asarray(wav, jnp.float32) * 32768.0  # Kaldi int16 compliance
    frames = _frame(wav, 400, 160)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # Kaldi preemphasis: x[i] -= 0.97*x[i-1]; x[0] *= (1 - 0.97)
    pre = frames.at[..., 1:].add(-0.97 * frames[..., :-1])
    pre = pre.at[..., 0].multiply(1.0 - 0.97)
    pre = pre * jnp.asarray(povey_window(400))
    power = _power_spectrum(pre, 512)
    filters = jnp.asarray(kaldi_mel_filters(257, n_mels))
    mel = jnp.log(jnp.maximum(power @ filters, 1.192092955078125e-07))
    # per-bin zero-mean unit-var over time (ddof=1)
    f = mel.shape[1]
    if num_valid_samples is None:
        mu = jnp.mean(mel, axis=1, keepdims=True)
        var = jnp.sum((mel - mu) ** 2, axis=1, keepdims=True) / max(f - 1, 1)
        mel = (mel - mu) / jnp.sqrt(var + 1e-7)
    else:
        nf = num_fbank_frames(jnp.asarray(num_valid_samples))
        m = (jnp.arange(f)[None, :] < nf[:, None]).astype(
            mel.dtype)[..., None]
        n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 2.0)
        mu = jnp.sum(mel * m, axis=1, keepdims=True) / n
        var = jnp.sum((mel - mu) ** 2 * m, axis=1, keepdims=True) / (n - 1.0)
        mel = (mel - mu) / jnp.sqrt(var + 1e-7) * m
    pad = (-f) % stride
    if pad:
        mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))
    return mel.reshape(mel.shape[0], (f + pad) // stride, n_mels * stride)


def whisper_log_mel(wav, n_mels: int = 80):
    """Waveform (B, 480000) (exactly 30 s @16 kHz — pad/trim on the host)
    → (B, n_mels, 3000) Whisper log-mel, jit-able."""
    wav = jnp.asarray(wav, jnp.float32)
    x = jnp.pad(wav, ((0, 0), (200, 200)), mode="reflect")
    frames = _frame(x, 400, 160)[:, :-1]  # HF drops the last frame
    win = np.hanning(401)[:400].astype(np.float32)  # periodic hann
    power = _power_spectrum(frames * win, 400)
    filters = jnp.asarray(slaney_mel_filters(201, n_mels))
    log_spec = jnp.log10(jnp.maximum(power @ filters, 1e-10))
    peak = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    return ((log_spec + 4.0) / 4.0).transpose(0, 2, 1)
