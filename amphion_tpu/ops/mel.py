"""Mel spectrogram: fused frame→window→DFT→mel→log pipeline on device.

Numerical conventions match the reference front end (reference:
`utils/mel.py:55-170` — librosa slaney filterbank, reflect padding of
``(n_fft - hop)/2`` with center=False, magnitude floor ``sqrt(.+1e-6)``,
dynamic-range compression ``log(clamp(x, 1e-5))``) so that features and
evaluation metrics are comparable bit-closely. The filterbank itself is
re-derived from the Slaney mel-scale definition (no librosa dependency).

The whole pipeline is two MXU matmuls (windowed-DFT conv + mel projection)
plus elementwise ops, which XLA fuses into a single kernel — this is the
"mel-extraction frames/sec" benchmark path.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.ops.stft import _dft_kernel, _reflect_pad


@dataclass(frozen=True)
class MelConfig:
    """Front-end parameters (defaults = reference `config/base.json:52-57`)."""

    sample_rate: int = 24000
    n_fft: int = 1024
    win_size: int = 480
    hop_size: int = 120
    n_mel: int = 80
    fmin: float = 0.0
    fmax: float = 12000.0
    clip_val: float = 1e-5
    htk: bool = False  # HTK mel scale (kaldi-fbank-style front ends)
    # dataset-level log-mel standardization (ref `preprocess.mel_mean` /
    # `mel_var` — Vocos `vocos_trainer.py:512`, Coco `rep_coco_trainer.py:126`,
    # Vevo AR/FMT trainers and `vevo_utils.py:267` all run in
    # `(logmel - mean) / sqrt(var)` space; defaults are a no-op)
    mean: float = 0.0
    var: float = 1.0

    @classmethod
    def from_preprocess_cfg(cls, p) -> "MelConfig":
        """Build from a reference-style ``cfg.preprocess`` block."""
        return cls(
            sample_rate=p.sample_rate,
            n_fft=p.n_fft,
            win_size=p.win_size,
            hop_size=p.hop_size,
            n_mel=p.n_mel,
            fmin=p.fmin,
            fmax=p.fmax,
            mean=float(p.get("mel_mean", 0.0)),
            var=float(p.get("mel_var", 1.0)),
        )


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(
        log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels
    )
    return mels


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mel: int,
    fmin: float,
    fmax: float,
    htk: bool = False,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, (n_mel, n_fft//2+1).

    Identical in definition to ``librosa.filters.mel(..., htk=False,
    norm="slaney")``, which is what the reference uses (`utils/mel.py:65-72`).
    """
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    if htk:
        def hz2mel(f):
            return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

        def mel2hz(m):
            return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

        mel_pts = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mel + 2))
    else:
        mel_pts = _mel_to_hz_slaney(
            np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mel + 2)
        )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mel + 2] - mel_pts[:n_mel])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def log_compression(x: jax.Array, clip_val: float = 1e-5, c: float = 1.0) -> jax.Array:
    """Dynamic range compression ``log(clamp(x, clip) * C)`` (ref `utils/mel.py:10`)."""
    return jnp.log(jnp.maximum(x, clip_val) * c)


def _use_pallas_mel(cfg: MelConfig) -> bool:
    """Fused Pallas front end on TPU for production-sized configs
    (1.8x over the strided-conv XLA path, parity ~2e-4 in log-mel;
    AMPHION_PALLAS_MEL=0 disables)."""
    import os

    if os.environ.get("AMPHION_PALLAS_MEL", "1") == "0":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    from amphion_tpu.ops import pallas_kernels

    if not pallas_kernels._HAS_PALLAS:
        return False
    # n_fft > 1024 overflows the 16 MB scoped-vmem stack in the fused
    # kernel's DFT matmul (multiscale losses use 2048) — XLA path there
    return cfg.hop_size >= 32 and cfg.hop_size % 8 == 0 and cfg.n_fft <= 1024


@functools.partial(jax.jit, static_argnums=(1,))
def mel_spectrogram(y: jax.Array, cfg: MelConfig) -> jax.Array:
    """Log-mel spectrogram of a batch of waveforms.

    Args:
        y: (B, T) or (T,) float32 waveform in [-1, 1]; T should be a multiple
            of ``hop_size`` for exactly ``T // hop_size`` frames.
        cfg: static MelConfig.
    Returns:
        (B, n_mel, T // hop_size) log-mel features.
    """
    if y.ndim == 1:
        y = y[None]
    if _use_pallas_mel(cfg):
        from amphion_tpu.ops.pallas_kernels import mel_spectrogram_pallas

        mel = mel_spectrogram_pallas(y, cfg, interpret=False)
        return _standardize(mel, cfg)
    return mel_spectrogram_xla(y, cfg)


@functools.partial(jax.jit, static_argnums=(1,))
def mel_spectrogram_xla(y: jax.Array, cfg: MelConfig) -> jax.Array:
    """The strided-conv XLA mel (always-differentiable reference path)."""
    if y.ndim == 1:
        y = y[None]
    pad = (cfg.n_fft - cfg.hop_size) // 2
    y = _reflect_pad(y.astype(jnp.float32), pad)
    kernel = jnp.asarray(_dft_kernel(cfg.n_fft, cfg.win_size))
    out = jax.lax.conv_general_dilated(
        y[:, None, :],
        kernel[:, None, :],
        window_strides=(cfg.hop_size,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    f = cfg.n_fft // 2 + 1
    re, im = out[:, :f, :], out[:, f:, :]
    mag = jnp.sqrt(re * re + im * im + 1e-6)
    basis = jnp.asarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mel, cfg.fmin,
                       cfg.fmax, cfg.htk)
    )
    mel = jnp.einsum("mf,bfn->bmn", basis, mag, precision=jax.lax.Precision.HIGHEST)
    return _standardize(log_compression(mel, cfg.clip_val), cfg)


def _standardize(mel: jax.Array, cfg: MelConfig) -> jax.Array:
    """Apply the config's dataset-level mean/var (no-op at the defaults)."""
    if cfg.mean == 0.0 and cfg.var == 1.0:
        return mel
    return (mel - cfg.mean) * (1.0 / math.sqrt(cfg.var))


@functools.partial(jax.jit, static_argnums=(1,))
def linear_spectrogram(y: jax.Array, cfg: MelConfig) -> jax.Array:
    """Linear magnitude spectrogram, (B, n_fft//2+1, T//hop) (ref `utils/mel.py:20-52`)."""
    if y.ndim == 1:
        y = y[None]
    pad = (cfg.n_fft - cfg.hop_size) // 2
    y = _reflect_pad(y.astype(jnp.float32), pad)
    kernel = jnp.asarray(_dft_kernel(cfg.n_fft, cfg.win_size))
    out = jax.lax.conv_general_dilated(
        y[:, None, :],
        kernel[:, None, :],
        window_strides=(cfg.hop_size,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    f = cfg.n_fft // 2 + 1
    re, im = out[:, :f, :], out[:, f:, :]
    return jnp.sqrt(re * re + im * im + 1e-9)
