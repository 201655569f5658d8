"""Frame-energy extraction (reference: `processors/acoustic_extractor.py:157-189`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from amphion_tpu.ops.stft import frame_signal


def energy_from_log_mel(log_mel: jax.Array) -> jax.Array:
    """'from_mel' mode: sqrt(sum(exp(mel)^2)) over mel bins.

    Input (B, n_mel, N) log-mel → (B, N).
    """
    return jnp.sqrt(jnp.sum(jnp.exp(log_mel) ** 2, axis=-2))


def energy_from_waveform(y: jax.Array, win_size: int, hop_size: int) -> jax.Array:
    """'from_waveform' mode: per-frame RMS energy. (B, T) → (B, T//hop)."""
    if y.ndim == 1:
        y = y[None]
    pad = (win_size - hop_size) // 2
    y = jnp.pad(y, [(0, 0), (pad, win_size - hop_size - pad)], mode="reflect")
    frames = frame_signal(y, win_size, hop_size)
    return jnp.sqrt(jnp.mean(frames**2, axis=-1) + 1e-10)
