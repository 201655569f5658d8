"""WORLD-style DSP vocoder baseline (no learned parameters).

Reference: `models/vocoders/dsp/world/world.py` + `utils/world.py` — the
reference calls the pyworld C library (F0/spectral envelope/aperiodicity
analysis + synthesis). pyworld does not exist on TPU; this module provides a
device-native harmonic + noise synthesis from (F0, spectral envelope) — a
source-filter sinusoidal model that fills the same "DSP baseline vocoder"
role and runs batched under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from amphion_tpu.modules.nsf import upsample_f0
from amphion_tpu.ops.mel import MelConfig, mel_filterbank


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def world_synthesis(
    f0: jax.Array,
    log_mel: jax.Array,
    sample_rate: int,
    hop_size: int,
    num_harmonics: int = 64,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Harmonic + noise synthesis: f0 (B, N) Hz, log_mel (B, N, n_mel).

    The mel envelope gates per-harmonic amplitudes (pseudo-inverse of the mel
    filterbank gives a linear-frequency envelope); unvoiced frames fall back
    to filtered noise.
    """
    b, n = f0.shape
    n_mel = log_mel.shape[-1]
    t = n * hop_size

    # envelope: mel → linear frequency magnitudes (least-squares unmix)
    fb = jnp.asarray(mel_filterbank(sample_rate, 1024, n_mel, 0.0, sample_rate / 2))
    env_lin = jnp.einsum("bnm,mf->bnf", jnp.exp(log_mel), jnp.linalg.pinv(fb).T)
    env_lin = jnp.maximum(env_lin, 1e-5)  # (B, N, 513)
    freqs = jnp.linspace(0, sample_rate / 2, env_lin.shape[-1])

    f0_up = upsample_f0(jnp.maximum(f0, 1.0), hop_size)  # (B, T)
    voiced = upsample_f0((f0 > 0).astype(jnp.float32), hop_size)

    k = jnp.arange(1, num_harmonics + 1)[None, None, :]  # harmonic index
    harm_freq = f0_up[..., None] * k  # (B, T, H)
    phase = 2 * jnp.pi * jnp.cumsum(harm_freq / sample_rate, axis=1)
    # amplitude of each harmonic from the envelope at its frequency
    env_up = jnp.repeat(env_lin, hop_size, axis=1)  # (B, T, F)
    bin_idx = jnp.clip(
        (harm_freq / (sample_rate / 2) * (env_lin.shape[-1] - 1)).astype(jnp.int32),
        0, env_lin.shape[-1] - 1,
    )
    amp = jnp.take_along_axis(env_up, bin_idx, axis=-1)
    nyq_mask = harm_freq < sample_rate / 2
    harm = jnp.sum(jnp.sin(phase) * amp * nyq_mask, axis=-1)

    if rng is None:
        rng = jax.random.key(0)
    noise = jax.random.normal(rng, (b, t)) * jnp.mean(env_up, axis=-1)
    out = harm * voiced + noise * (1.0 - voiced) * 0.3
    peak = jnp.max(jnp.abs(out), axis=-1, keepdims=True)
    return out / jnp.maximum(peak, 1.0)
