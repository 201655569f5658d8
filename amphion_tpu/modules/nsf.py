"""Neural source-filter excitation (NSF-HiFiGAN source module).

Reference: `modules/neural_source_filter/sine_excitation.py:18` (`SineGen`)
and `models/vocoders/gan/generator/nsfhifigan.py:162`
(`SourceModuleHnNSF`): F0 → harmonic sine stack + noise → tanh-mixed
excitation signal. TPU version: phase accumulation is a cumulative sum over
the upsampled F0 track (vectorized, jit-safe), harmonics generated in one
broadcast.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def upsample_f0(f0: jax.Array, hop: int) -> jax.Array:
    """(B, N) frame-rate F0 → (B, N*hop) sample-rate (nearest-neighbor)."""
    return jnp.repeat(f0, hop, axis=-1)


class SineGen(nn.Module):
    """Harmonic sine generator with voiced/unvoiced noise mixing."""

    sample_rate: int
    num_harmonics: int = 7  # fundamental + 7 overtones = 8 channels
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0: jax.Array, rng: jax.Array | None = None):
        """f0: (B, T) sample-rate F0 in Hz → (sines (B, T, H+1), uv (B, T)).

        The reference (sine_excitation.py:35-82) detects phase wraps on an
        interpolated cumulative track and subtracts integers before the
        final per-sample cumsum — a mod-1 no-op under sin(2π·), so the
        plain per-sample phase accumulation here is mathematically
        identical. ``rng=None`` gives the deterministic path (zero initial
        phases, no additive noise)."""
        uv = (f0 > self.voiced_threshold).astype(jnp.float32)
        h = jnp.arange(1, self.num_harmonics + 2, dtype=jnp.float32)
        # instantaneous normalized frequency per harmonic
        rad = (f0[..., None] * h[None, None, :] / self.sample_rate) % 1.0
        if rng is not None:
            rng, r1, r2 = jax.random.split(rng, 3)
            # random initial phase per harmonic (except fundamental)
            init_phase = jax.random.uniform(
                r1, (f0.shape[0], 1, self.num_harmonics + 1))
            init_phase = init_phase.at[:, :, 0].set(0.0)
        else:
            init_phase = 0.0
        phase = 2.0 * jnp.pi * (jnp.cumsum(rad, axis=1) % 1.0 + init_phase)
        sines = jnp.sin(phase) * self.sine_amp
        # unvoiced: white noise at sine_amp/3; voiced: small additive noise
        if rng is not None:
            noise_amp = uv[..., None] * self.noise_std + (1 - uv[..., None]) * (
                self.sine_amp / 3.0
            )
            noise = noise_amp * jax.random.normal(r2, sines.shape)
        else:
            noise = 0.0
        sines = sines * uv[..., None] + noise
        return sines, uv


class SourceModuleHnNSF(nn.Module):
    """Merge harmonics into a single excitation channel (ref
    `nsfhifigan.py:162-180`)."""

    sample_rate: int
    num_harmonics: int = 7
    sine_amp: float = 0.1
    noise_std: float = 0.003

    @nn.compact
    def __call__(self, f0: jax.Array, rng: jax.Array | None = None):
        sines, uv = SineGen(
            self.sample_rate, self.num_harmonics, self.sine_amp, self.noise_std,
            name="sinegen",
        )(f0, rng)
        merged = jnp.tanh(nn.Dense(1, name="merge")(sines))
        return merged, uv  # (B, T, 1), (B, T)
