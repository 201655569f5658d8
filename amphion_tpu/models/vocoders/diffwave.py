"""DiffWave: diffusion vocoder over raw waveform.

Reference: `models/vocoders/diffusion/diffwave/diffwave.py:127` + trainer
`diffusion_vocoder_trainer.py`: a dilated-conv WaveNet denoiser over the
waveform conditioned on upsampled mel, trained with DDPM; inference is
iterative denoising (fast 6-step schedule supported).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.modules.diffusion import (
    DiffusionSchedule,
    ddpm_sample,
    timestep_embedding,
)


@dataclass(frozen=True)
class DiffWaveConfig:
    n_mel: int = 80
    hop_size: int = 256
    residual_channels: int = 64
    num_layers: int = 30
    dilation_cycle: int = 10
    num_train_steps: int = 50


class DiffWave(nn.Module):
    cfg: DiffWaveConfig

    @property
    def schedule(self) -> DiffusionSchedule:
        return DiffusionSchedule.create(
            self.cfg.num_train_steps, "linear", start=1e-4, end=0.05
        )

    @nn.compact
    def __call__(self, audio, t, mel):
        """audio (B, T); t (B,); mel (B, T//hop, n_mel) → eps (B, T)."""
        c = self.cfg
        x = audio[..., None]
        x = jax.nn.relu(nn.Conv(c.residual_channels, (1,), name="in_proj")(x))
        temb = timestep_embedding(t, 128)
        temb = nn.Dense(512, name="t1")(temb)
        temb = nn.Dense(c.residual_channels, name="t2")(nn.swish(temb))
        # upsample mel to sample rate (repeat; conv smoothing)
        cond = jnp.repeat(mel, c.hop_size, axis=1)
        cond = nn.Conv(2 * c.residual_channels, (3,), padding="SAME",
                       name="cond_proj")(cond)
        skip_total = 0.0
        for i in range(c.num_layers):
            dilation = 2 ** (i % c.dilation_cycle)
            y = x + temb[:, None, :]
            y = nn.Conv(2 * c.residual_channels, (3,), kernel_dilation=(dilation,),
                        padding="SAME", name=f"dil_{i}")(y)
            y = y + cond[:, : y.shape[1]]
            a, b = jnp.split(y, 2, axis=-1)
            y = jnp.tanh(a) * jax.nn.sigmoid(b)
            y = nn.Conv(2 * c.residual_channels, (1,), name=f"out_{i}")(y)
            res, skip = jnp.split(y, 2, axis=-1)
            x = (x + res) / jnp.sqrt(2.0)
            skip_total = skip_total + skip
        out = skip_total / jnp.sqrt(float(c.num_layers))
        out = jax.nn.relu(nn.Conv(c.residual_channels, (1,), name="post1")(out))
        return nn.Conv(1, (1,), name="post2", kernel_init=nn.initializers.zeros)(out)[..., 0]

    def loss(self, audio, mel, rng):
        sched = self.schedule
        r_t, r_n = jax.random.split(rng)
        b = audio.shape[0]
        t = jax.random.randint(r_t, (b,), 0, sched.num_steps)
        noise = jax.random.normal(r_n, audio.shape)
        x_t = sched.q_sample(audio, t, noise)
        eps = self(x_t, t, mel)
        return jnp.mean((eps - noise) ** 2)


import functools


@functools.lru_cache(maxsize=16)
def _diffwave_sample_jitted(model, b, n, num_steps):
    sched = model.schedule
    shape = (b, n * model.cfg.hop_size)

    def core(params, mel, rng):
        def eps_fn(x, t):
            return model.apply({"params": params}, x, jnp.full((b,), t), mel)

        return ddpm_sample(eps_fn, sched, shape, rng, num_steps)

    return jax.jit(core)


def diffwave_sample(model: DiffWave, params, mel, rng, num_steps=None):
    """Memoized self-jitting DDPM sampling (one cached program per shape
    bucket; eager scans dispatch op-by-op through the TPU tunnel)."""
    b, n, _ = mel.shape
    return _diffwave_sample_jitted(model, b, n, num_steps)(params, mel, rng)
