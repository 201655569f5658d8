"""APNet: amplitude + phase parallel prediction with an iSTFT head.

Reference: `models/vocoders/gan/generator/apnet.py:280` — two conv branches
predict log-amplitude and wrapped phase (via the parallel-estimation
architecture: two heads atan2-combined), then inverse STFT reconstructs the
waveform. Phase is produced with the (real, imag) parameterization so it is
intrinsically wrapped.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.ops.stft import istft


@dataclass(frozen=True)
class APNetConfig:
    n_mel: int = 80
    channels: int = 512
    num_layers: int = 8
    n_fft: int = 1024
    hop_size: int = 256


class _ConvStack(nn.Module):
    channels: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (7,), padding="SAME")(x)
        for i in range(self.num_layers):
            y = nn.LayerNorm()(x)
            y = nn.Conv(self.channels, (5,), padding="SAME")(y)
            y = jax.nn.gelu(y)
            y = nn.Conv(self.channels, (1,))(y)
            x = x + y
        return x


class APNetGenerator(nn.Module):
    cfg: APNetConfig = APNetConfig()

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        c = self.cfg
        f = c.n_fft // 2 + 1
        # amplitude branch
        a = _ConvStack(c.channels, c.num_layers, name="amp_stack")(mel)
        log_amp = nn.Dense(f, name="amp_out")(a)
        # phase branch: predict (real, imag) then atan2 → wrapped phase
        p = _ConvStack(c.channels, c.num_layers, name="phase_stack")(mel)
        pr = nn.Dense(f, name="phase_r")(p)
        pi = nn.Dense(f, name="phase_i")(p)
        phase = jnp.arctan2(pi, pr)
        amp = jnp.exp(jnp.clip(log_amp, -10.0, 8.0))
        real = jnp.transpose(amp * jnp.cos(phase), (0, 2, 1))
        imag = jnp.transpose(amp * jnp.sin(phase), (0, 2, 1))
        n = mel.shape[1]
        return istft(real, imag, c.n_fft, c.hop_size, c.n_fft, length=n * c.hop_size)
