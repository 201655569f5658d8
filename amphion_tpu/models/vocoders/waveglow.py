"""WaveGlow: flow-based vocoder (reference: `models/vocoders/flow/waveglow/
waveglow.py`).

Squeeze waveform into groups, alternate invertible 1x1 convolutions with
WN-conditioned affine couplings; training maximizes exact likelihood,
inference runs the flows in reverse from Gaussian noise.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.flows import WN


@dataclass(frozen=True)
class WaveGlowConfig:
    n_mel: int = 80
    hop_size: int = 256
    n_group: int = 8
    n_flows: int = 6
    wn_channels: int = 128
    wn_layers: int = 4


class Invertible1x1(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, reverse=False):
        # orthogonal init keeps |det| = 1 initially
        w = self.param("w", nn.initializers.orthogonal(), (self.channels, self.channels))
        if reverse:
            return x @ jnp.linalg.inv(w)
        logdet = x.shape[1] * jnp.linalg.slogdet(w)[1]
        return x @ w, logdet


class WaveGlow(nn.Module):
    cfg: WaveGlowConfig

    def setup(self):
        c = self.cfg
        self.convs = [Invertible1x1(c.n_group, name=f"inv_{i}") for i in range(c.n_flows)]
        self.wns = [
            WN(c.wn_channels, 3, 1, c.wn_layers, gin_channels=c.n_mel * c.n_group,
               name=f"wn_{i}")
            for i in range(c.n_flows)
        ]
        self.starts = [nn.Dense(self.cfg.wn_channels, name=f"start_{i}") for i in range(c.n_flows)]
        self.ends = [
            nn.Dense(c.n_group, name=f"end_{i}", kernel_init=nn.initializers.zeros)
            for i in range(c.n_flows)
        ]

    def _cond(self, mel, t_groups):
        c = self.cfg
        cond = jnp.repeat(mel, c.hop_size, axis=1)
        cond = cond[:, : t_groups * c.n_group]
        return cond.reshape(cond.shape[0], t_groups, c.n_group * c.n_mel)

    def forward(self, audio, mel):
        """audio (B, T) → (z, logdet_total); T divisible by n_group*... ."""
        c = self.cfg
        b, t = audio.shape
        tg = t // c.n_group
        x = audio[:, : tg * c.n_group].reshape(b, tg, c.n_group)
        cond = self._cond(mel, tg)
        logdet_total = 0.0
        for i in range(c.n_flows):
            x, ld = self.convs[i](x)
            logdet_total = logdet_total + ld
            half = c.n_group // 2
            xa, xb = x[..., :half], x[..., half:]
            h = self.starts[i](jnp.concatenate([xa, jnp.zeros_like(xb)], -1))
            h = self.wns[i](h, g=cond)
            stats = self.ends[i](h)
            logs, m = stats[..., :half], stats[..., half:]
            xb = xb * jnp.exp(logs) + m
            logdet_total = logdet_total + jnp.sum(logs, axis=(1, 2))
            x = jnp.concatenate([xa, xb], axis=-1)
        return x, logdet_total

    def loss(self, audio, mel, sigma: float = 1.0):
        z, logdet = self.forward(audio, mel)
        ll = -jnp.sum(z**2, axis=(1, 2)) / (2 * sigma**2) + logdet
        return -jnp.mean(ll) / (z.shape[1] * z.shape[2])

    def infer(self, mel, rng, sigma: float = 0.8):
        c = self.cfg
        b, n, _ = mel.shape
        tg = n * c.hop_size // c.n_group
        x = jax.random.normal(rng, (b, tg, c.n_group)) * sigma
        cond = self._cond(mel, tg)
        for i in reversed(range(c.n_flows)):
            half = c.n_group // 2
            xa, xb = x[..., :half], x[..., half:]
            h = self.starts[i](jnp.concatenate([xa, jnp.zeros_like(xb)], -1))
            h = self.wns[i](h, g=cond)
            stats = self.ends[i](h)
            logs, m = stats[..., :half], stats[..., half:]
            xb = (xb - m) * jnp.exp(-logs)
            x = jnp.concatenate([xa, xb], axis=-1)
            x = self.convs[i](x, reverse=True)
        return x.reshape(b, -1)
