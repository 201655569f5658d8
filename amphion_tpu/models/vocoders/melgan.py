"""MelGAN generator (reference: `models/vocoders/gan/generator/melgan.py:50`).

Transposed-conv upsampling with triple-dilated residual stacks and
leaky-ReLU, tanh output.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MelGANConfig:
    n_mel: int = 80
    upsample_rates: tuple[int, ...] = (5, 4, 3, 2)
    ngf: int = 32
    n_residual_layers: int = 3

    @property
    def hop_size(self) -> int:
        h = 1
        for r in self.upsample_rates:
            h *= r
        return h


class MelGANResnetBlock(nn.Module):
    channels: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        y = nn.leaky_relu(x, 0.2)
        y = nn.WeightNorm(
            nn.Conv(self.channels, (3,), kernel_dilation=(self.dilation,),
                    padding="SAME")
        )(y)
        y = nn.leaky_relu(y, 0.2)
        y = nn.WeightNorm(nn.Conv(self.channels, (1,)))(y)
        return x + y


class MelGANGenerator(nn.Module):
    cfg: MelGANConfig = MelGANConfig()

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        c = self.cfg
        mult = 2 ** len(c.upsample_rates)
        x = nn.WeightNorm(nn.Conv(mult * c.ngf, (7,), padding="SAME"))(mel)
        for i, r in enumerate(c.upsample_rates):
            x = nn.leaky_relu(x, 0.2)
            ch = (mult // (2 ** (i + 1))) * c.ngf
            k = 2 * r
            p = (k - r) // 2
            x = nn.WeightNorm(
                nn.ConvTranspose(ch, (k,), strides=(r,),
                                 padding=((k - 1 - p, k - 1 - (k - r - p)),))
            )(x)
            for j in range(c.n_residual_layers):
                x = MelGANResnetBlock(ch, 3**j, name=f"res_{i}_{j}")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.WeightNorm(nn.Conv(1, (7,), padding="SAME"))(x)
        return jnp.tanh(x)[..., 0]
