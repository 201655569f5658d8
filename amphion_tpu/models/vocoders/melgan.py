"""MelGAN generator (reference: `models/vocoders/gan/generator/melgan.py:50`).

Transposed-conv upsampling with triple-dilated residual stacks (each with a
learned 1x1 shortcut conv, ref melgan.py:34-47), REFLECTION padding on the
k7/k3 convs, leaky-ReLU 0.2, tanh output.
"""

from __future__ import annotations

from dataclasses import dataclass, field

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


def _reflect(x: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class MelGANResnetBlock(nn.Module):
    """LeakyReLU → reflect-pad dilated k3 → LeakyReLU → k1, plus a learned
    1x1 shortcut (ref melgan.py:34-47)."""

    channels: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        y = nn.leaky_relu(x, 0.2)
        y = _reflect(y, self.dilation)
        y = nn.WeightNorm(
            nn.Conv(self.channels, (3,), kernel_dilation=(self.dilation,),
                    padding="VALID", name="conv1")
        )(y)
        y = nn.leaky_relu(y, 0.2)
        y = nn.WeightNorm(nn.Conv(self.channels, (1,), name="conv2"))(y)
        sc = nn.WeightNorm(nn.Conv(self.channels, (1,), name="shortcut"))(x)
        return sc + y


class MelGANGenerator(nn.Module):
    cfg: MelGANConfig = field(default_factory=MelGANConfig)

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        c = self.cfg
        mult = 2 ** len(c.upsample_rates)
        x = nn.WeightNorm(nn.Conv(mult * c.ngf, (7,), padding="VALID",
                                  name="conv_pre"))(_reflect(mel, 3))
        for i, r in enumerate(c.upsample_rates):
            x = nn.leaky_relu(x, 0.2)
            ch = (mult // (2 ** (i + 1))) * c.ngf
            k = 2 * r
            # torch p = r//2 + r%2, output_padding = r%2 (odd-stride aware)
            p = r // 2 + r % 2
            x = nn.WeightNorm(
                nn.ConvTranspose(ch, (k,), strides=(r,),
                                 padding=((k - 1 - p, k - 1 - r // 2),),
                                 name=f"up_{i}")
            )(x)
            for j in range(c.n_residual_layers):
                x = MelGANResnetBlock(ch, 3**j, name=f"res_{i}_{j}")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.WeightNorm(nn.Conv(1, (7,), padding="VALID",
                                  name="conv_post"))(_reflect(x, 3))
        return jnp.tanh(x)[..., 0]
