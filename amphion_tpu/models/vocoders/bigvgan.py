"""BigVGAN: anti-aliased periodic-activation GAN vocoder.

Reference: `models/vocoders/gan/generator/bigvgan.py:232` — HiFi-GAN topology
with AMP blocks: Snake/SnakeBeta activations wrapped in anti-aliased
up/down-sampling (`modules/anti_aliasing/`). Built on the TPU module library
(`amphion_tpu/modules/{activations,anti_aliasing}.py`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.activations import Snake, SnakeBeta
from amphion_tpu.modules.anti_aliasing import Activation1d


@dataclass(frozen=True)
class BigVGANConfig:
    n_mel: int = 80
    upsample_rates: tuple[int, ...] = (5, 4, 3, 2)
    upsample_kernel_sizes: tuple[int, ...] = (10, 8, 6, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    activation: str = "snakebeta"  # "snake" | "snakebeta"
    snake_logscale: bool = True  # ref cfg.model.bigvgan.snake_logscale
    use_pallas_act: bool = False  # fused AA-activation Pallas kernel (TPU)

    @property
    def hop_size(self) -> int:
        h = 1
        for r in self.upsample_rates:
            h *= r
        return h


class AMPBlock(nn.Module):
    """Dilated conv resblock with anti-aliased Snake activations
    (ref `bigvgan.py:33-150`)."""

    channels: int
    kernel_size: int
    dilations: tuple[int, ...]
    activation: str
    logscale: bool = True
    use_pallas: bool = False

    def _act(self, name):
        act_cls = SnakeBeta if self.activation == "snakebeta" else Snake
        return Activation1d(
            act_cls(self.channels, alpha_logscale=self.logscale),
            name=name, use_pallas=self.use_pallas)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            y = self._act(f"act1_{i}")(x)
            y = nn.WeightNorm(
                nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(d,),
                        padding="SAME")
            )(y)
            y = self._act(f"act2_{i}")(y)
            y = nn.WeightNorm(
                nn.Conv(self.channels, (self.kernel_size,), padding="SAME")
            )(y)
            x = x + y
        return x


class BigVGANGenerator(nn.Module):
    cfg: BigVGANConfig = field(default_factory=BigVGANConfig)

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        c = self.cfg
        x = nn.WeightNorm(nn.Conv(c.upsample_initial_channel, (7,), padding="SAME"))(mel)
        for i, (rate, kernel) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            p = (kernel - rate) // 2
            x = nn.WeightNorm(
                nn.ConvTranspose(
                    ch, (kernel,), strides=(rate,),
                    padding=((kernel - 1 - p, kernel - 1 - (kernel - rate - p)),),
                )
            )(x)
            acc = None
            for ks, ds in zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes):
                out = AMPBlock(ch, ks, tuple(ds), c.activation,
                               logscale=c.snake_logscale,
                               use_pallas=c.use_pallas_act,
                               name=f"amp_{i}_{ks}")(x)
                acc = out if acc is None else acc + out
            x = acc / len(c.resblock_kernel_sizes)
        act_cls = SnakeBeta if c.activation == "snakebeta" else Snake
        x = Activation1d(act_cls(x.shape[-1], alpha_logscale=c.snake_logscale),
                         name="final_act", use_pallas=c.use_pallas_act)(x)
        x = nn.WeightNorm(nn.Conv(1, (7,), padding="SAME"))(x)
        return jnp.tanh(x)[..., 0]
