"""HiFi-GAN generator, TPU-native.

Same architecture family as the reference generator (reference:
`models/vocoders/gan/generator/hifigan.py:17-231` — conv_pre, transposed-conv
upsampling stack, multi-receptive-field fusion of dilated ResBlocks, conv_post
+ tanh), re-designed for TPU:

- NLC (batch, time, channel) layout throughout so every conv lowers to an MXU
  matmul over the channel dim without transposes;
- weight normalization via `flax.linen.WeightNorm` (the reference applies /
  removes torch weight_norm in-place);
- pure functional module — inference is `jit(model.apply)` and training
  composes into a single jitted GAN step.

Default hyperparameters are the classic V1 config adapted to the project's
24 kHz / hop-120 front end (upsample 5*4*3*2 = 120).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class HiFiGANConfig:
    resblock: str = "1"  # "1" (V1/V2) or "2" (V3)
    upsample_rates: tuple[int, ...] = (5, 4, 3, 2)
    upsample_kernel_sizes: tuple[int, ...] = (10, 8, 6, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    n_mel: int = 80

    @classmethod
    def from_model_cfg(cls, m, n_mel: int = 80) -> "HiFiGANConfig":
        """Build from a reference-style ``cfg.model.hifigan`` block."""
        return cls(
            resblock=str(m.resblock),
            upsample_rates=tuple(m.upsample_rates),
            upsample_kernel_sizes=tuple(m.upsample_kernel_sizes),
            upsample_initial_channel=m.upsample_initial_channel,
            resblock_kernel_sizes=tuple(m.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(tuple(d) for d in m.resblock_dilation_sizes),
            n_mel=n_mel,
        )

    @property
    def hop_size(self) -> int:
        h = 1
        for r in self.upsample_rates:
            h *= r
        return h


def wn_conv(features: int, kernel_size: int, dilation: int = 1, name: str | None = None):
    """Weight-normalized 1-D conv, 'SAME' padding (odd kernels), NLC layout."""
    return nn.WeightNorm(
        nn.Conv(
            features,
            kernel_size=(kernel_size,),
            kernel_dilation=(dilation,),
            padding="SAME",
        ),
        name=name,
    )


class ResBlock1(nn.Module):
    """V1/V2 residual block: pairs of (dilated, undilated) convs (ref :17-107)."""

    channels: int
    kernel_size: int = 3
    dilation: tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for d in self.dilation:
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = wn_conv(self.channels, self.kernel_size, d)(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = wn_conv(self.channels, self.kernel_size, 1)(xt)
            x = x + xt
        return x


class ResBlock2(nn.Module):
    """V3 residual block: single dilated conv per branch (ref :109-149)."""

    channels: int
    kernel_size: int = 3
    dilation: tuple[int, ...] = (1, 3)

    @nn.compact
    def __call__(self, x):
        for d in self.dilation:
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = wn_conv(self.channels, self.kernel_size, d)(xt)
            x = x + xt
        return x


class HiFiGANGenerator(nn.Module):
    """mel/latent (B, N, n_mel) → waveform (B, N * hop) in [-1, 1].

    ``g`` is optional global conditioning (B, 1, G) — used when this stack is
    the VITS speaker-conditioned decoder (ref `hifigan.py:376` HiFiGAN_vits).
    """

    cfg: HiFiGANConfig = field(default_factory=HiFiGANConfig)

    @nn.compact
    def __call__(self, mel: jax.Array, g: jax.Array | None = None) -> jax.Array:
        c = self.cfg
        resblock_cls = ResBlock1 if c.resblock == "1" else ResBlock2
        x = nn.WeightNorm(nn.Conv(c.upsample_initial_channel, (7,), padding="SAME"))(mel)
        if g is not None:
            x = x + nn.Dense(c.upsample_initial_channel, name="cond")(g)
        for i, (rate, kernel) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            # torch ConvTranspose1d(stride=s, padding=p=(k-s)//2) → output T*s.
            # flax custom padding (a, b) gives out = (T-1)*s + a + b - k + 2,
            # so the torch-equivalent is a = b = k - 1 - p.
            p = (kernel - rate) // 2
            x = nn.WeightNorm(
                nn.ConvTranspose(
                    ch,
                    kernel_size=(kernel,),
                    strides=(rate,),
                    padding=((kernel - 1 - p, kernel - 1 - (kernel - rate - p)),),
                )
            )(x)
            acc = None
            for ks, ds in zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes):
                out = resblock_cls(ch, ks, tuple(ds))(x)
                acc = out if acc is None else acc + out
            x = acc / len(c.resblock_kernel_sizes)
        # the reference's final activation is F.leaky_relu's default 0.01
        # slope, not LRELU_SLOPE (ref hifigan.py:215)
        x = nn.leaky_relu(x, 0.01)
        x = nn.WeightNorm(nn.Conv(1, (7,), padding="SAME"))(x)
        return jnp.tanh(x)[..., 0]
