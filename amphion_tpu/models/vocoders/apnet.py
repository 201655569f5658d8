"""APNet: amplitude + phase parallel prediction with an iSTFT head.

Checkpoint-compatible with the reference
(`models/vocoders/gan/generator/apnet.py:280`): two HiFiGAN-style dilated
resblock branches predict log-amplitude (ASP) and wrapped phase (PSP —
parallel (R, I) heads atan2-combined), then the custom "same"-padding iSTFT
(`apnet.py:16-107`, identical math to `amphion_tpu/ops/stft.istft(
padding="same")`) reconstructs the waveform.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.vocoders.hifigan import ResBlock1
from amphion_tpu.ops.stft import istft

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class APNetConfig:
    n_mel: int = 80
    channels: int = 512  # ASP_channel == PSP_channel in the reference cfgs
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    input_conv_kernel: int = 7
    output_conv_kernel: int = 7
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024

    # back-compat alias used by older configs/tests
    num_layers: int | None = None

    def __post_init__(self):
        if self.num_layers == 1:  # tiny test configs: one resblock
            object.__setattr__(self, "resblock_kernel_sizes", (3,))
            object.__setattr__(self, "resblock_dilation_sizes", ((1, 3, 5),))


def _wn_conv(feats, k, name):
    return nn.WeightNorm(nn.Conv(feats, (k,), padding="SAME", name=name))


class APNetGenerator(nn.Module):
    cfg: APNetConfig = field(default_factory=APNetConfig)

    @nn.compact
    def __call__(self, mel: jax.Array, return_features: bool = False):
        """mel (B, N, n_mel) → waveform (B, N*hop); with
        ``return_features`` also (logamp, phase, real, imag) for the APNet
        amplitude/phase/consistency losses (ref gan_vocoder_trainer)."""
        c = self.cfg
        f = c.n_fft // 2 + 1

        def branch(tag, x):
            h = _wn_conv(c.channels, c.input_conv_kernel,
                         f"{tag}_input_conv")(x)
            acc = None
            for ks, ds in zip(c.resblock_kernel_sizes,
                              c.resblock_dilation_sizes):
                out = ResBlock1(c.channels, ks, tuple(ds),
                                name=f"{tag}_res_{ks}")(h)
                acc = out if acc is None else acc + out
            h = acc / len(c.resblock_kernel_sizes)
            # ref apnet.py:373,387: final F.leaky_relu default slope 0.01
            return nn.leaky_relu(h, 0.01)

        a = branch("asp", mel)
        logamp = _wn_conv(f, c.output_conv_kernel, "asp_output_conv")(a)

        p = branch("psp", mel)
        r = _wn_conv(f, c.output_conv_kernel, "psp_output_r_conv")(p)
        i = _wn_conv(f, c.output_conv_kernel, "psp_output_i_conv")(p)
        phase = jnp.arctan2(i, r)

        amp = jnp.exp(logamp)
        real = jnp.transpose(amp * jnp.cos(phase), (0, 2, 1))  # (B, F, N)
        imag = jnp.transpose(amp * jnp.sin(phase), (0, 2, 1))
        audio = istft(real, imag, c.n_fft, c.hop_size, c.win_size,
                      padding="same")
        if return_features:
            return audio, (logamp, phase, real, imag)
        return audio
