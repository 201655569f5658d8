"""NSF-HiFiGAN: HiFi-GAN with a harmonic neural-source-filter excitation.

Reference: `models/vocoders/gan/generator/nsfhifigan.py:181` — a HiFi-GAN
upsampling stack that injects a sine-harmonic excitation (from
`SourceModuleHnNSF:162`) at each resolution via strided source convs
(``noise_convs``: kernel ``2*stride_f0``, stride ``stride_f0`` where
``stride_f0 = prod(upsample_rates[i+1:])``; kernel 1 at full rate).
Essential for SVC where the F0 contour is an explicit control signal.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig, ResBlock1, ResBlock2
from amphion_tpu.modules.nsf import SourceModuleHnNSF, upsample_f0

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class NSFHiFiGANConfig:
    base: HiFiGANConfig = field(default_factory=HiFiGANConfig)
    sample_rate: int = 24000
    num_harmonics: int = 7
    # The reference forward (nsfhifigan.py:266-270) computes the per-scale
    # source convs but then overwrites `x_source = x[...]` — a bug that
    # silently discards the excitation and doubles x at every scale.
    # Checkpoints trained with the reference carry those semantics, so
    # `reference_forward=True` reproduces them exactly (for converted
    # weights); the default actually injects the excitation.
    reference_forward: bool = False


class NSFHiFiGANGenerator(nn.Module):
    cfg: NSFHiFiGANConfig = field(default_factory=NSFHiFiGANConfig)

    @nn.compact
    def __call__(self, mel: jax.Array, f0: jax.Array, rng: jax.Array) -> jax.Array:
        """mel (B, N, n_mel), f0 (B, N) frame-rate Hz → (B, N*hop)."""
        c = self.cfg.base
        upp = int(math.prod(c.upsample_rates))  # ref `self.upp`
        resblock_cls = ResBlock1 if c.resblock == "1" else ResBlock2
        num_ups = len(c.upsample_rates)

        f0_up = upsample_f0(f0, upp)  # (B, N*upp)
        excitation, _ = SourceModuleHnNSF(
            self.cfg.sample_rate, self.cfg.num_harmonics, name="source"
        )(f0_up, rng)  # (B, N*upp, 1)

        x = nn.WeightNorm(nn.Conv(c.upsample_initial_channel, (7,), padding="SAME"))(mel)
        for i, (rate, kernel) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            p = (kernel - rate) // 2
            x = nn.WeightNorm(
                nn.ConvTranspose(
                    ch, (kernel,), strides=(rate,),
                    padding=((kernel - 1 - p, kernel - 1 - (kernel - rate - p)),),
                )
            )(x)
            # strided source conv bringing the full-rate excitation down to
            # this scale (ref noise_convs, nsfhifigan.py:229-240)
            stride_f0 = int(math.prod(c.upsample_rates[i + 1:]))
            if i + 1 < num_ups:
                exc_i = nn.Conv(
                    ch, (stride_f0 * 2,), strides=(stride_f0,),
                    padding=((stride_f0 // 2, stride_f0 // 2),),
                    name=f"noise_conv_{i}",
                )(excitation)
            else:
                exc_i = nn.Conv(ch, (1,), name=f"noise_conv_{i}")(excitation)
            n = min(x.shape[1], exc_i.shape[1])
            if self.cfg.reference_forward:
                x = x[:, :n] * 2.0  # ref bug: x_source overwritten by x
            else:
                x = x[:, :n] + exc_i[:, :n]
            acc = None
            for ks, ds in zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes):
                out = resblock_cls(ch, ks, tuple(ds), name=f"res_{i}_{ks}")(x)
                acc = out if acc is None else acc + out
            x = acc / len(c.resblock_kernel_sizes)
        # ref nsfhifigan.py:278: final F.leaky_relu default slope 0.01
        x = nn.leaky_relu(x, 0.01)
        x = nn.WeightNorm(nn.Conv(1, (7,), padding="SAME"))(x)
        return jnp.tanh(x)[..., 0]
