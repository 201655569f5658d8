"""NSF-HiFiGAN: HiFi-GAN with a harmonic neural-source-filter excitation.

Reference: `models/vocoders/gan/generator/nsfhifigan.py:181` — a HiFi-GAN
upsampling stack that injects a sine-harmonic excitation (from
`SourceModuleHnNSF:162`) at each resolution via strided source convs.
Essential for SVC where the F0 contour is an explicit control signal.
"""

from __future__ import annotations

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


class NSFHiFiGANGenerator(nn.Module):
    cfg: NSFHiFiGANConfig = field(default_factory=NSFHiFiGANConfig)

    @nn.compact
    def __call__(self, mel: jax.Array, f0: jax.Array, rng: jax.Array) -> jax.Array:
        """mel (B, N, n_mel), f0 (B, N) frame-rate Hz → (B, N*hop).

        NOTE the reference forward (nsfhifigan.py:259-270) computes the
        per-scale source convs but then overwrites `x_source = x[...]`
        (a bug), so its excitation is silently discarded; here the
        harmonic excitation is actually injected at each resolution."""
        c = self.cfg.base
        hop = c.hop_size
        resblock_cls = ResBlock1 if c.resblock == "1" else ResBlock2

        f0_up = upsample_f0(f0, hop)  # (B, N*hop)
        excitation, _ = SourceModuleHnNSF(
            self.cfg.sample_rate, self.cfg.num_harmonics, name="source"
        )(f0_up, rng)  # (B, N*hop, 1)

        x = nn.WeightNorm(nn.Conv(c.upsample_initial_channel, (7,), padding="SAME"))(mel)
        cum_rate = hop
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
            # downsample the excitation to this resolution and inject
            cum_rate = cum_rate // rate
            exc_i = nn.Conv(
                ch, (cum_rate * 2 + 1,), strides=(max(cum_rate, 1),), padding="SAME",
                name=f"source_down_{i}",
            )(excitation)
            x = x + exc_i[:, : x.shape[1]]
            acc = None
            for ks, ds in zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes):
                out = resblock_cls(ch, ks, tuple(ds), name=f"res_{i}_{ks}")(x)
                acc = out if acc is None else acc + out
            x = acc / len(c.resblock_kernel_sizes)
        # ref nsfhifigan.py:278: final F.leaky_relu default slope 0.01
        x = nn.leaky_relu(x, 0.01)
        x = nn.WeightNorm(nn.Conv(1, (7,), padding="SAME"))(x)
        return jnp.tanh(x)[..., 0]
