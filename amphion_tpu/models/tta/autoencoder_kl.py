"""AutoencoderKL: 2-D VAE over mel spectrograms (AudioLDM stage 1),
checkpoint-compatible with the reference
(`models/tta/autoencoder/autoencoder.py` — the taming-transformers VAE):
GroupNorm32+swish ResnetBlocks with nin shortcuts, asymmetric-padded
stride-2 downsampling ((0,1) per spatial dim), nearest-2x + conv
upsampling, a num_res_blocks+1 decoder ladder, quant/post-quant 1x1 convs,
diagonal-Gaussian latent. Mel treated as an image (B, T, F, 1) in NHWC.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AutoencoderKLConfig:
    in_channels: int = 1
    base_channels: int = 128  # ref ch
    channel_mults: tuple[int, ...] = (1, 1, 2, 2, 4)  # ref ch_mult
    num_res_blocks: int = 2
    latent_channels: int = 16  # ref z_channels
    kl_weight: float = 1e-6


def _gn(x, name=None):
    return nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6,
                        name=name)(x)


class ResBlock2D(nn.Module):
    """ref autoencoder.py:85 ResnetBlock (taming: GN eps 1e-6)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.swish(_gn(x, "norm1"))
        h = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv1")(h)
        h = nn.swish(_gn(h, "norm2"))
        h = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv2")(h)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), name="nin_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    """ref autoencoder.py:49: pad (0,1) per spatial dim, stride-2 k3 conv."""

    channels: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=(2, 2),
                       padding="VALID", name="conv")(x)


class Upsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                       name="conv")(x)


class Encoder2D(nn.Module):
    """ref autoencoder.py:167 Encoder2d."""

    cfg: AutoencoderKLConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.base_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv_in")(x)
        for i, m in enumerate(c.channel_mults):
            ch = c.base_channels * m
            for j in range(c.num_res_blocks):
                h = ResBlock2D(ch, name=f"down_{i}_block_{j}")(h)
            if i != len(c.channel_mults) - 1:
                h = Downsample2D(ch, name=f"down_{i}_downsample")(h)
        h = ResBlock2D(h.shape[-1], name="mid_block_1")(h)
        h = ResBlock2D(h.shape[-1], name="mid_block_2")(h)
        h = nn.swish(_gn(h, "norm_out"))
        return nn.Conv(2 * c.latent_channels, (3, 3),
                       padding=[(1, 1), (1, 1)], name="conv_out")(h)


class Decoder2D(nn.Module):
    """ref autoencoder.py:256 Decoder2d (num_res_blocks + 1 per level)."""

    cfg: AutoencoderKLConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        n = len(c.channel_mults)
        h = nn.Conv(c.base_channels * c.channel_mults[-1], (3, 3),
                    padding=[(1, 1), (1, 1)], name="conv_in")(z)
        h = ResBlock2D(h.shape[-1], name="mid_block_1")(h)
        h = ResBlock2D(h.shape[-1], name="mid_block_2")(h)
        for i in reversed(range(n)):
            ch = c.base_channels * c.channel_mults[i]
            for j in range(c.num_res_blocks + 1):
                h = ResBlock2D(ch, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = Upsample2D(ch, name=f"up_{i}_upsample")(h)
        h = nn.swish(_gn(h, "norm_out"))
        return nn.Conv(c.in_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: AutoencoderKLConfig

    def setup(self):
        self.encoder = Encoder2D(self.cfg)
        self.decoder = Decoder2D(self.cfg)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       name="post_quant_conv")

    def encode(self, x, rng=None):
        """x (B, T, F, 1) → (z, mu, logvar)."""
        stats = self.quant_conv(self.encoder(x))
        mu, logvar = jnp.split(stats, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        if rng is not None:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        else:
            z = mu
        return z, mu, logvar

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng):
        z, mu, logvar = self.encode(x, rng)
        recon = self.decode(z)
        return recon, mu, logvar

    def loss(self, x, rng):
        recon, mu, logvar = self(x, rng)
        rec = jnp.mean(jnp.abs(recon - x))
        kl = 0.5 * jnp.mean(mu**2 + jnp.exp(logvar) - 1.0 - logvar)
        total = rec + self.cfg.kl_weight * kl
        return total, {"rec": rec, "kl": kl}
