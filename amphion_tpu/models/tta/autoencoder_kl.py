"""AutoencoderKL: 2-D VAE over mel spectrograms (AudioLDM stage 1).

Reference: `models/tta/autoencoder/autoencoder.py` — conv encoder/decoder
with a diagonal-Gaussian latent (`modules/distributions/distributions.py:29`),
KL regularization, optionally adversarial. Mel treated as an image
(B, T, F, 1) in NHWC.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AutoencoderKLConfig:
    in_channels: int = 1
    base_channels: int = 64
    channel_mults: tuple[int, ...] = (1, 2, 4)
    latent_channels: int = 8
    kl_weight: float = 1e-6


class ResBlock2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]))(x)
        h = nn.swish(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME")(h)
        h = nn.GroupNorm(num_groups=min(32, self.channels))(h)
        h = nn.swish(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME")(h)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1))(x)
        return x + h


class Encoder2D(nn.Module):
    cfg: AutoencoderKLConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.base_channels, (3, 3), padding="SAME")(x)
        for i, m in enumerate(c.channel_mults):
            ch = c.base_channels * m
            h = ResBlock2D(ch, name=f"res_{i}a")(h)
            h = ResBlock2D(ch, name=f"res_{i}b")(h)
            if i < len(c.channel_mults) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                            name=f"down_{i}")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]))(h)
        h = nn.swish(h)
        return nn.Conv(2 * c.latent_channels, (3, 3), padding="SAME")(h)


class Decoder2D(nn.Module):
    cfg: AutoencoderKLConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        mults = tuple(reversed(c.channel_mults))
        h = nn.Conv(c.base_channels * mults[0], (3, 3), padding="SAME")(z)
        for i, m in enumerate(mults):
            ch = c.base_channels * m
            h = ResBlock2D(ch, name=f"res_{i}a")(h)
            h = ResBlock2D(ch, name=f"res_{i}b")(h)
            if i < len(mults) - 1:
                b, t, f, cc = h.shape
                h = jax.image.resize(h, (b, t * 2, f * 2, cc), "nearest")
                h = nn.Conv(ch, (3, 3), padding="SAME", name=f"up_{i}")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]))(h)
        h = nn.swish(h)
        return nn.Conv(c.in_channels, (3, 3), padding="SAME")(h)


class AutoencoderKL(nn.Module):
    cfg: AutoencoderKLConfig

    def setup(self):
        self.encoder = Encoder2D(self.cfg)
        self.decoder = Decoder2D(self.cfg)

    def encode(self, x, rng=None):
        """x (B, T, F, 1) → (z, mu, logvar)."""
        stats = self.encoder(x)
        mu, logvar = jnp.split(stats, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        if rng is not None:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        else:
            z = mu
        return z, mu, logvar

    def decode(self, z):
        return self.decoder(z)

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
