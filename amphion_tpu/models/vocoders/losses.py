"""GAN vocoder criteria (reference: `models/vocoders/gan/gan_vocoder_trainer.py:242-530`).

LSGAN adversarial losses + feature matching + mel reconstruction, written as
pure functions over (logits, feature-map) lists so they fuse into the jitted
train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from amphion_tpu.ops.mel import MelConfig, mel_spectrogram


def feature_loss(fmaps_real, fmaps_fake) -> jax.Array:
    """2 * sum of L1 distances over all feature maps (HiFi-GAN convention)."""
    loss = 0.0
    for fmr, fmf in zip(fmaps_real, fmaps_fake):
        for r, f in zip(fmr, fmf):
            loss = loss + jnp.mean(jnp.abs(r - f))
    return 2.0 * loss


def discriminator_loss(logits_real, logits_fake) -> tuple[jax.Array, list, list]:
    """LSGAN D loss: mean((1-D(x))^2) + mean(D(G(z))^2) per sub-D."""
    loss = 0.0
    r_losses, f_losses = [], []
    for dr, df in zip(logits_real, logits_fake):
        r = jnp.mean((1.0 - dr) ** 2)
        f = jnp.mean(df**2)
        loss = loss + r + f
        r_losses.append(r)
        f_losses.append(f)
    return loss, r_losses, f_losses


def generator_adv_loss(logits_fake) -> jax.Array:
    """LSGAN G loss: mean((1-D(G(z)))^2) per sub-D."""
    loss = 0.0
    for df in logits_fake:
        loss = loss + jnp.mean((1.0 - df) ** 2)
    return loss


def mel_loss(audio_real: jax.Array, audio_fake: jax.Array, cfg: MelConfig,
             weight: float = 45.0) -> jax.Array:
    """L1 log-mel reconstruction loss, weight 45 (HiFi-GAN convention)."""
    mel_r = mel_spectrogram(audio_real, cfg)
    mel_f = mel_spectrogram(audio_fake, cfg)
    return weight * jnp.mean(jnp.abs(mel_r - mel_f))
