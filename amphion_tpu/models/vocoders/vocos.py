"""Vocos: ConvNeXt backbone + iSTFT head vocoder.

Same capability as the reference (reference: `models/vocoders/vocos/vocos.py`,
step-based GAN trainer `vocos_trainer.py`): mel → ConvNeXt stack → complex
spectrogram (magnitude + phase) → inverse STFT. No transposed-conv
upsampling at all — the hop-length upsampling happens inside the iSTFT
overlap-add, which makes this the cheapest high-quality vocoder per sample
and a natural fit for the fused TPU iSTFT (`amphion_tpu/ops/stft.py`).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.ops.stft import istft


@dataclass(frozen=True)
class VocosConfig:
    n_mel: int = 80
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_size: int = 256


class ConvNeXtBlock(nn.Module):
    dim: int
    intermediate_dim: int
    layer_scale: float = 1e-6

    @nn.compact
    def __call__(self, x, mask=None):
        # mask (B, T, 1): zero padded positions BEFORE the depthwise conv so
        # a ragged batch sees the same zero boundary as an unpadded decode
        # (biases repopulate the pad region each block; see VocosGenerator).
        if mask is not None:
            x = x * mask
        y = nn.Conv(self.dim, (7,), padding="SAME", feature_group_count=self.dim)(x)
        y = nn.LayerNorm(epsilon=1e-6)(y)
        y = nn.Dense(self.intermediate_dim)(y)
        y = jax.nn.gelu(y, approximate=False)  # torch nn.GELU() is exact
        y = nn.Dense(self.dim)(y)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale), (self.dim,)
        )
        return x + gamma * y


class VocosGenerator(nn.Module):
    cfg: VocosConfig

    @nn.compact
    def __call__(self, mel: jax.Array,
                 frame_lengths: jax.Array | None = None) -> jax.Array:
        """mel (B, N, n_mel) → waveform (B, N * hop).

        ``frame_lengths`` (B,) makes a padded ragged batch exact: each
        spatial op (embed conv, depthwise ConvNeXt convs, iSTFT
        overlap-add + window normalization) sees zeros beyond the row's
        valid length — the same boundary condition an unpadded solo decode
        of that row gets from SAME padding — so
        ``out[i, :frame_lengths[i]*hop]`` matches the solo decode instead
        of bleeding pad content through the conv/iSTFT receptive field.
        """
        c = self.cfg
        mask = None
        if frame_lengths is not None:
            mask = (jnp.arange(mel.shape[1])[None, :]
                    < frame_lengths[:, None]).astype(mel.dtype)[:, :, None]
            mel = mel * mask
        x = nn.Conv(c.dim, (7,), padding="SAME", name="embed")(mel)
        x = nn.LayerNorm(name="norm_pre")(x)
        for i in range(c.num_layers):
            x = ConvNeXtBlock(c.dim, c.intermediate_dim, name=f"block_{i}")(
                x, mask)
        x = nn.LayerNorm(name="norm_post")(x)
        f = c.n_fft // 2 + 1
        head = nn.Dense(2 * f, name="head")(x)  # (B, N, 2F)
        mag, phase = jnp.split(head, 2, axis=-1)
        # log-magnitude head, clipped at 1e2 like the reference ISTFTHead
        # (ref amphion_codec/vocos.py:347-350)
        mag = jnp.minimum(jnp.exp(mag), 1e2)
        real = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
        # (B, N, F) → (B, F, N)
        real = jnp.transpose(real, (0, 2, 1))
        imag = jnp.transpose(imag, (0, 2, 1))
        n = mel.shape[1]
        return istft(real, imag, c.n_fft, c.hop_size, c.n_fft,
                     length=n * c.hop_size, padding="same",
                     frame_lengths=frame_lengths)


class VocosBackbone(nn.Module):
    """Standalone ConvNeXt backbone (ref amphion_codec/vocos.py:720
    VocosBackbone): embed conv → LayerNorm → N ConvNeXt blocks → LayerNorm.
    Same scope names as VocosGenerator's trunk so torch_vocos_to_flax's
    backbone mapping applies; used by the reference-parity RepCodec."""

    dim: int
    intermediate_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        """(B, T, C_in) → (B, T, dim)."""
        x = nn.Conv(self.dim, (7,), padding="SAME", name="embed")(x)
        x = nn.LayerNorm(name="norm_pre")(x)
        for i in range(self.num_layers):
            x = ConvNeXtBlock(self.dim, self.intermediate_dim,
                              name=f"block_{i}")(x)
        return nn.LayerNorm(name="norm_post")(x)
