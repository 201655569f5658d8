"""RepCodec: semantic codec over SSL features.

Same capability as the reference semantic codec (reference:
`models/codec/kmeans/repcodec_model.py:34` — quantizes w2v-bert-2.0 hidden
features into semantic tokens for MaskGCT, reconstructing the features for
training; also the Vevo VQ-VAE content(-style) tokenizers
`models/codec/vevo/vevo_repcodec.py:526` at vocab 32 / 8192). Conv residual
encoder → single VQ (or FVQ) → conv residual decoder, all NLC.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.quantize import FactorizedVectorQuantize, VectorQuantize


@dataclass(frozen=True)
class RepCodecConfig:
    feature_dim: int = 1024  # SSL feature dim (w2v-bert-2.0 / HuBERT-large)
    hidden: int = 384
    codebook_size: int = 8192
    codebook_dim: int = 8
    num_blocks: int = 4
    use_fvq: bool = True


class ConvBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm()(x)
        y = nn.Conv(self.channels, (5,), padding="SAME")(y)
        y = jax.nn.gelu(y)
        y = nn.Conv(self.channels, (1,))(y)
        return x + y


class RepCodec(nn.Module):
    cfg: RepCodecConfig

    def setup(self):
        c = self.cfg
        self.in_proj = nn.Dense(c.hidden)
        self.enc_blocks = [ConvBlock(c.hidden, name=f"enc_{i}") for i in range(c.num_blocks)]
        if c.use_fvq:
            self.quantizer = FactorizedVectorQuantize(
                c.codebook_size, c.codebook_dim, c.hidden
            )
        else:
            self.quantizer = VectorQuantize(c.codebook_size, c.hidden)
        self.dec_blocks = [ConvBlock(c.hidden, name=f"dec_{i}") for i in range(c.num_blocks)]
        self.out_proj = nn.Dense(c.feature_dim)

    def _encode_latent(self, feats):
        h = self.in_proj(feats)
        for blk in self.enc_blocks:
            h = blk(h)
        return h

    def __call__(self, feats):
        """feats (B, T, feature_dim) → (recon, tokens (B, T), losses)."""
        h = self._encode_latent(feats)
        zq, tokens, vq_losses = self.quantizer(h)
        y = zq
        for blk in self.dec_blocks:
            y = blk(y)
        recon = self.out_proj(y)
        recon_loss = jnp.mean((recon - feats) ** 2)
        return recon, tokens, {**vq_losses, "recon": recon_loss}

    def encode(self, feats):
        """feats → semantic tokens (B, T)."""
        return self.quantizer.encode(self._encode_latent(feats))

    def decode_tokens(self, tokens):
        """tokens (B, T) → quantized latent (B, T, hidden)."""
        return self.quantizer.decode(tokens)
