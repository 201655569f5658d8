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
    # "conv": compact conv-residual blocks (self-contained default);
    # "vocos": the reference architecture exactly — ConvNeXt VocosBackbone
    # encoder/decoder at feature_dim with Linear heads and an RVQ
    # (ref repcodec_model.py:106-139) — for converted MaskGCT checkpoints
    style: str = "conv"
    vocos_intermediate_dim: int = 2048  # ref vocos_intermediate_dim
    num_quantizers: int = 1  # ref RVQ depth (vocos style)


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
        if c.style == "vocos":
            from amphion_tpu.models.vocoders.vocos import VocosBackbone
            from amphion_tpu.modules.quantize import ResidualVQ

            # reference layout exactly (repcodec_model.py:106-139): the
            # backbone runs at feature_dim; hidden = the vocos trunk width
            self.enc_backbone = VocosBackbone(
                c.hidden, c.vocos_intermediate_dim, c.num_blocks,
                name="enc_backbone")
            self.enc_out = nn.Dense(c.feature_dim, name="enc_out")
            self.quantizer = ResidualVQ(
                num_quantizers=c.num_quantizers,
                codebook_size=c.codebook_size, codebook_dim=c.codebook_dim,
                input_dim=c.feature_dim, quantizer_type="fvq", dropout=False,
            )
            self.dec_backbone = VocosBackbone(
                c.hidden, c.vocos_intermediate_dim, c.num_blocks,
                name="dec_backbone")
            self.dec_out = nn.Dense(c.feature_dim, name="dec_out")
            return
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
        if self.cfg.style == "vocos":
            return self.enc_out(self.enc_backbone(feats))
        h = self.in_proj(feats)
        for blk in self.enc_blocks:
            h = blk(h)
        return h

    def _decode_latent(self, zq):
        if self.cfg.style == "vocos":
            return self.dec_out(self.dec_backbone(zq))
        y = zq
        for blk in self.dec_blocks:
            y = blk(y)
        return self.out_proj(y)

    def __call__(self, feats):
        """feats (B, T, feature_dim) → (recon, tokens (B, T), losses)."""
        h = self._encode_latent(feats)
        zq, tokens, vq_losses = self.quantizer(h)
        if self.cfg.style == "vocos" and tokens.ndim == 3:
            tokens = tokens[0] if tokens.shape[0] == 1 else tokens
        recon = self._decode_latent(zq)
        recon_loss = jnp.mean((recon - feats) ** 2)
        return recon, tokens, {**vq_losses, "recon": recon_loss}

    def encode(self, feats):
        """feats → semantic tokens (B, T)."""
        h = self._encode_latent(feats)
        if self.cfg.style == "vocos":
            _, tokens, _ = self.quantizer(h)
            return tokens[0] if tokens.shape[0] == 1 else tokens
        return self.quantizer.encode(h)

    def decode_tokens(self, tokens):
        """tokens (B, T) → quantized latent."""
        if self.cfg.style == "vocos":
            if tokens.ndim == 2:
                tokens = tokens[None]
            return self.quantizer.decode(tokens)
        return self.quantizer.decode(tokens)

    def reconstruct_tokens(self, tokens):
        """tokens (B, T) → reconstructed features (B, T, feature_dim) —
        the decoder run on the quantized latents (ref RepCodec usage where
        downstream stages consume SSL-feature-space conditioning)."""
        return self._decode_latent(self.decode_tokens(tokens))
