"""Coco tokenizers: prosody / content-style FVQ codecs for Vevo1.5,
checkpoint-compatible with the reference
(`models/codec/coco/rep_coco_model.py` — `CocoContentStyle:33`,
`CocoContent:244`, `CocoStyle:329`): whisper/chromagram input linears
(summed), log2(downsample) strided k3 convs + GELU, ConvNeXt VocosBackbone
encoder + linear, single-codebook L2-normalized FVQ (commitment 0.15),
decoder backbone + linear, k4 transposed-conv upsampling + GELU, per-input
output linears with truncate/repeat length fix-up.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.vocoders.vocos import VocosBackbone
from amphion_tpu.modules.quantize import ResidualVQ


@dataclass(frozen=True)
class CocoConfig:
    mode: str = "contentstyle"  # "contentstyle" | "content" | "style"
    feature_dim: int = 1024  # whisper/SSL feature dim
    chromagram_dim: int = 24
    hidden: int = 1024  # ref hidden_size
    codebook_size: int = 16384
    codebook_dim: int = 8
    num_quantizers: int = 1
    downsample: int = 4  # 50 Hz SSL → 12.5 Hz tokens (power of two)
    vocos_dim: int = 384
    vocos_intermediate_dim: int = 2048
    num_blocks: int = 12  # vocos_num_layers
    pitch_bins: int = 256  # unused (kept for old configs)


def f0_to_chromagram_proxy(f0: jax.Array, dim: int = 24) -> jax.Array:
    """(B, T) F0 Hz → (B, T, dim) one-hot chroma-class proxy — an offline
    stand-in for the reference's librosa chromagram features."""
    voiced = f0 > 1.0
    cls = jnp.where(
        voiced,
        jnp.round(12.0 * jnp.log2(jnp.maximum(f0, 1.0) / 32.7)) % dim,
        0.0,
    ).astype(jnp.int32)
    return jax.nn.one_hot(cls, dim) * voiced[..., None]


class CocoCodec(nn.Module):
    cfg: CocoConfig

    def setup(self):
        c = self.cfg
        self.use_whisper = c.mode in ("contentstyle", "content")
        self.use_chroma = c.mode in ("contentstyle", "style")
        if self.use_whisper:
            self.whisper_input_layer = nn.Dense(c.hidden,
                                                name="whisper_input_layer")
            self.whisper_output_layer = nn.Dense(c.feature_dim,
                                                 name="whisper_output_layer")
        if self.use_chroma:
            self.chromagram_input_layer = nn.Dense(
                c.hidden, name="chromagram_input_layer")
            self.chromagram_output_layer = nn.Dense(
                c.chromagram_dim, name="chromagram_output_layer")
        n_down = int(math.log2(c.downsample)) if c.downsample > 1 else 0
        self.down_layers = [
            nn.Conv(c.hidden, (3,), strides=(2,), padding=[(1, 1)],
                    name=f"down_{k}")
            for k in range(n_down)
        ]
        self.up_layers = [
            # torch ConvTranspose1d(k=4, s=2, p=1) → flax (k-1-p, k-1-p)
            nn.ConvTranspose(c.hidden, (4,), strides=(2,),
                             padding=((2, 2),), name=f"up_{k}")
            for k in range(n_down)
        ]
        self.enc_backbone = VocosBackbone(
            c.vocos_dim, c.vocos_intermediate_dim, c.num_blocks,
            name="enc_backbone")
        self.enc_out = nn.Dense(c.hidden, name="enc_out")
        self.quantizer = ResidualVQ(
            num_quantizers=c.num_quantizers, codebook_size=c.codebook_size,
            codebook_dim=c.codebook_dim, input_dim=c.hidden,
            quantizer_type="fvq", commitment=0.15, name="quantizer")
        self.dec_backbone = VocosBackbone(
            c.vocos_dim, c.vocos_intermediate_dim, c.num_blocks,
            name="dec_backbone")
        self.dec_out = nn.Dense(c.hidden, name="dec_out")

    def _inputs(self, content_feats=None, f0=None, style_feats=None):
        h = None
        if self.use_whisper:
            assert content_feats is not None
            h = self.whisper_input_layer(content_feats)
        if self.use_chroma:
            if style_feats is None:
                assert f0 is not None
                style_feats = f0_to_chromagram_proxy(
                    f0, self.cfg.chromagram_dim)
            ce = self.chromagram_input_layer(style_feats)
            h = ce if h is None else h + ce
        return h

    def _encode_latent(self, content_feats=None, f0=None, style_feats=None):
        h = self._inputs(content_feats, f0, style_feats)
        for conv in self.down_layers:
            h = jax.nn.gelu(conv(h), approximate=False)
        h = self.enc_out(self.enc_backbone(h))
        return h

    def __call__(self, content_feats=None, f0=None, style_feats=None):
        """→ (recon_feats, tokens (B, T/downsample), losses)."""
        c = self.cfg
        t_in = (content_feats if content_feats is not None else
                (style_feats if style_feats is not None else f0)).shape[1]
        h = self._encode_latent(content_feats, f0, style_feats)
        zq, tokens, vq_losses = self.quantizer(h)
        y = self.dec_out(self.dec_backbone(zq))
        for conv in self.up_layers:
            y = jax.nn.gelu(conv(y), approximate=False)
        # length fix-up (ref rep_coco_model.py:209-216)
        if y.shape[1] >= t_in:
            y = y[:, :t_in]
        else:
            pad = jnp.repeat(y[:, -1:], t_in - y.shape[1], axis=1)
            y = jnp.concatenate([y, pad], axis=1)
        # rec losses are L1 with weight 32 (ref rep_coco_trainer.py:159-191:
        # whisper_rec_loss * 32 + chromagram_rec_loss * 32 + codebook_loss)
        rec_w = 32.0
        losses = dict(vq_losses)
        recon = None
        if self.use_whisper:
            recon = self.whisper_output_layer(y)
            if content_feats is not None:
                losses["whisper_rec"] = rec_w * jnp.mean(
                    jnp.abs(recon - content_feats))
        if self.use_chroma:
            chroma_rec = self.chromagram_output_layer(y)
            target = (style_feats if style_feats is not None else
                      (f0_to_chromagram_proxy(f0, c.chromagram_dim)
                       if f0 is not None else None))
            if target is not None:
                losses["chromagram_rec"] = rec_w * jnp.mean(
                    jnp.abs(chroma_rec - target))
            if recon is None:
                recon = chroma_rec
        tokens = tokens[0] if tokens.shape[0] == 1 else tokens
        return recon, tokens, losses

    def encode(self, content_feats=None, f0=None, style_feats=None):
        """→ tokens (B, T/downsample) for a single-codebook config."""
        h = self._encode_latent(content_feats, f0, style_feats)
        _, tokens, _ = self.quantizer(h)
        return tokens[0] if tokens.shape[0] == 1 else tokens

    def decode_tokens(self, tokens):
        if tokens.ndim == 2:
            tokens = tokens[None]
        return self.quantizer.decode(tokens)


def coco_contentstyle(feature_dim=1024) -> CocoConfig:
    """FVQ-16384 @12.5 Hz content-style tokenizer (ref README rates)."""
    return CocoConfig(mode="contentstyle", feature_dim=feature_dim,
                      codebook_size=16384, downsample=4)


def coco_style(feature_dim=1024) -> CocoConfig:
    """FVQ-512 @6.25 Hz prosody tokenizer."""
    return CocoConfig(mode="style", feature_dim=feature_dim,
                      codebook_size=512, downsample=8)


def coco_content(feature_dim=1024) -> CocoConfig:
    return CocoConfig(mode="content", feature_dim=feature_dim,
                      codebook_size=8192, downsample=4)
