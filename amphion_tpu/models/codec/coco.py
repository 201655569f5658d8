"""Coco tokenizers: prosody / content-style FVQ codecs for Vevo1.5.

Reference: `models/codec/coco/rep_coco_model.py` — `CocoContentStyle:33`
(FVQ-16384 @12.5 Hz over SSL content features + style), `CocoContent:244`,
`CocoStyle:329` (FVQ-512 @6.25 Hz prosody from pitch+energy); trainer
`rep_coco_trainer.py`. Single-codebook FVQ over downsampled conv features.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.quantize import FactorizedVectorQuantize
from amphion_tpu.ops.f0 import f0_to_coarse


@dataclass(frozen=True)
class CocoConfig:
    mode: str = "contentstyle"  # "contentstyle" | "content" | "style"
    feature_dim: int = 1024  # SSL feature dim
    hidden: int = 512
    codebook_size: int = 16384
    codebook_dim: int = 16
    downsample: int = 4  # 50 Hz SSL → 12.5 Hz tokens
    num_blocks: int = 4
    pitch_bins: int = 256


class CocoCodec(nn.Module):
    cfg: CocoConfig

    def setup(self):
        c = self.cfg
        self.in_proj = nn.Dense(c.hidden)
        self.pitch_embed = nn.Embed(c.pitch_bins, c.hidden)
        self.down = nn.Conv(
            c.hidden, (2 * c.downsample,), strides=(c.downsample,), padding="SAME"
        )
        self.blocks = [
            nn.Sequential([
                nn.Conv(c.hidden, (5,), padding="SAME"), nn.gelu,
                nn.Conv(c.hidden, (1,)),
            ])
            for _ in range(c.num_blocks)
        ]
        self.quantizer = FactorizedVectorQuantize(
            c.codebook_size, c.codebook_dim, c.hidden
        )
        self.up = nn.ConvTranspose(
            c.hidden, (2 * c.downsample,), strides=(c.downsample,), padding="SAME"
        )
        self.out_proj = nn.Dense(c.feature_dim)

    def _encode_latent(self, content_feats=None, f0=None):
        c = self.cfg
        h = None
        if c.mode in ("contentstyle", "content"):
            assert content_feats is not None
            h = self.in_proj(content_feats)
        if c.mode in ("contentstyle", "style"):
            assert f0 is not None
            pe = self.pitch_embed(f0_to_coarse(f0, c.pitch_bins, 50.0, 1100.0))
            h = pe if h is None else h + pe
        h = self.down(h)
        for blk in self.blocks:
            h = h + blk(h)
        return h

    def __call__(self, content_feats=None, f0=None):
        """→ (recon_feats, tokens (B, T/downsample), losses)."""
        h = self._encode_latent(content_feats, f0)
        zq, tokens, vq_losses = self.quantizer(h)
        y = self.up(zq)
        recon = self.out_proj(y)
        losses = dict(vq_losses)
        if content_feats is not None:
            t = min(recon.shape[1], content_feats.shape[1])
            losses["recon"] = jnp.mean((recon[:, :t] - content_feats[:, :t]) ** 2)
        return recon, tokens, losses

    def encode(self, content_feats=None, f0=None):
        return self.quantizer.encode(self._encode_latent(content_feats, f0))

    def decode_tokens(self, tokens):
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
