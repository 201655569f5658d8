"""Conformer encoder (WeNet-style) — the TPU-native replacement for the
reference's vendored WeNet content-feature extractor.

Reference: `modules/wenet_extractor/` (11.7k LoC of torch: transformer/,
efficient_conformer/, squeezeformer/ …) used ONLY as a frozen SSL/ASR
content extractor for SVC conditioning (`modules/encoder/condition_encoder.py`).
Per SURVEY §7, that stack reduces to "a conformer encoder with checkpoint
conversion": this module implements the standard Conformer block (half-step
macaron FFNs, relative-position multi-head self-attention, depthwise conv
module) plus the conv2d×2 4x subsampling front end, matching WeNet's encoder
shape contract (fbank (B, T, 80) → (B, T/4, D)). Weights convert from WeNet
checkpoints via `utils/convert.wenet_conformer_to_flax`.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ConformerConfig:
    input_dim: int = 80  # fbank bins
    hidden: int = 256
    num_layers: int = 12
    num_heads: int = 4
    ffn_hidden: int = 2048
    conv_kernel: int = 15
    dropout: float = 0.0


class Conv2dSubsampling4(nn.Module):
    """Two stride-2 Conv2D + ReLU: (B, T, F) → (B, T//4, hidden)
    (WeNet `embed`: Conv2dSubsampling4)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        b, t, f = x.shape
        h = x[..., None]  # (B, T, F, 1) NHWC
        h = nn.Conv(self.hidden, (3, 3), strides=(2, 2), padding="VALID",
                    name="conv0")(h)
        h = nn.relu(h)
        h = nn.Conv(self.hidden, (3, 3), strides=(2, 2), padding="VALID",
                    name="conv1")(h)
        h = nn.relu(h)
        b2, t2, f2, c = h.shape
        h = h.reshape(b2, t2, f2 * c)
        h = nn.Dense(self.hidden, name="out")(h)
        # WeNet scales by sqrt(d) inside the positional encoding wrapper
        # (embedding.py:151: x = x * self.xscale)
        return h * jnp.sqrt(jnp.asarray(self.hidden, h.dtype))


class RelPositionAttention(nn.Module):
    """WeNet `RelPositionMultiHeadedAttention` (attention.py:201). NOTE:
    WeNet REMOVES the Transformer-XL rel_shift ("useless in speech
    recognition", attention.py:318-320) and feeds the ABSOLUTE sin/cos
    table pe[0:T]; matrix_bd = (q + pos_bias_v) @ linear_pos(pe)^T."""

    hidden: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        b, t, d = x.shape
        nh = self.num_heads
        hd = d // nh
        q = nn.Dense(d, name="linear_q")(x).reshape(b, t, nh, hd)
        k = nn.Dense(d, name="linear_k")(x).reshape(b, t, nh, hd)
        v = nn.Dense(d, name="linear_v")(x).reshape(b, t, nh, hd)
        # absolute sin/cos positions 0..T-1 (embedding.py:57-64)
        pos = np.zeros((t, d), np.float32)
        positions = np.arange(t, dtype=np.float64)[:, None]
        div = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(np.log(1e4) / d))
        pos[:, 0::2] = np.sin(positions * div)
        pos[:, 1::2] = np.cos(positions * div)
        p = nn.Dense(d, use_bias=False, name="linear_pos")(jnp.asarray(pos))
        p = p.reshape(t, nh, hd)
        u = self.param("pos_bias_u", nn.initializers.zeros, (nh, hd))
        w = self.param("pos_bias_v", nn.initializers.zeros, (nh, hd))
        ac = jnp.einsum("bthd,bshd->bhts", q + u, k)
        bd = jnp.einsum("bthd,rhd->bhtr", q + w, p)  # (B, H, T, T)
        scores = (ac + bd) / jnp.sqrt(hd)
        if mask is not None:
            # WeNet masked_fill uses -inf then zeroes masked rows after
            # softmax; padding-only masks make these equivalent
            scores = jnp.where(mask[:, None, None, :] > 0, scores,
                               jnp.finfo(scores.dtype).min)
        att = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", att, v).reshape(b, t, d)
        return nn.Dense(d, name="linear_out")(out)


class ConvModule(nn.Module):
    """Pointwise-GLU → depthwise conv → norm → swish → pointwise
    (WeNet `ConvolutionModule`, layer-norm variant)."""

    hidden: int
    kernel: int

    @nn.compact
    def __call__(self, x, mask=None):
        d = self.hidden
        if mask is not None:
            x = x * mask[..., None]
        h = nn.Dense(2 * d, name="pointwise_conv1")(x)
        h = nn.glu(h, axis=-1)
        h = nn.Conv(d, (self.kernel,), feature_group_count=d, padding="SAME",
                    name="depthwise_conv")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        h = nn.swish(h)
        return nn.Dense(d, name="pointwise_conv2")(h)


class ConformerBlock(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, mask=None):
        c = self.cfg

        def ffn(name):
            def f(h):
                h = nn.Dense(c.ffn_hidden, name=f"{name}_w1")(h)
                h = nn.swish(h)
                return nn.Dense(c.hidden, name=f"{name}_w2")(h)

            return f

        x = x + 0.5 * ffn("ffn_macaron")(nn.LayerNorm(epsilon=1e-5, name="norm_ff_macaron")(x))
        x = x + RelPositionAttention(c.hidden, c.num_heads, name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm_mha")(x), mask
        )
        x = x + ConvModule(c.hidden, c.conv_kernel, name="conv_module")(
            nn.LayerNorm(epsilon=1e-5, name="norm_conv")(x), mask
        )
        x = x + 0.5 * ffn("ffn")(nn.LayerNorm(epsilon=1e-5, name="norm_ff")(x))
        return nn.LayerNorm(epsilon=1e-5, name="norm_final")(x)


class ConformerEncoder(nn.Module):
    """fbank (B, T, input_dim) → (B, ceil-ish T/4, hidden)."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, mask=None):
        c = self.cfg
        h = Conv2dSubsampling4(c.hidden, name="embed")(x)
        sub_mask = None
        if mask is not None:
            # two VALID stride-2 3x3 convs: output j sees inputs [4j, 4j+6];
            # a frame is valid only if its FULL receptive field is (else
            # boundary frames leak padding into every query via attention)
            idx = (jnp.arange(h.shape[1]) * 4 + 6).clip(0, mask.shape[1] - 1)
            sub_mask = jnp.take(mask, idx, axis=1)
        for i in range(c.num_layers):
            h = ConformerBlock(c, name=f"layers_{i}")(h, sub_mask)
        # WeNet applies a top-level after_norm with normalize_before=True
        # (encoder.py:180-181)
        h = nn.LayerNorm(epsilon=1e-5, name="after_norm")(h)
        return h, sub_mask
