"""Transformer building blocks.

Covers the reference's `modules/transformer/` surface (reference:
`attentions.py:16-303` VITS-style encoder/decoder with windowed relative
attention; `transformer.py:19-411` vanilla layers; FastSpeech2 FFT blocks in
`Models.py`/`SubLayers.py`) re-designed for TPU: NLC layouts, masks as
additive biases, everything jit-friendly with static shapes.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_positions(length: int, dim: int, max_timescale: float = 1e4) -> np.ndarray:
    """Standard sin/cos positional table, (length, dim). Built in numpy so it
    stays a compile-time constant."""
    pos = np.arange(length, dtype=np.float64)[:, None]
    div = np.exp(-np.arange(0, dim, 2, dtype=np.float64) / dim * np.log(max_timescale))
    tab = np.zeros((length, dim), np.float64)
    tab[:, 0::2] = np.sin(pos * div)
    tab[:, 1::2] = np.cos(pos * div[: (dim - dim // 2)])
    return tab.astype(np.float32)


def attention_bias_from_mask(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, T) padding mask → (B, 1, 1, T) additive bias."""
    return jnp.where(mask[:, None, None, :], 0.0, jnp.finfo(dtype).min)


def causal_bias(t: int, dtype=jnp.float32) -> jax.Array:
    """(1, 1, T, T) lower-triangular additive bias."""
    m = jnp.tril(jnp.ones((t, t), bool))
    return jnp.where(m, 0.0, jnp.finfo(dtype).min)[None, None]


class MultiHeadAttention(nn.Module):
    """MHA with optional windowed relative position embeddings.

    ``window_size`` enables the VITS-style learned relative-position keys and
    values restricted to +/- window (reference `attentions.py:165-303`).
    """

    channels: int
    num_heads: int
    window_size: Optional[int] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, bias=None, deterministic=True):
        context = x if context is None else context
        h, d = self.num_heads, self.channels // self.num_heads
        q = nn.Dense(self.channels, name="q")(x)
        k = nn.Dense(self.channels, name="k")(context)
        v = nn.Dense(self.channels, name="v")(context)

        def split(t):
            return t.reshape(*t.shape[:-1], h, d).transpose(0, 2, 1, 3)  # B,H,T,D

        q, k, v = split(q), split(k), split(v)
        scale = 1.0 / math.sqrt(d)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale

        if self.window_size is not None:
            t = x.shape[1]
            w = self.window_size
            rel_k = self.param(
                "rel_k", nn.initializers.normal(d**-0.5), (2 * w + 1, d)
            )
            # relative logits: (B,H,T,2w+1) → absolute (B,H,T,T)
            rel_logits = jnp.einsum("bhqd,rd->bhqr", q, rel_k) * scale
            scores = scores + _relative_to_absolute(rel_logits, t)

        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)

        if self.window_size is not None:
            rel_v = self.param(
                "rel_v", nn.initializers.normal(d**-0.5), (2 * self.window_size + 1, d)
            )
            rel_w = _absolute_to_relative(probs, self.window_size)
            out = out + jnp.einsum("bhqr,rd->bhqd", rel_w, rel_v)

        out = out.transpose(0, 2, 1, 3).reshape(*x.shape[:-1], self.channels)
        return nn.Dense(self.channels, name="out")(out)


def _relative_to_absolute(rel: jax.Array, t: int) -> jax.Array:
    """(B,H,T,2w+1) windowed relative logits → (B,H,T,T) absolute.

    Entry (q, j) = rel[q, j - q + w] inside the window, 0 outside.
    """
    w = (rel.shape[-1] - 1) // 2
    q = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    k = j - q + w
    valid = (k >= 0) & (k <= 2 * w)
    k = jnp.clip(k, 0, 2 * w)
    out = rel[:, :, q, k]  # (B,H,T,T)
    return jnp.where(valid[None, None], out, 0.0)


def _absolute_to_relative(abs_w: jax.Array, w: int) -> jax.Array:
    """(B,H,T,T) attention probs → (B,H,T,2w+1) at relative offsets j-q in
    [-w, w] (0 outside the sequence)."""
    b, h, t, _ = abs_w.shape
    padded = jnp.pad(abs_w, ((0, 0), (0, 0), (0, 0), (w, w)))
    idx_q = jnp.arange(t)[:, None]
    idx_r = jnp.arange(2 * w + 1)[None, :]
    return padded[:, :, idx_q, idx_q + idx_r]


class ConvFFN(nn.Module):
    """Position-wise FFN as 1-D convs (VITS/FastSpeech2 convention)."""

    channels: int
    hidden: int
    kernel_size: int = 3
    dropout: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        # mask BEFORE each conv: the reference FFN (attentions.py:390-398)
        # computes conv(x * x_mask) so padding can never leak into valid
        # frames through the kernel-3 receptive field
        m = 1.0 if mask is None else mask[..., None]
        h = nn.Conv(self.hidden, (self.kernel_size,), padding="SAME")(x * m)
        if self.activation == "gelu":
            # reference uses the sigmoid-approx gelu x*sigmoid(1.702x)
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME")(h * m)
        return h * m


class TransformerEncoder(nn.Module):
    """Pre-LN-free (VITS-style post-LN) encoder stack with relative attention
    (reference `attentions.py:16-78`)."""

    channels: int
    num_heads: int
    num_layers: int
    ffn_hidden: int
    kernel_size: int = 3
    window_size: Optional[int] = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        bias = attention_bias_from_mask(mask) if mask is not None else None
        if mask is not None:
            x = x * mask[..., None]
        for _ in range(self.num_layers):
            y = MultiHeadAttention(
                self.channels, self.num_heads, self.window_size, self.dropout
            )(x, bias=bias, deterministic=deterministic)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=1e-5)(x + y)  # torch LN eps (ref base_module.py:12)
            y = ConvFFN(self.channels, self.ffn_hidden, self.kernel_size, self.dropout)(
                x, mask, deterministic
            )
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=1e-5)(x + y)
        if mask is not None:
            x = x * mask[..., None]
        return x


class FFTBlock(nn.Module):
    """FastSpeech2 feed-forward transformer block (self-attn + conv FFN,
    reference `modules/transformer/SubLayers.py`)."""

    channels: int
    num_heads: int
    ffn_hidden: int
    kernel_size: int = 9
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        bias = attention_bias_from_mask(mask) if mask is not None else None
        y = MultiHeadAttention(self.channels, self.num_heads, None, self.dropout)(
            x, bias=bias, deterministic=deterministic
        )
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = nn.LayerNorm()(x + y)
        y = ConvFFN(self.channels, self.ffn_hidden, self.kernel_size, self.dropout)(
            x, mask, deterministic
        )
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = nn.LayerNorm()(x + y)
        if mask is not None:
            x = x * mask[..., None]
        return x


class TorchEncoderLayer(nn.Module):
    """`torch.nn.TransformerEncoderLayer` equivalent (post-LN, ReLU FFN,
    packed-QKV attention) — used by models that stack the stock torch
    encoder (ref `models/svc/transformer/transformer.py:26-28`)."""

    d_model: int
    heads: int
    ffn_hidden: int = 2048  # torch dim_feedforward default (ref keeps it)

    @nn.compact
    def __call__(self, x, mask=None):
        d, h = self.d_model, self.heads
        hd = d // h
        qkv = nn.Dense(3 * d, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (*x.shape[:2], h, hd)
        q = q.reshape(shape).transpose(0, 2, 1, 3) / jnp.sqrt(hd).astype(x.dtype)
        k = k.reshape(shape).transpose(0, 2, 1, 3)
        v = v.reshape(shape).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if mask is not None:
            logits = logits + (1.0 - mask[:, None, None, :]) * -1e9
        a = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, axis=-1), v)
        a = a.transpose(0, 2, 1, 3).reshape(x.shape)
        a = nn.Dense(d, name="out_proj")(a)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + a)
        y = nn.Dense(self.ffn_hidden, name="linear1")(x)
        y = nn.Dense(d, name="linear2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + y)
