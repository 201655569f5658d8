"""TPU-native T5 text encoder — the frozen conditioning encoder for the
TTA family (reference: `models/tta/ldm/audioldm_inference.py:60-61` /
`audioldm_trainer.py:42` load `T5EncoderModel.from_pretrained("t5-base")`
on the host; PicoAudio conditions on T5 features too).

Faithful re-implementation of the HF T5 encoder stack in flax so the
conditioning runs on-device inside the jitted sampler instead of a torch
host round-trip: RMS LayerNorm (no mean subtraction, fp32 accumulation),
UNSCALED attention logits (T5 folds the 1/sqrt(d) into init) plus the
shared layer-0 relative-position-bucket bias, and a relu or gated-gelu
FFN (t5-base / t5-v1.1). Weight-compatible via
`utils/convert.hf_t5_encoder_to_flax`; torch oracle in
tests/test_t5_encoder.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    num_heads: int = 12
    d_ff: int = 3072
    num_layers: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    feed_forward_proj: str = "relu"  # "relu" (t5) | "gated-gelu" (t5-v1.1)
    layer_norm_epsilon: float = 1e-6


def relative_position_bucket(relative_position: np.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """HF `T5Attention._relative_position_bucket`, bidirectional: half the
    buckets for each sign, exact for small |d|, log-spaced beyond."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, n, large)


class T5LayerNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x.astype(jnp.float32)
                * jnp.reciprocal(jnp.sqrt(var + self.eps))
                ).astype(x.dtype) * w


class T5SelfAttention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, position_bias, mask=None):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        b, t, _ = x.shape
        q = nn.Dense(inner, use_bias=False, name="q")(x)
        k = nn.Dense(inner, use_bias=False, name="k")(x)
        v = nn.Dense(inner, use_bias=False, name="v")(x)
        q = q.reshape(b, t, c.num_heads, c.d_kv)
        k = k.reshape(b, t, c.num_heads, c.d_kv)
        v = v.reshape(b, t, c.num_heads, c.d_kv)
        # NO 1/sqrt(d_kv): T5 folds the scale into the init
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) + position_bias
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :] > 0, scores,
                               jnp.finfo(scores.dtype).min)
        probs = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, inner)
        return nn.Dense(c.d_model, use_bias=False, name="o")(out)


class T5FFN(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        if c.feed_forward_proj == "gated-gelu":
            h = (nn.gelu(nn.Dense(c.d_ff, use_bias=False, name="wi_0")(x),
                         approximate=True)
                 * nn.Dense(c.d_ff, use_bias=False, name="wi_1")(x))
        else:
            h = nn.relu(nn.Dense(c.d_ff, use_bias=False, name="wi")(x))
        return nn.Dense(c.d_model, use_bias=False, name="wo")(h)


class T5EncoderBlock(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, position_bias, mask=None):
        c = self.cfg
        h = T5LayerNorm(c.layer_norm_epsilon, name="ln_attn")(x)
        x = x + T5SelfAttention(c, name="attn")(h, position_bias, mask)
        h = T5LayerNorm(c.layer_norm_epsilon, name="ln_ffn")(x)
        return x + T5FFN(c, name="ffn")(h)


class T5Encoder(nn.Module):
    """token ids (B, L) [+ mask (B, L)] → (B, L, d_model)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids, mask=None):
        c = self.cfg
        x = nn.Embed(c.vocab_size, c.d_model, name="embed_tokens")(input_ids)
        t = input_ids.shape[1]
        # shared relative bias, computed once from the layer-0 table
        rel_bias = self.param(
            "relative_attention_bias", nn.initializers.normal(1.0),
            (c.relative_attention_num_buckets, c.num_heads))
        pos = np.arange(t)
        buckets = relative_position_bucket(
            pos[None, :] - pos[:, None],
            c.relative_attention_num_buckets,
            c.relative_attention_max_distance)
        position_bias = jnp.take(rel_bias, jnp.asarray(buckets), axis=0)
        position_bias = jnp.transpose(position_bias, (2, 0, 1))[None]
        for i in range(c.num_layers):
            x = T5EncoderBlock(c, name=f"block_{i}")(x, position_bias, mask)
        x = T5LayerNorm(c.layer_norm_epsilon, name="final_layer_norm")(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x
