"""Style-adaptive (SALN) transformer encoder shared by NS3/FACodec and
NaturalSpeech2 (reference: `models/codec/ns3_codec/transformer.py` and the
identical `modules/naturalpseech2/transformers.py:14-236`): pre-LN (or SALN)
MHA + conv-k5 FFN layers, and the reference's batch-indexed positional
encoding quirk."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class NS3SALN(nn.Module):
    """ns3 StyleAdaptiveLayerNorm (transformer.py:13): style Linear with
    bias init [1…,0…], applied to the TIME-MEAN of the condition."""

    @nn.compact
    def __call__(self, x, condition):
        d = x.shape[-1]

        def bias_init(key, shape, dtype=jnp.float32):
            return jnp.concatenate([jnp.ones(d, dtype), jnp.zeros(d, dtype)])

        style = nn.Dense(2 * d, name="style", bias_init=bias_init)(
            jnp.mean(condition, axis=1, keepdims=True))
        gamma, beta = jnp.split(style, 2, axis=-1)
        normed = nn.LayerNorm(epsilon=1e-5, use_scale=False, use_bias=False)(x)
        return gamma * normed + beta


class NS3TransformerLayer(nn.Module):
    """ns3 TransformerEncoderLayer (transformer.py:86): pre-LN (or SALN)
    MHA + conv-k5 FFN."""

    hidden: int
    heads: int
    filter_size: int
    kernel_size: int = 5
    use_cln: bool = False
    ffn_act: str = "relu"  # ns3/ns2 use relu; Noro's use_new_ffn uses silu

    @nn.compact
    def __call__(self, x, condition=None, mask=None):
        res = x
        if self.use_cln:
            h = NS3SALN(name="ln_1")(x, condition)
        else:
            h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        b, t, d = h.shape
        nh, dh = self.heads, self.hidden // self.heads
        q = nn.Dense(d, name="q")(h).reshape(b, t, nh, dh)
        k = nn.Dense(d, name="k")(h).reshape(b, t, nh, dh)
        v = nn.Dense(d, name="v")(h).reshape(b, t, nh, dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dh)
        if mask is not None:
            # torch key_padding_mask semantics (pad keys excluded)
            scores = jnp.where(mask[:, None, None, :] > 0, scores,
                               jnp.finfo(scores.dtype).min)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        x = res + nn.Dense(d, name="out")(o)

        res = x
        if self.use_cln:
            h = NS3SALN(name="ln_2")(x, condition)
        else:
            h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME",
                    name="ffn_1")(h)
        h = jax.nn.silu(h) if self.ffn_act == "silu" else jax.nn.relu(h)
        h = nn.Dense(self.hidden, name="ffn_2")(h)
        return res + h


class NS3TransformerEncoder(nn.Module):
    """ns3 TransformerEncoder (transformer.py:154). Faithfully reproduces
    the reference's positional-encoding quirk: the (max_len, 1, d) table is
    indexed by BATCH position on batch-first input, adding a constant
    per-batch-row vector (`pe[: x.size(0)]`, transformer.py:50)."""

    hidden: int = 256
    num_layers: int = 4
    heads: int = 4
    filter_size: int = 1024
    kernel_size: int = 5
    use_cln: bool = False
    ffn_act: str = "relu"

    @nn.compact
    def __call__(self, x, condition=None, mask=None):
        b = x.shape[0]
        pos = np.arange(5000)[:, None]
        div = np.exp(np.arange(0, self.hidden, 2) *
                     (-np.log(10000.0) / self.hidden))
        tab = np.zeros((5000, self.hidden), np.float32)
        tab[:, 0::2] = np.sin(pos * div)
        tab[:, 1::2] = np.cos(pos * div)
        x = x + jnp.asarray(tab)[:b][:, None, :]
        for i in range(self.num_layers):
            x = NS3TransformerLayer(
                self.hidden, self.heads, self.filter_size, self.kernel_size,
                self.use_cln, self.ffn_act, name=f"layer_{i}")(x, condition,
                                                               mask)
        if self.use_cln:
            return NS3SALN(name="last_ln")(x, condition)
        return nn.LayerNorm(epsilon=1e-5, name="last_ln")(x)


