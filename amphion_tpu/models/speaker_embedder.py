"""Native WavLM-SV speaker embedder (x-vector head) — the speaker
similarity / diarization backbone.

Reference capability: `evaluation/metrics/similarity/models/*.py` (RawNet3 /
Resemblyzer / WavLM-large similarity). The published checkpoint family is
`microsoft/wavlm-base-(plus-)sv` = WavLM encoder with gated relative
position bias + TDNN x-vector head; this is a checkpoint-compatible flax
re-implementation (converter `hf_wavlm_sv_to_flax`), oracle-verified
against `transformers.WavLMForXVector` in
tests/test_speaker_embedder.py. TPU notes: whole-utterance batch encode,
einsum attention with the (h, T, T) shared position bias broadcast, all
pooling masked so bucket-padded batches reproduce unpadded outputs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.ssl_encoders import (
    HubertConfig,
    HubertFeatureEncoder,
    HubertPosConv,
    _gelu,
)


@dataclass(frozen=True)
class WavLMSVConfig:
    hidden: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_hidden: int = 3072
    conv_dim: tuple = (512,) * 7
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    # gated relative position bias (WavLM novelty vs wav2vec2/HuBERT)
    num_buckets: int = 320
    max_distance: int = 800
    # x-vector head (HF WavLMForXVector defaults)
    use_weighted_layer_sum: bool = True
    tdnn_dim: tuple = (512, 512, 512, 512, 1500)
    tdnn_kernel: tuple = (5, 3, 3, 1, 1)
    tdnn_dilation: tuple = (1, 2, 3, 1, 1)
    xvector_dim: int = 512

    def hubert_cfg(self) -> HubertConfig:
        """Feature-encoder/pos-conv view (identical module family)."""
        return HubertConfig(
            hidden=self.hidden, num_layers=self.num_layers,
            num_heads=self.num_heads, ffn_hidden=self.ffn_hidden,
            conv_dim=self.conv_dim, conv_kernel=self.conv_kernel,
            conv_stride=self.conv_stride, conv_bias=self.conv_bias,
            feat_extract_norm=self.feat_extract_norm,
            do_stable_layer_norm=self.do_stable_layer_norm,
            num_conv_pos_embeddings=self.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=self.num_conv_pos_embedding_groups,
            layer_norm_eps=self.layer_norm_eps,
        )

    def frame_length(self, num_samples: int) -> int:
        t = num_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            t = (t - k) // s + 1
        return t


def _relative_position_bucket(rel, num_buckets: int, max_distance: int):
    """WavLM bucketing (HF `_relative_positions_bucket`,
    modeling_wavlm.py:253): sign half + log-spaced far buckets."""
    nb = num_buckets // 2
    buckets = (rel > 0).astype(jnp.int32) * nb
    rel = jnp.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = (jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
             / math.log(max_distance / max_exact)
             * (nb - max_exact)).astype(jnp.int32) + max_exact
    large = jnp.minimum(large, nb - 1)
    return buckets + jnp.where(is_small, rel, large)


class WavLMAttention(nn.Module):
    """Self-attention with GATED relative position bias
    (HF `WavLMAttention`, modeling_wavlm.py:108). The un-gated bias is
    computed once (layer 0 owns `rel_attn_embed`) and shared; every layer
    applies its own query-dependent gate."""

    cfg: WavLMSVConfig
    has_rel_embed: bool = False

    @nn.compact
    def __call__(self, x, pos_bias=None, mask=None):
        c = self.cfg
        b, t, _ = x.shape
        h, d = c.num_heads, c.hidden // c.num_heads
        if pos_bias is None:
            assert self.has_rel_embed, "first layer must own rel_attn_embed"
            emb = self.param("rel_attn_embed", nn.initializers.normal(0.02),
                             (c.num_buckets, h))
            rel = (jnp.arange(t)[None, :] - jnp.arange(t)[:, None])
            bucket = _relative_position_bucket(rel, c.num_buckets,
                                               c.max_distance)
            pos_bias = jnp.transpose(
                jnp.take(jnp.asarray(emb), bucket, axis=0), (2, 0, 1)
            )  # (h, T, T)

        # query-dependent gate (modeling_wavlm.py:166-180)
        g = x.reshape(b, t, h, d).transpose(0, 2, 1, 3)  # (B, h, T, d)
        proj = nn.Dense(8, name="gru_rel_pos_linear")(g)
        proj = proj.reshape(b, h, t, 2, 4).sum(-1)
        gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)
        const = self.param("gru_rel_pos_const", nn.initializers.ones,
                           (1, h, 1, 1))
        gate = gate_a * (gate_b * const - 1.0) + 2.0  # (B, h, T, 1)
        gated_bias = gate * pos_bias[None]  # (B, h, T, T)

        q = nn.Dense(c.hidden, name="q_proj")(x).reshape(b, t, h, d)
        k = nn.Dense(c.hidden, name="k_proj")(x).reshape(b, t, h, d)
        v = nn.Dense(c.hidden, name="v_proj")(x).reshape(b, t, h, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
        scores = (scores + gated_bias).astype(jnp.float32)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :] > 0, scores,
                               jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, c.hidden)
        return nn.Dense(c.hidden, name="out_proj")(out), pos_bias


class _WavLMLayer(nn.Module):
    """Post-norm encoder layer (base; HF `WavLMEncoderLayer`)."""

    cfg: WavLMSVConfig
    has_rel_embed: bool = False

    @nn.compact
    def __call__(self, x, pos_bias=None, mask=None):
        c = self.cfg
        attn_out, pos_bias = WavLMAttention(
            c, has_rel_embed=self.has_rel_embed, name="attention",
        )(x, pos_bias, mask)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(
            x + attn_out)

        def ffn(h):
            h = nn.Dense(c.ffn_hidden, name="intermediate_dense")(h)
            h = _gelu(h)
            return nn.Dense(c.hidden, name="output_dense")(h)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(
            x + ffn(x))
        return x, pos_bias


class WavLMEncoder(nn.Module):
    """Waveform → hidden states; returns (last_hidden, all_hidden) with HF
    `output_hidden_states=True` indexing."""

    cfg: WavLMSVConfig

    @nn.compact
    def __call__(self, wav, mask=None, num_valid=None):
        c = self.cfg
        hc = c.hubert_cfg()
        h = HubertFeatureEncoder(hc, name="feature_encoder")(wav, num_valid)
        if num_valid is not None and mask is None:
            f = num_valid
            for k, s in zip(c.conv_kernel, c.conv_stride):
                f = (f - k) // s + 1
            mask = (jnp.arange(h.shape[1])[None, :]
                    < f[:, None]).astype(h.dtype)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="fp_layer_norm")(h)
        h = nn.Dense(c.hidden, name="fp_projection")(h)
        if mask is not None:
            h = h * mask[..., None]
        h = h + HubertPosConv(hc, name="pos_conv_embed")(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(h)
        hidden = [h]
        pos_bias = None
        for i in range(c.num_layers):
            h, pos_bias = _WavLMLayer(c, has_rel_embed=(i == 0),
                                      name=f"layers_{i}")(h, pos_bias, mask)
            hidden.append(h)
        return h, hidden


class WavLMForSpeakerVerification(nn.Module):
    """WavLM encoder + TDNN x-vector head (HF `WavLMForXVector`,
    modeling_wavlm.py:1554). `__call__(wav)` → L2-unnormalized speaker
    embeddings (B, xvector_dim); cosine-compare them for SIM-O."""

    cfg: WavLMSVConfig

    @nn.compact
    def __call__(self, wav, num_valid=None):
        c = self.cfg
        _, hidden = WavLMEncoder(c, name="wavlm")(wav, num_valid=num_valid)
        if c.use_weighted_layer_sum:
            w = self.param("layer_weights",
                           nn.initializers.constant(1.0 / len(hidden)),
                           (len(hidden),))
            h = jnp.einsum("l,lbtd->btd", jax.nn.softmax(w),
                           jnp.stack(hidden))
        else:
            h = hidden[-1]
        h = nn.Dense(c.tdnn_dim[0], name="projector")(h)
        valid = (None if num_valid is None
                 else jnp.asarray([c.frame_length(int(n))
                                   for n in num_valid]))
        for i, (dim, k, dil) in enumerate(
                zip(c.tdnn_dim, c.tdnn_kernel, c.tdnn_dilation)):
            h = nn.Conv(dim, (k,), kernel_dilation=(dil,), padding="VALID",
                        name=f"tdnn_{i}")(h)
            h = nn.relu(h)
            if valid is not None:
                valid = valid - dil * (k - 1)
        # statistic pooling: mean + std with Bessel correction (torch .std)
        if valid is None:
            n = h.shape[1]
            mean = jnp.mean(h, axis=1)
            var = jnp.sum((h - mean[:, None]) ** 2, axis=1) / max(n - 1, 1)
        else:
            m = (jnp.arange(h.shape[1])[None, :]
                 < valid[:, None]).astype(h.dtype)[..., None]
            n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
            mean = jnp.sum(h * m, axis=1) / n
            var = jnp.sum(((h - mean[:, None]) * m) ** 2, axis=1) / \
                jnp.maximum(n - 1.0, 1.0)
        stat = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)
        # (the HF classifier head only feeds the AMSoftmax training loss;
        # SIM uses these embeddings directly)
        return nn.Dense(c.xvector_dim, name="feature_extractor")(stat)


def cosine_similarity(a, b):
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return jnp.sum(a * b, axis=-1)
