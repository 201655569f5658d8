"""TPU-native SSL content encoders: HuBERT, w2v-bert-2.0, Whisper encoder.

The reference leans on frozen torch SSL checkpoints for content features:
HuBERT-large for Vevo content(-style) tokens (`models/vc/vevo/vevo_utils.py:46-51`),
w2v-bert-2.0 layer 17 for MaskGCT semantic features
(`models/tts/maskgct/maskgct_utils.py:46`), Whisper / ContentVec / MERT for
SVC conditioning (`processors/content_extractor.py:267,317,446,502`).
ContentVec and MERT are HuBERT-family models, so `HubertEncoder` covers
them too (same graph, different weights).

These flax modules are checkpoint-compatible with the HuggingFace torch
implementations (transformers `modeling_hubert.py`, `modeling_wav2vec2_bert.py`,
`modeling_whisper.py`) via `utils/convert.{hf_hubert_to_flax,
hf_w2v_bert_to_flax, hf_whisper_encoder_to_flax}` — so the extractors run
jitted on the accelerator instead of op-by-op torch on the host.

Layout is NLC throughout; masks are frame-level (1 = valid).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _gelu(x):
    return nn.gelu(x, approximate=False)


def _mask_scores(scores, mask):
    """Additive key mask: (B, Tk) 1=valid → -inf on padded keys."""
    if mask is None:
        return scores
    return jnp.where(mask[:, None, None, :] > 0, scores,
                     jnp.finfo(scores.dtype).min)


class _MHA(nn.Module):
    """Plain torch-style multi-head attention (q/k/v/out Linear), with
    per-projection bias flags (Whisper's k_proj has no bias)."""

    hidden: int
    num_heads: int
    k_bias: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        b, t, d = x.shape
        nh = self.num_heads
        hd = d // nh
        q = nn.Dense(d, name="q_proj")(x).reshape(b, t, nh, hd)
        k = nn.Dense(d, use_bias=self.k_bias, name="k_proj")(x).reshape(b, t, nh, hd)
        v = nn.Dense(d, name="v_proj")(x).reshape(b, t, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, x.dtype))
        scores = _mask_scores(scores, mask)
        att = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, d)
        return nn.Dense(d, name="out_proj")(out)


# ---------------------------------------------------------------------------
# HuBERT (also ContentVec / MERT — same architecture family)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HubertConfig:
    hidden: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_hidden: int = 3072
    conv_dim: tuple = (512,) * 7
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    # "group" (base: GroupNorm on conv0) | "layer" (large: LN on every conv)
    feat_extract_norm: str = "group"
    # False: post-LN layers (base); True: pre-LN "stable" layers + final LN
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @staticmethod
    def large() -> "HubertConfig":
        return HubertConfig(hidden=1024, num_layers=24, num_heads=16,
                            ffn_hidden=4096, conv_bias=True,
                            feat_extract_norm="layer",
                            do_stable_layer_norm=True)

    def frame_length(self, num_samples: int) -> int:
        t = num_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            t = (t - k) // s + 1
        return t


class HubertFeatureEncoder(nn.Module):
    """Waveform (B, T) → (B, T', conv_dim[-1]) strided conv stack
    (HF `HubertFeatureEncoder`).

    `num_valid` (B,) — valid sample counts. The base variant's GroupNorm
    (groups=C) normalizes each channel over the WHOLE time axis, so bucket
    padding would perturb valid frames; with `num_valid` the statistics are
    computed over valid conv0 frames only, making padded extraction exactly
    match the unpadded torch model."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x, num_valid=None):
        c = self.cfg
        h = x[..., None]  # (B, T, 1)
        valid = num_valid
        for i, (dim, k, s) in enumerate(
                zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=c.conv_bias, name=f"conv_{i}")(h)
            if valid is not None:
                valid = (valid - k) // s + 1
            if c.feat_extract_norm == "group" and i == 0:
                scale = self.param("group_norm_scale",
                                   nn.initializers.ones, (dim,))
                bias = self.param("group_norm_bias",
                                  nn.initializers.zeros, (dim,))
                if valid is None:
                    mu = jnp.mean(h, axis=1, keepdims=True)
                    var = jnp.mean((h - mu) ** 2, axis=1, keepdims=True)
                else:
                    m = (jnp.arange(h.shape[1])[None, :]
                         < valid[:, None]).astype(h.dtype)[..., None]
                    n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
                    mu = jnp.sum(h * m, axis=1, keepdims=True) / n
                    var = jnp.sum((h - mu) ** 2 * m, axis=1,
                                  keepdims=True) / n
                h = (h - mu) / jnp.sqrt(var + 1e-5) * scale + bias
            elif c.feat_extract_norm == "layer":
                h = nn.LayerNorm(epsilon=1e-5, name=f"layer_norm_{i}")(h)
            h = _gelu(h)
        return h


class HubertPosConv(nn.Module):
    """Grouped conv positional embedding (HF `HubertPositionalConvEmbedding`);
    weight norm is folded into the kernel at conversion time."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        k = c.num_conv_pos_embeddings
        h = nn.Conv(c.hidden, (k,), padding=((k // 2, k // 2),),
                    feature_group_count=c.num_conv_pos_embedding_groups,
                    name="conv")(x)
        if k % 2 == 0:  # SamePadLayer: drop the trailing extra frame
            h = h[:, :-1]
        return _gelu(h)


class _HubertLayer(nn.Module):
    cfg: HubertConfig

    @nn.compact
    def __call__(self, x, mask=None):
        c = self.cfg

        def ffn(h):
            h = nn.Dense(c.ffn_hidden, name="intermediate_dense")(h)
            h = _gelu(h)
            return nn.Dense(c.hidden, name="output_dense")(h)

        attn = _MHA(c.hidden, c.num_heads, name="attention")
        if c.do_stable_layer_norm:  # pre-LN (hubert-large)
            x = x + attn(nn.LayerNorm(epsilon=c.layer_norm_eps,
                                      name="layer_norm")(x), mask)
            x = x + ffn(nn.LayerNorm(epsilon=c.layer_norm_eps,
                                     name="final_layer_norm")(x))
        else:  # post-LN (hubert-base)
            x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                             name="layer_norm")(x + attn(x, mask))
            x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                             name="final_layer_norm")(x + ffn(x))
        return x


class HubertEncoder(nn.Module):
    """Waveform → hidden states. Returns (last_hidden, all_hidden) where
    all_hidden matches HF `output_hidden_states=True` indexing
    (all_hidden[0] = encoder input, all_hidden[-1] = last_hidden)."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, wav, mask=None, num_valid=None):
        c = self.cfg
        h = HubertFeatureEncoder(c, name="feature_encoder")(wav, num_valid)
        if num_valid is not None and mask is None:
            f = num_valid
            for k, s in zip(c.conv_kernel, c.conv_stride):
                f = (f - k) // s + 1
            mask = (jnp.arange(h.shape[1])[None, :]
                    < f[:, None]).astype(h.dtype)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="fp_layer_norm")(h)
        h = nn.Dense(c.hidden, name="fp_projection")(h)
        if mask is not None:
            h = h * mask[..., None]
        h = h + HubertPosConv(c, name="pos_conv_embed")(h)
        if not c.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(h)
        hidden = [h]
        for i in range(c.num_layers):
            h = _HubertLayer(c, name=f"layers_{i}")(h, mask)
            hidden.append(h)
        if c.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(h)
            hidden[-1] = h
        return h, hidden


# ---------------------------------------------------------------------------
# w2v-bert-2.0 (MaskGCT semantic features)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class W2VBertConfig:
    hidden: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_hidden: int = 4096
    input_dim: int = 160  # stacked 80-dim fbank ×2 (SeamlessM4T features)
    conv_kernel: int = 31
    left_max_pos: int = 64
    right_max_pos: int = 8
    layer_norm_eps: float = 1e-5


class _W2VBertAttention(nn.Module):
    """Self-attention with `relative_key` distance embeddings
    (HF `Wav2Vec2BertSelfAttention`, position_embeddings_type="relative_key")."""

    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x, mask=None):
        c = self.cfg
        b, t, d = x.shape
        nh = c.num_heads
        hd = d // nh
        q = nn.Dense(d, name="linear_q")(x).reshape(b, t, nh, hd)
        k = nn.Dense(d, name="linear_k")(x).reshape(b, t, nh, hd)
        v = nn.Dense(d, name="linear_v")(x).reshape(b, t, nh, hd)
        scale = jnp.sqrt(jnp.asarray(hd, x.dtype))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / scale
        # distance = key_pos - query_pos, clamped to [-left, right]
        dist = np.arange(t)[None, :] - np.arange(t)[:, None]
        dist = np.clip(dist, -c.left_max_pos, c.right_max_pos) + c.left_max_pos
        table = nn.Embed(c.left_max_pos + c.right_max_pos + 1, hd,
                         name="distance_embedding")(jnp.asarray(dist))
        scores = scores + jnp.einsum("bqhd,qkd->bhqk", q, table) / scale
        scores = _mask_scores(scores, mask)
        att = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, d)
        return nn.Dense(d, name="linear_out")(out)


class _W2VBertConvModule(nn.Module):
    """LN → pointwise-GLU → CAUSAL depthwise conv → LN → swish → pointwise
    (HF `Wav2Vec2BertConvolutionModule`; note the left-only padding)."""

    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x, mask=None):
        c = self.cfg
        d = c.hidden
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x)
        if mask is not None:
            h = h * mask[..., None]
        h = nn.Dense(d * 2, use_bias=False, name="pointwise_conv1")(h)
        h = nn.glu(h, axis=-1)
        h = nn.Conv(d, (c.conv_kernel,), padding=((c.conv_kernel - 1, 0),),
                    feature_group_count=d, use_bias=False,
                    name="depthwise_conv")(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="depthwise_layer_norm")(h)
        h = nn.swish(h)
        return nn.Dense(d, use_bias=False, name="pointwise_conv2")(h)


class _W2VBertLayer(nn.Module):
    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x, mask=None):
        c = self.cfg

        def ffn(name):
            def f(h):
                h = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                 name=f"{name}_layer_norm")(h)
                h = nn.Dense(c.ffn_hidden, name=f"{name}_intermediate")(h)
                h = nn.swish(h)
                return nn.Dense(c.hidden, name=f"{name}_output")(h)

            return f

        x = x + 0.5 * ffn("ffn1")(x)
        x = x + _W2VBertAttention(c, name="self_attn")(
            nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="self_attn_layer_norm")(x), mask)
        x = x + _W2VBertConvModule(c, name="conv_module")(x, mask)
        x = x + 0.5 * ffn("ffn2")(x)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)


class W2VBertEncoder(nn.Module):
    """Stacked-fbank features (B, T, input_dim) → hidden states.
    Returns (last_hidden, all_hidden) with HF hidden_states indexing —
    MaskGCT taps all_hidden[17] (`maskgct_utils.py:55`)."""

    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, feats, mask=None):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="fp_layer_norm")(feats)
        h = nn.Dense(c.hidden, name="fp_projection")(h)
        if mask is not None:
            h = h * mask[..., None]
        hidden = [h]
        for i in range(c.num_layers):
            h = _W2VBertLayer(c, name=f"layers_{i}")(h, mask)
            hidden.append(h)
        return h, hidden


# ---------------------------------------------------------------------------
# Whisper encoder (SVC whisper content features)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class WhisperEncConfig:
    hidden: int = 512  # whisper-base d_model
    num_layers: int = 6
    num_heads: int = 8
    ffn_hidden: int = 2048
    n_mels: int = 80
    max_source_positions: int = 1500
    layer_norm_eps: float = 1e-5


class WhisperEncoder(nn.Module):
    """Log-mel (B, T, n_mels) → (B, T//2, hidden) (HF `WhisperEncoder`).
    The sinusoidal position table is a converted buffer (`embed_positions`);
    inputs shorter than 2*max_source_positions are allowed — the table is
    sliced to the conv output length."""

    cfg: WhisperEncConfig

    @nn.compact
    def __call__(self, mel, mask=None):
        c = self.cfg
        h = nn.Conv(c.hidden, (3,), padding=((1, 1),), name="conv1")(mel)
        h = _gelu(h)
        h = nn.Conv(c.hidden, (3,), strides=(2,), padding=((1, 1),),
                    name="conv2")(h)
        h = _gelu(h)
        pos = self.param("embed_positions", nn.initializers.zeros,
                         (c.max_source_positions, c.hidden))
        h = h + pos[None, :h.shape[1]]
        for i in range(c.num_layers):
            res = h
            a = nn.LayerNorm(epsilon=c.layer_norm_eps,
                             name=f"layers_{i}_self_attn_layer_norm")(h)
            h = res + _MHA(c.hidden, c.num_heads, k_bias=False,
                           name=f"layers_{i}_self_attn")(a, mask)
            res = h
            f = nn.LayerNorm(epsilon=c.layer_norm_eps,
                             name=f"layers_{i}_final_layer_norm")(h)
            f = nn.Dense(c.ffn_hidden, name=f"layers_{i}_fc1")(f)
            f = _gelu(f)
            h = res + nn.Dense(c.hidden, name=f"layers_{i}_fc2")(f)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(h)


def w2vbert_apply_scanned(model: "W2VBertEncoder", params, feats, mask=None,
                          tap: int = 17):
    """`W2VBertEncoder` forward with `lax.scan` over the layer stack.

    Identical math and the SAME (HF-layout, `layers_{i}`) param tree as
    the unrolled `model.apply` — but the compiled program contains ONE
    layer body instead of `num_layers` inlined copies (~24× smaller HLO).
    The 600M-class 24-layer program is otherwise large enough to kill
    slow remote-compile transports (the axon tunnel drops the connection
    after ~30 min — bench_ssl_extract's original failure mode), and
    scan-over-layers is the TPU-idiomatic shape for deep uniform stacks
    anyway. Returns hidden state ``tap`` (HF indexing: 0 = embedding
    output, i = output of layer i), or the last hidden if ``tap`` is
    None/num_layers.
    """
    import jax

    c = model.cfg
    h = nn.LayerNorm(epsilon=c.layer_norm_eps).apply(
        {"params": params["fp_layer_norm"]}, feats)
    h = nn.Dense(c.hidden).apply({"params": params["fp_projection"]}, h)
    if mask is not None:
        h = h * mask[..., None]
    layer = _W2VBertLayer(c)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[params[f"layers_{i}"] for i in range(c.num_layers)])

    tap_i = c.num_layers if tap is None else int(tap)
    if tap_i == 0:
        return h

    def body(carry, lp):
        out = layer.apply({"params": lp}, carry, mask)
        return out, None

    if tap_i == c.num_layers:
        out, _ = jax.lax.scan(body, h, stacked)
        return out
    # run `tap_i` layers scanned, discard the rest (they don't affect the
    # tapped state)
    first = jax.tree_util.tree_map(lambda p: p[:tap_i], stacked)
    out, _ = jax.lax.scan(body, h, first)
    return out
