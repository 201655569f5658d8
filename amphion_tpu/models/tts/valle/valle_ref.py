"""Checkpoint-compatible VALL-E (reference `models/tts/valle/valle.py:25`).

The production TPU path is `valle.py` (RoPE Llama backbone + KV-cache
scan decode — a deliberate TPU-first redesign). This module reproduces
the reference architecture exactly so reference-trained checkpoints load
and match:

* `TokenEmbedding` text/audio embeddings (`modules/encoder/
  token_encoder.py:12`), `SinePositionalEmbedding` with a learnable
  ``alpha`` on the AR branch (`modules/transformer/
  position_embedding.py:11`: ``x + alpha * pe``; NAR alpha is fixed 1);
* vendored `TransformerEncoderLayer` stacks (`modules/transformer/
  transformer.py:19`): packed-QKV MHA, ReLU FFN, pre-/post-norm, and
  `AdaptiveLayerNorm` (`modules/norms/norm.py:81`: per-stage embedding →
  Linear(d, 2d) → ``w * LN(x) + b``) on the NAR branch with one stage
  embedding per quantizer (`valle.py:211-214`);
* AR: text block attends text only, audio rows attend text + causal
  audio (`_forward_ar_decoder`, `valle.py:337-352`); prediction head
  over ``audio_token_num + 1`` (EOS);
* NAR: stage j predicts codebook j from the sum of embeddings 0..j-1,
  prefix modes 0 (no prefix) and 1 (unmasked prefix region, targets
  sliced past it) (`_prepare_prompts`, `prompt_preparer.py:24-44`);
  `share_embedding` ties ``nar_predict_layers[j].weight`` to
  ``nar_audio_embeddings[j+2]`` (`valle.py:216-219`) — honoured by the
  converter.

`add_prenet` is not wired (the reference's released recipes disable it,
`config/valle.json:30`); prefix modes 2/4 are covered by
`nar_logits_prompted`, `continual` by `valle_ref_continual`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sine_positional_table(length: int, dim: int) -> np.ndarray:
    """torch-formula sinusoid table (position_embedding.py:36-50)."""
    position = np.arange(length, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float64)
                      * -(math.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


class SinePositionalEmbedding(nn.Module):
    dim: int
    learn_alpha: bool = False

    @nn.compact
    def __call__(self, x):
        pe = jnp.asarray(sine_positional_table(x.shape[1], self.dim))
        if self.learn_alpha:
            alpha = self.param("alpha", nn.initializers.ones, (1,))
        else:
            alpha = 1.0
        return x + alpha * pe[None]


class AdaptiveLayerNorm(nn.Module):
    """w·LN(x) + b from a projected stage embedding (norm.py:81-99)."""

    d_model: int

    @nn.compact
    def __call__(self, x, emb):
        wb = nn.Dense(2 * self.d_model, name="project_layer")(emb)
        w, b = jnp.split(wb, 2, axis=-1)
        return w * nn.LayerNorm(epsilon=1e-5, name="norm")(x) + b


class ValleEncoderLayer(nn.Module):
    """Vendored TransformerEncoderLayer (transformer.py:19): packed-QKV
    MHA + ReLU FFN, pre/post norm, optional adaptive layer norm."""

    d_model: int
    heads: int
    ffn_hidden: int
    norm_first: bool = True
    adaptive: bool = False

    @nn.compact
    def __call__(self, x, attn_bias=None, stage_emb=None):
        d, h = self.d_model, self.heads
        hd = d // h

        def norm(name, v):
            if self.adaptive:
                return AdaptiveLayerNorm(d, name=name)(v, stage_emb)
            return nn.LayerNorm(epsilon=1e-5, name=name)(v)

        def sa(v):
            qkv = nn.Dense(3 * d, name="in_proj")(v)
            q, k, w = jnp.split(qkv, 3, axis=-1)
            shape = (*v.shape[:2], h, hd)
            q = q.reshape(shape).transpose(0, 2, 1, 3) / jnp.sqrt(hd).astype(
                v.dtype)
            k = k.reshape(shape).transpose(0, 2, 1, 3)
            w = w.reshape(shape).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
            if attn_bias is not None:
                logits = logits + attn_bias
            a = jnp.einsum("bhqk,bhkd->bhqd",
                           jax.nn.softmax(logits, axis=-1), w)
            a = a.transpose(0, 2, 1, 3).reshape(v.shape)
            return nn.Dense(d, name="out_proj")(a)

        def ff(v):
            return nn.Dense(d, name="linear2")(
                nn.relu(nn.Dense(self.ffn_hidden, name="linear1")(v)))

        if self.norm_first:
            x = x + sa(norm("norm1", x))
            x = x + ff(norm("norm2", x))
        else:
            x = norm("norm1", x + sa(x))
            x = norm("norm2", x + ff(x))
        return x


@dataclass(frozen=True)
class ValleRefConfig:
    """cfg.model of the reference (`config/valle.json:24-34`)."""

    text_token_num: int = 512
    audio_token_num: int = 1024
    decoder_dim: int = 1024
    nhead: int = 16
    num_decoder_layers: int = 12
    num_quantizers: int = 8
    norm_first: bool = True
    prefix_mode: int = 0  # 0: no prefix | 1: prefix at beginning
    prepend_bos: bool = False


class ValleRef(nn.Module):
    cfg: ValleRefConfig

    def setup(self):
        c = self.cfg
        d = c.decoder_dim
        self.ar_text_embedding = nn.Embed(c.text_token_num, d)
        self.ar_audio_embedding = nn.Embed(
            c.audio_token_num + 1 + int(c.prepend_bos), d)
        self.ar_text_position = SinePositionalEmbedding(
            d, learn_alpha=True, name="ar_text_position")
        self.ar_audio_position = SinePositionalEmbedding(
            d, learn_alpha=True, name="ar_audio_position")
        self.ar_layers = [
            ValleEncoderLayer(d, c.nhead, 4 * d, c.norm_first,
                              name=f"ar_layer_{i}")
            for i in range(c.num_decoder_layers)
        ]
        self.ar_predict_layer = nn.Dense(c.audio_token_num + 1,
                                         use_bias=False)
        if c.norm_first:
            self.ar_final_norm = nn.LayerNorm(epsilon=1e-5,
                                              name="ar_final_norm")
        if c.num_quantizers > 1:
            self.nar_text_embedding = nn.Embed(c.text_token_num, d)
            self.nar_audio_embeddings = [
                nn.Embed(c.audio_token_num + (1 if j == 0 else 0), d,
                         name=f"nar_audio_embedding_{j}")
                for j in range(c.num_quantizers)
            ]
            self.nar_text_position = SinePositionalEmbedding(
                d, name="nar_text_position")
            self.nar_audio_position = SinePositionalEmbedding(
                d, name="nar_audio_position")
            self.nar_layers = [
                ValleEncoderLayer(d, c.nhead, 4 * d, c.norm_first,
                                  adaptive=True, name=f"nar_layer_{i}")
                for i in range(c.num_decoder_layers)
            ]
            self.nar_predict_layers = [
                nn.Dense(c.audio_token_num, use_bias=False,
                         name=f"nar_predict_{j}")
                for j in range(c.num_quantizers - 1)
            ]
            self.nar_stage_embeddings = [
                self.param(f"nar_stage_emb_{j}",
                           nn.initializers.normal(1.0), (self.cfg.decoder_dim,))
                for j in range(c.num_quantizers - 1)
            ]
            if c.norm_first:
                self.nar_final_norm = AdaptiveLayerNorm(
                    d, name="nar_final_norm")

    # -- AR branch ---------------------------------------------------------
    def _ar_bias(self, x_mask, y_mask):
        """Additive attention bias (B, 1, L, L): text rows attend valid
        text only; audio rows attend valid text + causal valid audio
        (ref `valle.py:337-365`). Masks are 1 for VALID positions."""
        b, x_len = x_mask.shape
        y_len = y_mask.shape[1]
        l_all = x_len + y_len
        allow_tt = jnp.ones((x_len, x_len), bool)
        allow_ty = jnp.zeros((x_len, y_len), bool)
        allow_yt = jnp.ones((y_len, x_len), bool)
        allow_yy = jnp.tril(jnp.ones((y_len, y_len), bool))
        allow = jnp.block([[allow_tt, allow_ty], [allow_yt, allow_yy]])
        valid = jnp.concatenate([x_mask, y_mask], axis=1) > 0  # (B, L)
        ok = allow[None] & valid[:, None, :]
        return jnp.where(ok, 0.0, -jnp.inf)[:, None].astype(jnp.float32)

    def ar_logits(self, text, y, x_mask, y_mask):
        """Teacher-forced AR logits over the audio region.

        text (B, S) ids, y (B, T) codebook-0 ids (with BOS already
        prepended when cfg.prepend_bos); masks are 1 for valid."""
        x = self.ar_text_position(self.ar_text_embedding(text))
        y_pos = self.ar_audio_position(self.ar_audio_embedding(y))
        xy = jnp.concatenate([x, y_pos], axis=1)
        bias = self._ar_bias(x_mask, y_mask)
        for layer in self.ar_layers:
            xy = layer(xy, bias)
        if self.cfg.norm_first:
            xy = self.ar_final_norm(xy)
        return self.ar_predict_layer(xy[:, text.shape[1]:])

    def ar_loss(self, text, codes0, x_mask, y_mask):
        """pad_y_eos semantics (ref `valle.py:732-742`): inputs are
        codes (masked to 0 on padding), targets shift-by-one with EOS
        (= audio_token_num) at each row's end."""
        c = self.cfg
        y_mask_int = 1 - y_mask.astype(jnp.int32)
        codes0 = codes0 * y_mask
        targets = jnp.pad(codes0, ((0, 0), (0, 1))) + c.audio_token_num * \
            jnp.pad(y_mask_int, ((0, 0), (0, 1)), constant_values=1)
        if c.prepend_bos:
            y_in = jnp.pad(targets[:, :-1], ((0, 0), (1, 0)),
                           constant_values=c.audio_token_num + 1)
            tgt = targets
            y_m = jnp.pad(y_mask, ((0, 0), (1, 0)), constant_values=1)
        else:
            y_in, tgt = targets[:, :-1], targets[:, 1:]
            y_m = y_mask
        logits = self.ar_logits(text, y_in, x_mask, y_m)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        # valid targets per row: the y_len real tokens' successors incl.
        # the EOS (with BOS the target stream gains one more position)
        y_len = jnp.sum(y_mask, axis=1).astype(jnp.int32)
        pos = jnp.arange(tgt.shape[1])[None]
        w = ((pos <= y_len[:, None]) if c.prepend_bos
             else (pos < y_len[:, None])).astype(jnp.float32)
        loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, {"ar_loss": loss}

    # -- NAR branch ----------------------------------------------------------
    def nar_logits(self, text, codes, nar_stage: int, x_mask, y_mask,
                   prefix_len: int = 0):
        """Stage-`nar_stage` logits (`nar_stage` is a static int — one
        compiled graph per stage, as in the reference's loop). codes
        (B, T, Q) full code matrix; prefix_mode 0: sum embeddings
        0..stage-1 over the whole sequence; prefix_mode 1: prompt region
        sums ALL quantizers, the rest sums 0..stage-1
        (ref `prompt_preparer.py:24-44`, inference `valle.py:560-605`)."""
        c = self.cfg
        nar_stage = int(nar_stage)
        y_emb = self.nar_audio_embeddings[0](codes[..., 0])
        if c.prefix_mode == 0:
            for j in range(1, nar_stage):
                y_emb = y_emb + self.nar_audio_embeddings[j](codes[..., j])
        else:  # prefix_mode == 1
            is_prefix = (jnp.arange(codes.shape[1])
                         < prefix_len)[None, :, None]
            for j in range(1, c.num_quantizers):
                e_j = self.nar_audio_embeddings[j](codes[..., j])
                if j < nar_stage:
                    y_emb = y_emb + e_j
                else:
                    y_emb = y_emb + jnp.where(is_prefix, e_j, 0.0)
        x = self.nar_text_position(self.nar_text_embedding(text))
        y_pos = self.nar_audio_position(y_emb)
        xy = jnp.concatenate([x, y_pos], axis=1)
        valid = jnp.concatenate([x_mask, y_mask], axis=1) > 0
        bias = jnp.where(valid[:, None, None, :], 0.0,
                         -jnp.inf).astype(jnp.float32)
        stage_emb = self.nar_stage_embeddings[nar_stage - 1]
        for layer in self.nar_layers:
            xy = layer(xy, bias, stage_emb)
        if self.cfg.norm_first:
            xy = self.nar_final_norm(xy, stage_emb)
        h = xy[:, text.shape[1]:]
        return self.nar_predict_layers[nar_stage - 1](h)

    def nar_logits_prompted(self, text, codes, prompt_codes, nar_stage: int,
                            x_mask, y_mask):
        """Prefix modes 2/4 (ref `prompt_preparer.py:46-68`): a SEPARATE
        prompt segment (random same-utterance chunk for mode 2, external
        `PromptedFeatures` for mode 4) is embedded with ALL quantizers and
        prepended; the target region sums quantizers 0..stage-1. Logits
        cover the target region only (`valle.py:420`)."""
        c = self.cfg
        nar_stage = int(nar_stage)
        y_prompts = self.nar_audio_embeddings[0](prompt_codes[..., 0])
        for j in range(1, c.num_quantizers):
            y_prompts = y_prompts + self.nar_audio_embeddings[j](
                prompt_codes[..., j])
        y_emb = self.nar_audio_embeddings[0](codes[..., 0])
        for j in range(1, nar_stage):
            y_emb = y_emb + self.nar_audio_embeddings[j](codes[..., j])
        y_full = jnp.concatenate([y_prompts, y_emb], axis=1)
        x = self.nar_text_position(self.nar_text_embedding(text))
        y_pos = self.nar_audio_position(y_full)
        xy = jnp.concatenate([x, y_pos], axis=1)
        lp = prompt_codes.shape[1]
        valid = jnp.concatenate(
            [x_mask, jnp.ones((x_mask.shape[0], lp)), y_mask], axis=1) > 0
        bias = jnp.where(valid[:, None, None, :], 0.0,
                         -jnp.inf).astype(jnp.float32)
        stage_emb = self.nar_stage_embeddings[nar_stage - 1]
        for layer in self.nar_layers:
            xy = layer(xy, bias, stage_emb)
        if self.cfg.norm_first:
            xy = self.nar_final_norm(xy, stage_emb)
        h = xy[:, text.shape[1] + lp:]
        return self.nar_predict_layers[nar_stage - 1](h)

    def nar_loss(self, text, codes, nar_stage: int, x_mask, y_mask,
                 prefix_len: int = 0):
        logits = self.nar_logits(text, codes, nar_stage, x_mask, y_mask,
                                 prefix_len)
        tgt = codes[..., int(nar_stage)]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        w = y_mask * (jnp.arange(y_mask.shape[1])[None] >= prefix_len)
        loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, {"nar_loss": loss}


def valle_ref_ar_generate(model: ValleRef, params, text, prompt_codes0,
                          rng=None, top_k: int = -100,
                          temperature: float = 1.0, max_new: int = 0):
    """Reference AR decode (`inference`, valle.py:445-535): full forward
    recompute per step (the reference has no KV cache), stop on EOS
    argmax/sample or the 16x length cap. Greedy when rng is None.
    Python loop (recompiles per length) — parity/debug path; use
    `valle.py` for production decode."""
    c = model.cfg
    b, s = text.shape
    assert b == 1
    y = prompt_codes0
    if c.prepend_bos:
        y = jnp.pad(y, ((0, 0), (1, 0)), constant_values=c.audio_token_num + 1)
    prompt_len = prompt_codes0.shape[1]
    cap = max_new if max_new else int(s) * 16
    x_mask = jnp.ones((1, s))
    while True:
        logits = model.apply(
            {"params": params}, text, y, x_mask, jnp.ones((1, y.shape[1])),
            method=ValleRef.ar_logits)[:, -1]
        if rng is None or top_k == 0:
            sample = jnp.argmax(logits, axis=-1)
        else:
            lg = logits / temperature
            if top_k > 0:
                kth = jnp.sort(lg, axis=-1)[:, -top_k][:, None]
                lg = jnp.where(lg < kth, -jnp.inf, lg)
            rng, sub = jax.random.split(rng)
            sample = jax.random.categorical(sub, lg, axis=-1)
        # ref stop rule (valle.py:524-534): EOS argmax/sample, or length
        # cap counted as y_len - prompt_len (the BOS counts toward it)
        if (int(jnp.argmax(logits, -1)[0]) == c.audio_token_num
                or int(sample[0]) == c.audio_token_num
                or y.shape[1] - prompt_len > cap):
            break
        y = jnp.concatenate([y, sample[:, None]], axis=1)
    return y[:, prompt_len + int(c.prepend_bos):]


def valle_ref_nar_generate(model: ValleRef, params, text, codes0,
                           prompt_codes, x_mask=None):
    """Reference NAR decode (valle.py:545-608): sequentially predict
    codebooks 1..Q-1 by argmax; the prompt region's embeddings carry the
    TRUE prompt codes per quantizer. codes0 (1, T) = AR output,
    prompt_codes (1, Lp, Q)."""
    c = model.cfg
    lp = prompt_codes.shape[1]
    t = codes0.shape[1]
    full = jnp.zeros((1, lp + t, c.num_quantizers), jnp.int32)
    full = full.at[:, :lp, :].set(prompt_codes)
    full = full.at[:, lp:, 0].set(codes0)
    outs = [codes0]
    y_mask = jnp.ones((1, lp + t))
    if x_mask is None:
        x_mask = jnp.ones((1, text.shape[1]))
    for stage in range(1, c.num_quantizers):
        logits = model.apply(
            {"params": params}, text, full, stage, x_mask, y_mask, lp,
            method=ValleRef.nar_logits)
        pred = jnp.argmax(logits[:, lp:], axis=-1)
        outs.append(pred)
        full = full.at[:, lp:, stage].set(pred)
    return jnp.stack(outs, axis=-1)  # (1, T, Q)


def valle_ref_continual(model: ValleRef, params, text, y):
    """Reference `continual` (valle.py:611-704): audio continuation —
    keep codebook 0 of the region past the prefix (min(T/2, 225) frames)
    and regenerate codebooks 1..Q-1 with the prefix as the NAR prompt."""
    prefix_len = min(int(y.shape[1] * 0.5), 3 * 75)
    return valle_ref_nar_generate(
        model, params, text, y[:, prefix_len:, 0], y[:, :prefix_len])
