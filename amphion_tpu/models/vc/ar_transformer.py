"""Vevo autoregressive transformer: content tokens → content-style tokens.

Checkpoint-compatible re-design of the reference (reference:
`models/vc/autoregressive_transformer/ar_model.py:14` —
`AutoregressiveTransformer` wrapping `LlamaForCausalLM`, with an optional
global style/timbre encoder `global_encoder.py:59`; used by
Vevo-Voice/-Style and, with phone inputs, Vevo-TTS):

- ONE unified token space (ref ar_model.py:58-77): output ids raw in
  [0, output_vocab), input ids shifted by +output_vocab, then
  pad = in+out, input_bos/input_eos/output_bos/output_eos = pad+1..4,
  total vocab = input_vocab + output_vocab + 20.
- sequence protocol (ref `padding_for_input`/`padding_for_output`):
  [IN_BOS, shifted inputs, IN_EOS, PAD…] (+ global style embedding)
  [OUT_BOS, outputs, OUT_EOS, PAD…], teacher-forced shifted CE with
  -100-style label masking (loss includes predicting OUT_BOS, as the
  reference's HF loss does).
- decode is a fixed-size KV-cache `lax.scan` (TPU-native; the reference
  uses HF `generate`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.llama import (
    LlamaConfig,
    LlamaDecoder,
    LlamaEncoder,
)
from amphion_tpu.ops.sampling import sample_logits


@dataclass(frozen=True)
class ARTransformerConfig:
    input_vocab: int = 32  # content tokens (or phone vocab / 1056 for uni-training)
    output_vocab: int = 8192  # content-style tokens
    # optional middle prosody/style token stream — the Vevo1.5/VevoSing AR
    # variant (ref `models/svc/autoregressive_transformer/ar_model.py:24`:
    # content ids shifted by style+content_style, style ids by
    # content_style, six special tokens). 0 = the plain VC layout above.
    style_vocab: int = 0
    hidden: int = 1024
    intermediate: int | None = 4096
    num_layers: int = 16
    num_heads: int = 16
    max_position: int = 8192
    use_global_timbre: bool = False  # Vevo global style encoder option
    timbre_input_dim: int = 80  # mel dim fed to the global encoder
    timbre_hidden: int = 512
    timbre_heads: int = 4
    timbre_layers: int = 4
    # decode-time weight-only quantization ("none" | "int8" | "int4") —
    # see ar_transformer_generate(compute_dtype=...); kv_quant adds the
    # int8 KV cache. Default False HERE (training/eval configs), but
    # _quantize_for_decode turns it ON for quantized decode via the
    # scale-after-dot formulation, which measured FASTER (0.733 vs
    # 0.746 s/500 tok) — the earlier dequantize-the-cache variant was
    # the slower one (0.85 s). AMPHION_KV_QUANT=0 disables for A/B.
    decode_quant: str = "none"
    kv_quant: bool = False
    remat: bool = False  # rematerialize decoder blocks (memory lever)

    # -- unified token space (ref vc ar_model.py:58-62; svc ar_model.py
    # :54-65 when style_vocab > 0) --------------------------------------------
    @property
    def pad_id(self) -> int:
        return self.input_vocab + self.style_vocab + self.output_vocab

    @property
    def input_bos_id(self) -> int:
        return self.pad_id + 1

    @property
    def input_eos_id(self) -> int:
        return self.pad_id + 2

    @property
    def style_bos_id(self) -> int:
        return self.pad_id + 3

    @property
    def style_eos_id(self) -> int:
        return self.pad_id + 4

    @property
    def bos_id(self) -> int:  # output BOS
        return self.pad_id + (5 if self.style_vocab else 3)

    @property
    def eos_id(self) -> int:  # output EOS (decode stop token)
        return self.pad_id + (6 if self.style_vocab else 4)

    @property
    def input_shift(self) -> int:
        return self.style_vocab + self.output_vocab

    @property
    def total_vocab(self) -> int:
        # +20 headroom for post-training special tokens (ref ar_model.py:69)
        return self.input_vocab + self.style_vocab + self.output_vocab + 20

    def llama(self) -> LlamaConfig:
        return LlamaConfig(
            hidden_size=self.hidden, num_layers=self.num_layers,
            num_heads=self.num_heads, intermediate_size=self.intermediate,
            max_position=self.max_position, remat=self.remat,
            decode_quant=self.decode_quant, kv_quant=self.kv_quant,
        )


class GlobalTimbreEncoder(nn.Module):
    """Global style encoder (ref `global_encoder.py:59` GlobalEncoder):
    input MLP → bidirectional Llama layers → RMSNorm → output MLP →
    mean pool over time. The reference mean is unmasked — mirrored here."""

    output_dim: int
    hidden: int = 512
    num_heads: int = 4
    num_layers: int = 4

    @nn.compact
    def __call__(self, ref_mel, mask=None):
        h = nn.Dense(self.hidden * 4, name="in_0")(ref_mel)
        h = nn.silu(h)
        h = nn.Dense(self.hidden, name="in_1")(h)
        h = LlamaEncoder(LlamaConfig(
            hidden_size=self.hidden, num_layers=self.num_layers,
            num_heads=self.num_heads, intermediate_size=self.hidden * 4,
            max_position=4096,
        ), name="encoder")(h, mask=mask)
        h = nn.Dense(self.hidden * 4, name="out_0")(h)
        h = nn.silu(h)
        h = nn.Dense(self.output_dim, name="out_1")(h)
        return jnp.mean(h, axis=1)  # (B, output_dim)


def _pack_block(ids, mask, bos, eos, pad, shift):
    """Static-shape equivalent of the reference `padding_for_input/_output`
    (ar_model.py:173-237): (B, T) left-aligned valid tokens →
    (B, T+2) = [BOS, shifted tokens, EOS, PAD…] + its mask."""
    b, t = ids.shape
    k = jnp.sum(mask, axis=1).astype(jnp.int32)  # (B,) valid counts
    body = ((ids + shift) * mask).astype(jnp.int32)
    body = jnp.concatenate([body, jnp.zeros((b, 1), jnp.int32)], axis=1)
    pos = jnp.arange(t + 1)[None, :]
    body = jnp.where(pos < k[:, None], body,
                     jnp.where(pos == k[:, None], eos, pad))
    out_ids = jnp.concatenate(
        [jnp.full((b, 1), bos, jnp.int32), body], axis=1)
    out_mask = jnp.concatenate(
        [jnp.ones((b, 1), mask.dtype), (pos <= k[:, None]).astype(mask.dtype)],
        axis=1)
    return out_ids, out_mask


class ARTransformer(nn.Module):
    cfg: ARTransformerConfig

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.total_vocab, c.hidden)
        self.decoder = LlamaDecoder(c.llama())
        # The head streams (hidden × total_vocab ≈ 25 MB bf16 at Vevo
        # scale) every decode step — quantizing it looked like a ~20 ms
        # win on paper, but A/B-measured NEUTRAL on v5e (0.6412 vs
        # 0.6387 s/500 tok int4): XLA overlaps the bf16 head stream with
        # the step's other work, while the 9-program int4 GEMV adds its
        # own fixed cost. Kept bf16 — no speed win, no logit error.
        self.lm_head = nn.Dense(c.total_vocab, use_bias=False)
        if c.use_global_timbre:
            self.timbre_encoder = GlobalTimbreEncoder(
                output_dim=c.hidden, hidden=c.timbre_hidden,
                num_heads=c.timbre_heads, num_layers=c.timbre_layers,
            )

    def _blocks(self, input_tokens, input_mask, output_tokens, output_mask):
        c = self.cfg
        in_ids, in_m = _pack_block(
            input_tokens, input_mask, c.input_bos_id, c.input_eos_id,
            c.pad_id, c.input_shift)
        out_ids, out_m = _pack_block(
            output_tokens, output_mask, c.bos_id, c.eos_id, c.pad_id, 0)
        return in_ids, in_m, out_ids, out_m

    def forward(self, input_tokens, input_mask, output_tokens, output_mask,
                ref_mel=None, ref_mel_mask=None, style_tokens=None,
                style_mask=None):
        """Teacher-forced logits over the full packed sequence
        [input block (+ style emb) (+ style-token block), output block];
        (B, Lin(+Lsty)+Lout+4..6(+1), V). The style-token block is the
        Vevo1.5 prosody stream (ref svc ar_model.py:126-170)."""
        c = self.cfg
        in_ids, in_m, out_ids, out_m = self._blocks(
            input_tokens, input_mask, output_tokens, output_mask)
        in_emb = self.embed_tokens(in_ids)
        parts_emb = [in_emb]
        parts_mask = [in_m]
        if c.use_global_timbre and ref_mel is not None:
            if ref_mel_mask is None:
                ref_mel_mask = jnp.ones(ref_mel.shape[:2], in_m.dtype)
            style = self.timbre_encoder(ref_mel, ref_mel_mask)[:, None, :]
            parts_emb.append(style)
            parts_mask.append(jnp.ones_like(in_m[:, :1]))
        if style_tokens is not None:
            assert c.style_vocab > 0, "style stream needs style_vocab > 0"
            if style_mask is None:
                style_mask = jnp.ones(style_tokens.shape, in_m.dtype)
            sty_ids, sty_m = _pack_block(
                style_tokens, style_mask, c.style_bos_id, c.style_eos_id,
                c.pad_id, c.output_vocab)
            parts_emb.append(self.embed_tokens(sty_ids))
            parts_mask.append(sty_m)
        parts_emb.append(self.embed_tokens(out_ids))
        parts_mask.append(out_m)
        x = jnp.concatenate(parts_emb, axis=1)
        mask = jnp.concatenate(parts_mask, axis=1)
        h = self.decoder(x, mask=mask)
        return self.lm_head(h), out_ids, out_m

    def loss(self, input_tokens, input_mask, output_tokens, output_mask,
             ref_mel=None, ref_mel_mask=None, style_tokens=None,
             style_mask=None):
        """HF-style shifted CE: labels are -100 on the input block and pads,
        the OUTPUT block labels are [OUT_BOS, outputs, OUT_EOS] (the
        reference loss includes predicting OUT_BOS — ref ar_model.py:235)."""
        logits, out_ids, out_m = self.forward(
            input_tokens, input_mask, output_tokens, output_mask, ref_mel,
            ref_mel_mask, style_tokens, style_mask)
        lo = out_ids.shape[1]
        out_logits = logits[:, -lo - 1:-1]  # predict out block from prefix
        w = out_m.astype(jnp.float32)
        logp = jax.nn.log_softmax(out_logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, out_ids[..., None], axis=-1)[..., 0]
        loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
        acc = jnp.sum((out_logits.argmax(-1) == out_ids) * w) / jnp.maximum(
            jnp.sum(w), 1.0)
        return loss, {"ar_loss": loss, "ar_acc": acc}

    # -- decode helpers -----------------------------------------------------

    def prefill(self, input_tokens, caches, ref_mel=None,
                prompt_output_tokens=None, style_tokens=None):
        """Prompt = [IN_BOS, inputs, IN_EOS] (+ style emb)
        (+ [STY_BOS, styles, STY_EOS]) + [OUT_BOS, prompt outputs]
        (ref generate(), vc ar_model.py:240-300; svc ar_model.py:293-360
        concatenates content/style/prompt-output blocks). Valid (no-pad)
        inputs only — decode is per-utterance like the reference."""
        c = self.cfg
        b, li = input_tokens.shape
        in_ids = jnp.concatenate([
            jnp.full((b, 1), c.input_bos_id, jnp.int32),
            (input_tokens + c.input_shift).astype(jnp.int32),
            jnp.full((b, 1), c.input_eos_id, jnp.int32),
        ], axis=1)
        parts = [self.embed_tokens(in_ids)]
        if c.use_global_timbre and ref_mel is not None:
            style = self.timbre_encoder(
                ref_mel, jnp.ones(ref_mel.shape[:2], jnp.float32))[:, None, :]
            parts.append(style)
        if style_tokens is not None:
            sty_ids = jnp.concatenate([
                jnp.full((b, 1), c.style_bos_id, jnp.int32),
                (style_tokens + c.output_vocab).astype(jnp.int32),
                jnp.full((b, 1), c.style_eos_id, jnp.int32),
            ], axis=1)
            parts.append(self.embed_tokens(sty_ids))
        out_ids = [jnp.full((b, 1), c.bos_id, jnp.int32)]
        if prompt_output_tokens is not None:
            out_ids.append(prompt_output_tokens.astype(jnp.int32))
        parts.append(self.embed_tokens(jnp.concatenate(out_ids, axis=1)))
        x = jnp.concatenate(parts, axis=1)
        h, caches = self.decoder(x, caches=caches, cache_index=0)
        return self.lm_head(h[:, -1]), caches, x.shape[1]

    def prefill_ragged(self, input_tokens, input_len, caches, kv_valid,
                       prompt_output_tokens=None, prompt_output_len=None,
                       cache_index=0):
        """Ragged prefill for batched serving: B requests with per-sample
        content lengths packed RIGHT-aligned
        ``[pad | IN_BOS inputs_i IN_EOS | OUT_BOS (prompt outputs_i)]``
        (`ops/ragged.py` layout notes — exact under this RoPE backbone;
        pad slots masked via ``kv_valid``). ``input_tokens`` (B, Li_max)
        right-padded raw content ids + ``input_len`` (B,); the optional
        output-stream prompt (style prompting, ref vc ar_model.py:240-300)
        is right-padded ``prompt_output_tokens`` (B, Lo_max) +
        ``prompt_output_len`` (B,).

        ``cache_index`` offsets the packed window inside a larger cache:
        the window writes K/V at ``[cache_index, cache_index + l0)`` and
        RoPE positions shift with it (relative distances — and therefore
        the math — are unchanged). The per-slot continuous-batching
        engine (`serving/continuous.py`) admits each request at the
        start of its OWN cache row, so it always passes ``cache_index=0``
        and the admitted window lands at ``[0, l0)``; a nonzero offset
        is exercised by the ragged-placement tests and kept for callers
        that pack multiple windows into one row."""
        from amphion_tpu.ops.ragged import pack_segments_right

        c = self.cfg
        b, li = input_tokens.shape
        pos = jnp.arange(li + 2)[None, :]
        in_ids = jnp.concatenate([
            jnp.full((b, 1), c.input_bos_id, jnp.int32),
            (input_tokens + c.input_shift).astype(jnp.int32),
            jnp.zeros((b, 1), jnp.int32),
        ], axis=1)
        in_ids = jnp.where(pos == input_len[:, None] + 1, c.input_eos_id,
                           in_ids)
        out_ids = [jnp.full((b, 1), c.bos_id, jnp.int32)]
        out_lens = jnp.ones((b,), jnp.int32)
        if prompt_output_tokens is not None:
            out_ids.append(prompt_output_tokens.astype(jnp.int32))
            out_lens = out_lens + prompt_output_len.astype(jnp.int32)
        ids = pack_segments_right(
            [in_ids, jnp.concatenate(out_ids, axis=1)],
            [input_len.astype(jnp.int32) + 2, out_lens])
        h, caches = self.decoder(self.embed_tokens(ids), caches=caches,
                                 cache_index=cache_index, kv_valid=kv_valid)
        return self.lm_head(h[:, -1]), caches, ids.shape[1]

    def step(self, token, caches, cache_index, kv_valid=None):
        emb = self.embed_tokens(token)[:, None, :]
        h, caches = self.decoder(emb, caches=caches, cache_index=cache_index,
                                 kv_valid=kv_valid)
        return self.lm_head(h[:, -1]), caches

    def make_cache(self, batch, total_len):
        return self.decoder.init_cache(batch, total_len)


@functools.lru_cache(maxsize=32)
def _ar_generate_jitted(model, max_new, temperature, top_k, top_p,
                        compute_dtype, prompt_len, style_len):
    core = functools.partial(
        _ar_transformer_generate_impl, model, max_new=max_new,
        temperature=temperature, top_k=top_k, top_p=top_p,
        compute_dtype=compute_dtype,
    )
    return jax.jit(core)


def ar_transformer_generate(model, params, input_tokens, rng, max_new=1024,
                            temperature=1.0, top_k=40, top_p=1.0, ref_mel=None,
                            prompt_output_tokens=None, style_tokens=None,
                            compute_dtype="bfloat16"):
    """KV-cache sampled decode, fully jit-compiled. bf16 by default — the
    token-by-token loop is weight-HBM-bandwidth bound (sampling sees f32
    logits). Returns (tokens (B, max_new) raw output-vocab ids, lengths)."""
    plen = (0 if prompt_output_tokens is None
            else prompt_output_tokens.shape[1])
    slen = 0 if style_tokens is None else style_tokens.shape[1]
    return _ar_generate_jitted(model, max_new, temperature, top_k, top_p,
                               compute_dtype, plen, slen)(
        params, input_tokens, rng, ref_mel, prompt_output_tokens,
        style_tokens,
    )


def _ar_transformer_generate_impl(
    model: ARTransformer,
    params,
    input_tokens: jax.Array,
    rng: jax.Array,
    ref_mel: jax.Array | None = None,
    prompt_output_tokens: jax.Array | None = None,
    style_tokens: jax.Array | None = None,
    max_new: int = 1024,
    temperature: float = 1.0,
    top_k: int = 40,
    top_p: float = 1.0,
    compute_dtype: str = "bfloat16",
):
    """KV-cache sampled decode (ref `ar_model.py:240` generate), one
    lax.scan over sampled steps, stop at OUT_EOS."""
    model, params, dt = _quantize_for_decode(model, params, compute_dtype)
    c = model.cfg
    if ref_mel is not None:
        ref_mel = ref_mel.astype(dt)
    b, li = input_tokens.shape
    plen = 0 if prompt_output_tokens is None else prompt_output_tokens.shape[1]
    emb_len = 1 if (c.use_global_timbre and ref_mel is not None) else 0
    sty_len = 0 if style_tokens is None else style_tokens.shape[1] + 2
    total = li + 2 + emb_len + sty_len + 1 + plen + max_new
    caches = LlamaDecoder(c.llama()).init_cache(b, total, dtype=dt)
    logits, caches, pref_len = model.apply(
        {"params": params}, input_tokens, caches, ref_mel,
        prompt_output_tokens, style_tokens, method=ARTransformer.prefill
    )

    def body(carry, i):
        caches, logits, rng, gen_len, done = carry
        rng, r = jax.random.split(rng)
        tok = sample_logits(r, logits.astype(jnp.float32), temperature,
                            top_k, top_p)
        done_new = done | (tok == c.eos_id)
        tok_clean = jnp.where(done_new, 0, tok)
        logits_new, caches_new = model.apply(
            {"params": params}, tok_clean, caches, pref_len + i,
            method=ARTransformer.step,
        )
        gen_len = jnp.where(done_new, gen_len, i + 1)
        return (caches_new, logits_new, rng, gen_len, done_new), tok_clean

    init = (caches, logits, rng, jnp.zeros((b,), jnp.int32), jnp.zeros((b,), bool))
    (_, _, _, gen_len, _), toks = jax.lax.scan(body, init, jnp.arange(max_new))
    return jnp.moveaxis(toks, 0, 1), gen_len


def _decode_model_dtype(model, compute_dtype):
    """(model', dt) half of decode prep — host-metadata only (no array
    ops), so callers that must quantize INSIDE a jit (the continuous
    engine: int4 arrays cannot cross the jit boundary on this stack)
    can get the rebuilt model without touching params."""
    c = model.cfg
    if compute_dtype in ("int8", "int4"):
        import dataclasses
        import os as _os

        model = ARTransformer(dataclasses.replace(
            c, decode_quant=compute_dtype,
            kv_quant=_os.environ.get("AMPHION_KV_QUANT", "1") != "0"))
        return model, jnp.dtype(jnp.bfloat16)
    return model, jnp.dtype(compute_dtype)


def _decode_params(params, compute_dtype):
    """Param half of decode prep (trace-safe — may run under jit)."""
    if compute_dtype in ("int8", "int4"):
        from amphion_tpu.modules.llama import quantize_llama_params

        dt = jnp.dtype(jnp.bfloat16)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
        return {**params,
                "decoder": quantize_llama_params(params["decoder"],
                                                 compute_dtype)}
    dt = jnp.dtype(compute_dtype)
    return jax.tree_util.tree_map(
        lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)


def _quantize_for_decode(model, params, compute_dtype):
    """Shared decode-time dtype/quantization prep (bf16 | int8 | int4).

    int8 KV cache ON by default for quantized decode: the
    scale-after-dot formulation (scales applied to scores/probs,
    int8→bf16 convert fused inside the einsum operands) measured
    0.733 vs 0.746 s/500 tok on the Vevo AR. The first, dequantize-
    the-cache formulation measured SLOWER (0.85 s) — see BENCHMARKS.md.
    AMPHION_KV_QUANT=0 disables for A/B."""
    model, dt = _decode_model_dtype(model, compute_dtype)
    return model, _decode_params(params, compute_dtype), dt


@functools.lru_cache(maxsize=32)
def _ar_generate_ragged_jitted(model, max_new, temperature, top_k, top_p,
                               compute_dtype, has_prompt_out):
    core = functools.partial(
        _ar_generate_ragged_impl, model, max_new=max_new,
        temperature=temperature, top_k=top_k, top_p=top_p,
        compute_dtype=compute_dtype,
    )
    if not has_prompt_out:
        core = functools.partial(core, prompt_output_tokens=None,
                                 prompt_output_len=None)
    return jax.jit(core)


def ar_transformer_generate_ragged(model, params, input_tokens, input_len,
                                   rngs, max_new=1024, temperature=1.0,
                                   top_k=40, top_p=1.0,
                                   prompt_output_tokens=None,
                                   prompt_output_len=None,
                                   compute_dtype="bfloat16"):
    """Ragged batched Vevo AR decode: B requests with per-sample content
    (and optional output-prompt) lengths share ONE compiled prefill +
    decode scan — the serving path (`amphion_tpu/serving/VevoService`).
    The 780M-class decode is weight-HBM-bound, so batching B requests
    amortizes the per-token weight stream ~B× (until compute-bound).

    Inputs are right-padded buffers + (B,) length arrays; ``rngs`` is a
    (B,) key array so each request's sampling stream is independent of the
    batch composition (tests/test_ragged_vevo.py). Right-aligned packing
    is exact under RoPE (`ops/ragged.py`); pad slots are masked via
    ``kv_valid``. Global-timbre and prosody-style streams stay on the
    fixed-shape path. Returns (tokens (B, max_new), lengths (B,))."""
    assert not model.cfg.use_global_timbre, \
        "ragged decode supports the plain VC layout (no global encoder)"
    fn = _ar_generate_ragged_jitted(
        model, max_new, temperature, top_k, top_p, compute_dtype,
        prompt_output_tokens is not None)
    if prompt_output_tokens is not None:
        return fn(params, jnp.asarray(input_tokens),
                  jnp.asarray(input_len), rngs,
                  prompt_output_tokens=jnp.asarray(prompt_output_tokens),
                  prompt_output_len=jnp.asarray(prompt_output_len))
    return fn(params, jnp.asarray(input_tokens), jnp.asarray(input_len),
              rngs)


def _ar_generate_ragged_impl(
    model: ARTransformer,
    params,
    input_tokens: jax.Array,  # (B, Li_max) right-padded content ids
    input_len: jax.Array,  # (B,)
    rngs: jax.Array,  # (B,) key array
    prompt_output_tokens: jax.Array | None = None,  # (B, Lo_max)
    prompt_output_len: jax.Array | None = None,  # (B,)
    max_new: int = 1024,
    temperature: float = 1.0,
    top_k: int = 40,
    top_p: float = 1.0,
    compute_dtype: str = "bfloat16",
):
    from amphion_tpu.ops.ragged import right_pack_valid, split_each

    model, params, dt = _quantize_for_decode(model, params, compute_dtype)
    c = model.cfg
    b, li = input_tokens.shape
    lo = 1 if prompt_output_tokens is None else 1 + prompt_output_tokens.shape[1]
    l0 = li + 2 + lo  # shared prefill length; every sample ends at l0 - 1
    total = l0 + max_new
    out_lens = jnp.ones((b,), jnp.int32)
    if prompt_output_tokens is not None:
        out_lens = out_lens + prompt_output_len.astype(jnp.int32)
    kv_valid = right_pack_valid(
        [input_len.astype(jnp.int32) + 2, out_lens], l0, total)
    caches = LlamaDecoder(c.llama()).init_cache(b, total, dtype=dt)
    logits, caches, _ = model.apply(
        {"params": params}, input_tokens, input_len, caches, kv_valid,
        prompt_output_tokens, prompt_output_len,
        method=ARTransformer.prefill_ragged,
    )

    def body(carry, i):
        caches, logits, rngs, gen_len, done = carry
        rngs, r = split_each(rngs, 2)
        tok = jax.vmap(
            lambda k, lg: sample_logits(k, lg, temperature, top_k, top_p)
        )(r, logits.astype(jnp.float32))
        done_new = done | (tok == c.eos_id)
        tok_clean = jnp.where(done_new, 0, tok)
        logits_new, caches_new = model.apply(
            {"params": params}, tok_clean, caches, l0 + i, kv_valid,
            method=ARTransformer.step,
        )
        gen_len = jnp.where(done_new, gen_len, i + 1)
        return (caches_new, logits_new, rngs, gen_len, done_new), tok_clean

    init = (caches, logits, rngs, jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), bool))
    (_, _, _, gen_len, _), toks = jax.lax.scan(body, init, jnp.arange(max_new))
    return jnp.moveaxis(toks, 0, 1), gen_len
