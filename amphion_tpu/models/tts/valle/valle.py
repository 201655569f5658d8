"""VALL-E: zero-shot codec-language-model TTS (AR + NAR stages).

Same capability surface as the reference (reference:
`models/tts/valle/valle.py:25` — AR decoder over codec codebook 0 with phone
prefix + prompt continuation, NAR decoder over codebooks 1..7 conditioned on
the sum of lower codebooks and a stage embedding; two-stage training
`--train_stage 1|2`, top-k sampled AR decoding), re-designed TPU-first:

- both stages ride the shared Llama backbone (`amphion_tpu/modules/llama.py`);
  the NAR stage uses its adaptive RMSNorm conditioned on the stage embedding
  (the reference uses stage-specific LayerNorm params, `valle.py` AdaptiveLN);
- AR generation is a `lax.scan` over a static max length with a fixed-size KV
  cache and top-k sampling — one compiled program per shape bucket;
- training computes both losses from one batch: AR CE on codebook 0 and NAR
  CE on a randomly drawn stage j in [1, Q).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.llama import LlamaConfig, LlamaDecoder, LlamaEncoder
from amphion_tpu.ops.sampling import sample_logits


@dataclass(frozen=True)
class VALLEConfig:
    num_phones: int = 512
    audio_vocab: int = 1024  # EnCodec-style codebook size
    num_quantizers: int = 8
    hidden: int = 1024
    num_layers: int = 12
    num_heads: int = 16
    max_position: int = 4096
    remat: bool = False  # rematerialize decoder blocks (memory lever)
    # decode-time weight-only quantization of the AR decoder projections
    # ("none" | "int8"); use ar_generate(compute_dtype="int8").
    # kv_quant: int8 KV cache + fused Pallas decode attention (see
    # modules/llama.py) — enabled with quantized decode.
    decode_quant: str = "none"
    kv_quant: bool = False
    # NAR acoustic-prompt prefix mode (ref `valle.py:121`,
    # `utils/prompt_preparer.py`): 0 = no prefix; 1 = a random prefix of the
    # utterance conditions the NAR pass with ALL codebook embeddings and is
    # excluded from the loss (the reference recipe default,
    # `egs/tts/VALLE/exp_config.json:22`). Implemented mask-based so one
    # compiled program serves every prefix length.
    prefix_mode: int = 1
    max_prefix_len: int = 225  # ref prompt_preparer.py:35 (3 s at 75 Hz)

    @property
    def eos_id(self) -> int:
        return self.audio_vocab  # extra symbol appended to codebook-0 vocab

    def llama(self, adaptive: bool = False) -> LlamaConfig:
        return LlamaConfig(
            hidden_size=self.hidden,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            max_position=self.max_position,
            adaptive=adaptive,
            remat=self.remat,
            decode_quant="none" if adaptive else self.decode_quant,
            kv_quant=False if adaptive else self.kv_quant,
        )


class VALLE(nn.Module):
    cfg: VALLEConfig

    def setup(self):
        c = self.cfg
        self.phone_embed = nn.Embed(c.num_phones, c.hidden)
        # codebook 0 embedding has an extra EOS slot
        self.audio_embeds = [
            nn.Embed(c.audio_vocab + (1 if q == 0 else 0), c.hidden,
                     name=f"audio_embed_{q}")
            for q in range(c.num_quantizers)
        ]
        self.ar = LlamaDecoder(c.llama(False))
        self.nar = LlamaEncoder(c.llama(True))
        self.stage_embed = nn.Embed(c.num_quantizers - 1, c.hidden)
        self.ar_head = nn.Dense(c.audio_vocab + 1)
        self.nar_head = nn.Dense(c.audio_vocab)

    # ---- AR stage --------------------------------------------------------

    def ar_forward(self, phones, phone_mask, tokens, token_mask):
        """Teacher-forced AR logits. tokens: (B, T) codebook-0 ids.

        Returns logits (B, T+1, V+1) predicting tokens shifted by one plus
        EOS (input sequence = [phones; BOS-less tokens])."""
        c = self.cfg
        pe = self.phone_embed(phones)
        te = self.audio_embeds[0](tokens)
        x = jnp.concatenate([pe, te], axis=1)
        mask = jnp.concatenate([phone_mask, token_mask], axis=1)
        h = self.ar(x, mask=mask)
        lp = phones.shape[1]
        # positions predicting audio: last phone position predicts token 0,
        # token t predicts token t+1 (final one predicts EOS)
        h_audio = h[:, lp - 1 :]
        return self.ar_head(h_audio)

    def ar_loss(self, phones, phone_mask, tokens, token_mask):
        logits = self.ar_forward(phones, phone_mask, tokens, token_mask)
        c = self.cfg
        t = tokens.shape[1]
        targets = jnp.concatenate(
            [tokens, jnp.full_like(tokens[:, :1], c.eos_id)], axis=1
        )
        # weight: predict all real tokens + the EOS right after the last one
        w = jnp.concatenate([token_mask, jnp.zeros_like(token_mask[:, :1])], axis=1)
        lengths = jnp.sum(token_mask, axis=1).astype(jnp.int32)
        w = w.at[jnp.arange(w.shape[0]), lengths].set(1.0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)

    # ---- NAR stage -------------------------------------------------------

    def nar_forward(self, phones, phone_mask, tokens_all, token_mask, stage,
                    prompt_mask=None):
        """NAR logits for codebook ``stage`` (int array (B,) in [1, Q)).

        tokens_all: (B, Q, T) ground-truth codes; the input embedding sums
        codebooks < stage (ref `valle.py` NAR embedding sum). Where
        ``prompt_mask`` (B, T) is 1 the position is an acoustic prompt and
        ALL codebook embeddings are summed (ref
        `utils/prompt_preparer.py:36-43` prefix_mode 1)."""
        c = self.cfg
        pe = self.phone_embed(phones)
        # sum of embeddings of codebooks below `stage` (all in the prompt)
        acc = self.audio_embeds[0](tokens_all[:, 0])
        for q in range(1, c.num_quantizers):
            contrib = self.audio_embeds[q](tokens_all[:, q])
            take = jnp.broadcast_to((stage > q)[:, None], token_mask.shape)
            if prompt_mask is not None:
                take = jnp.logical_or(take, prompt_mask > 0)
            acc = acc + jnp.where(take[..., None], contrib, 0.0)
        x = jnp.concatenate([pe, acc], axis=1)
        mask = jnp.concatenate([phone_mask, token_mask], axis=1)
        cond = self.stage_embed(stage - 1)
        h = self.nar(x, cond=cond, mask=mask)
        return self.nar_head(h[:, phones.shape[1] :])

    def nar_loss(self, phones, phone_mask, tokens_all, token_mask, stage,
                 prompt_mask=None):
        logits = self.nar_forward(phones, phone_mask, tokens_all, token_mask,
                                  stage, prompt_mask)
        targets = jnp.take_along_axis(
            tokens_all, stage[:, None, None], axis=1
        )[:, 0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        w = token_mask
        if prompt_mask is not None:
            # prompt positions condition but are not predicted
            # (ref `valle.py:405` targets = targets[:, prefix_len:])
            w = w * (1.0 - prompt_mask)
        return -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)

    def train_loss(self, phones, phone_mask, tokens_all, token_mask, rng):
        """Joint training objective (both stages; the reference trains them
        in separate runs via --train_stage, both supported here)."""
        c = self.cfg
        ar = self.ar_loss(phones, phone_mask, tokens_all[:, 0], token_mask)
        rng, rng_p = jax.random.split(rng)
        stage = jax.random.randint(rng, (phones.shape[0],), 1, c.num_quantizers)
        prompt_mask = None
        if c.prefix_mode == 1:
            # prefix_len ~ U[low, 2*low), low = 0.25*min_len, capped at 225
            # (ref `utils/prompt_preparer.py:32-35`)
            lens = jnp.sum(token_mask, axis=1)
            low = (0.25 * jnp.min(lens)).astype(jnp.int32)
            plen = jax.random.randint(rng_p, (), 0, jnp.maximum(low, 1)) + low
            plen = jnp.minimum(plen, c.max_prefix_len)
            t = token_mask.shape[1]
            prompt_mask = (
                (jnp.arange(t)[None, :] < plen).astype(token_mask.dtype)
                * token_mask
            )
        nar = self.nar_loss(phones, phone_mask, tokens_all, token_mask, stage,
                            prompt_mask)
        return ar + nar, {"ar_loss": ar, "nar_loss": nar}

    # ---- generation ------------------------------------------------------

    def ar_prefill(self, phones, prompt_tokens, caches):
        """Prefill the KV cache with [phones; prompt]; returns (logits, caches)."""
        pe = self.phone_embed(phones)
        te = self.audio_embeds[0](prompt_tokens)
        x = jnp.concatenate([pe, te], axis=1)
        h, caches = self.ar(x, caches=caches, cache_index=0)
        return self.ar_head(h[:, -1]), caches

    def ar_prefill_ragged(self, phones, phone_len, prompt_tokens, prompt_len,
                          caches, kv_valid):
        """Ragged prefill: per-sample ``[pad | phones_i | prompt_i]`` packed
        right-aligned so every sample's last real token sits at the same
        position and decode appends at one shared cache index. Exact for
        this RoPE backbone (`ops/ragged.py` layout notes)."""
        from amphion_tpu.ops.ragged import pack_segments_right

        pe = self.phone_embed(phones)
        te = self.audio_embeds[0](prompt_tokens)
        x = pack_segments_right([pe, te], [phone_len, prompt_len])
        h, caches = self.ar(x, caches=caches, cache_index=0,
                            kv_valid=kv_valid)
        return self.ar_head(h[:, -1]), caches

    def ar_step(self, token, caches, cache_index, kv_valid=None):
        """One decode step: token (B,) → (logits (B, V+1), caches)."""
        emb = self.audio_embeds[0](token)[:, None, :]
        h, caches = self.ar(emb, caches=caches, cache_index=cache_index,
                            kv_valid=kv_valid)
        return self.ar_head(h[:, -1]), caches

    def make_cache(self, batch: int, total_len: int):
        return self.ar.init_cache(batch, total_len)

    def nar_generate(self, phones, phone_mask, tokens0, token_mask,
                     prompt_tokens=None):
        """Greedy NAR decoding of codebooks 1..Q-1 given codebook 0.

        ``prompt_tokens`` (B, Q, Tp): the enrolled prompt's full codec codes,
        prepended as an acoustic-prompt prefix whose ALL-codebook embeddings
        condition timbre (ref `valle.py:585-605` NAR inference: y_prompts
        sums nar_audio_embeddings[j](prompts[..., j])). Returns codes for
        the target region only, (B, Q, T)."""
        c = self.cfg
        b, t = tokens0.shape
        if prompt_tokens is None:
            all_tokens = jnp.zeros((b, c.num_quantizers, t), tokens0.dtype)
            all_tokens = all_tokens.at[:, 0].set(tokens0)
            full_mask, prompt_mask, tp = token_mask, None, 0
        else:
            tp = prompt_tokens.shape[2]
            all_tokens = jnp.concatenate([
                prompt_tokens.astype(tokens0.dtype),
                jnp.zeros((b, c.num_quantizers, t), tokens0.dtype)
                .at[:, 0].set(tokens0),
            ], axis=2)
            ones = jnp.ones((b, tp), token_mask.dtype)
            full_mask = jnp.concatenate([ones, token_mask], axis=1)
            prompt_mask = jnp.concatenate(
                [ones, jnp.zeros_like(token_mask)], axis=1)
        for q in range(1, c.num_quantizers):
            stage = jnp.full((b,), q, jnp.int32)
            logits = self.nar_forward(phones, phone_mask, all_tokens,
                                      full_mask, stage, prompt_mask)
            pred = jnp.argmax(logits, axis=-1)
            if prompt_mask is not None:
                pred = jnp.where(prompt_mask > 0, all_tokens[:, q], pred)
            all_tokens = all_tokens.at[:, q].set(pred)
        return all_tokens[:, :, tp:]


import functools


@functools.lru_cache(maxsize=32)
def _ar_generate_jitted(model, max_new, temperature, top_k, compute_dtype):
    core = functools.partial(
        _ar_generate_impl, model, max_new=max_new, temperature=temperature,
        top_k=top_k, compute_dtype=compute_dtype,
    )
    return jax.jit(core)


def ar_generate(model, params, phones, prompt_tokens, rng, max_new=512,
                temperature=1.0, top_k=50, compute_dtype="bfloat16"):
    """Sampled AR continuation, fully jit-compiled (eager scans cost ~100x
    through the TPU tunnel). Decode defaults to bf16 — the 750-step KV-cache
    loop is weight-HBM-bandwidth bound, so halving weight bytes ~halves
    ms/token; sampling still sees f32 logits."""
    return _ar_generate_jitted(model, max_new, temperature, top_k,
                               compute_dtype)(
        params, phones, prompt_tokens, rng
    )


def _decode_model_dtype(model, compute_dtype):
    """(model', dt) half of decode prep — host metadata only (see
    `ar_transformer._decode_model_dtype`)."""
    c = model.cfg
    if compute_dtype in ("int8", "int4"):
        import dataclasses
        import os as _os

        model = VALLE(dataclasses.replace(
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
        # quantize AFTER the bf16 cast so the f32 scales stay f32
        return {**params,
                "ar": quantize_llama_params(params["ar"], compute_dtype)}
    dt = jnp.dtype(compute_dtype)
    return jax.tree_util.tree_map(
        lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)


def _prep_decode(model, params, compute_dtype):
    """Cast params for decode; for int8/int4, quantize the AR projections
    (Pallas streaming matmul) while activations and scales stay bf16/f32."""
    model, dt = _decode_model_dtype(model, compute_dtype)
    return model, _decode_params(params, compute_dtype), dt


def _ar_generate_impl(
    model: VALLE,
    params,
    phones: jax.Array,
    prompt_tokens: jax.Array,
    rng: jax.Array,
    max_new: int = 512,
    temperature: float = 1.0,
    top_k: int = 50,
    compute_dtype: str = "bfloat16",
):
    """Sampled AR continuation of codebook-0 after [phones; prompt].

    Pure function over params — the decode loop is a `lax.scan` with a
    fixed-size KV cache (jit once per (shapes, max_new) bucket). Returns
    (tokens (B, max_new), lengths (B,)); positions past EOS are zero.
    """
    model, params, dt = _prep_decode(model, params, compute_dtype)
    c = model.cfg
    b, lp = phones.shape
    lt = prompt_tokens.shape[1]
    total = lp + lt + max_new
    caches = LlamaDecoder(c.llama(False)).init_cache(b, total, dtype=dt)
    logits, caches = model.apply(
        {"params": params}, phones, prompt_tokens, caches, method=VALLE.ar_prefill
    )

    def body(carry, i):
        caches, logits, rng, gen_len, done = carry
        rng, r = jax.random.split(rng)
        tok = sample_logits(r, logits.astype(jnp.float32), temperature, top_k)
        done_new = done | (tok == c.eos_id)
        tok_clean = jnp.where(done_new, 0, tok)
        logits_new, caches_new = model.apply(
            {"params": params}, tok_clean, caches, lp + lt + i,
            method=VALLE.ar_step,
        )
        gen_len = jnp.where(done_new, gen_len, i + 1)
        return (caches_new, logits_new, rng, gen_len, done_new), tok_clean

    init = (caches, logits, rng, jnp.zeros((b,), jnp.int32), jnp.zeros((b,), bool))
    (_, _, _, gen_len, _), toks = jax.lax.scan(body, init, jnp.arange(max_new))
    return jnp.moveaxis(toks, 0, 1), gen_len


@functools.lru_cache(maxsize=32)
def _ar_generate_ragged_jitted(model, max_new, temperature, top_k,
                               compute_dtype):
    core = functools.partial(
        _ar_generate_ragged_impl, model, max_new=max_new,
        temperature=temperature, top_k=top_k, compute_dtype=compute_dtype,
    )
    return jax.jit(core)


def ar_generate_ragged(model, params, phones, phone_len, prompt_tokens,
                       prompt_len, rngs, max_new=512, temperature=1.0,
                       top_k=50, compute_dtype="bfloat16"):
    """Ragged batched AR decode: B requests with per-sample phone/prompt
    lengths share ONE compiled prefill + decode scan (the serving path —
    `amphion_tpu/serving/`). Inputs are right-padded buffers + (B,) length
    arrays; ``rngs`` is a (B,) key array, one stream per request, so each
    result's token stream is bit-identical to serving that request alone
    (tests/test_ragged_ar.py).

    Internally the prompt is packed RIGHT-aligned (`ops/ragged.py`): exact
    for this RoPE backbone since attention scores depend only on relative
    positions; the pad prefix is masked out of every attention via
    ``kv_valid``."""
    fn = _ar_generate_ragged_jitted(model, max_new, temperature, top_k,
                                    compute_dtype)
    return fn(params, jnp.asarray(phones), jnp.asarray(phone_len),
              jnp.asarray(prompt_tokens), jnp.asarray(prompt_len), rngs)


def _ar_generate_ragged_impl(
    model: VALLE,
    params,
    phones: jax.Array,  # (B, Lph_max) right-padded
    phone_len: jax.Array,  # (B,)
    prompt_tokens: jax.Array,  # (B, Lt_max) right-padded
    prompt_len: jax.Array,  # (B,)
    rngs: jax.Array,  # (B,) key array
    max_new: int = 512,
    temperature: float = 1.0,
    top_k: int = 50,
    compute_dtype: str = "bfloat16",
):
    from amphion_tpu.ops.ragged import right_pack_valid, split_each

    model, params, dt = _prep_decode(model, params, compute_dtype)
    c = model.cfg
    b, lp = phones.shape
    lt = prompt_tokens.shape[1]
    l0 = lp + lt  # shared prefill length; every sample ends at l0 - 1
    total = l0 + max_new
    kv_valid = right_pack_valid([phone_len, prompt_len], l0, total)
    caches = LlamaDecoder(c.llama(False)).init_cache(b, total, dtype=dt)
    logits, caches = model.apply(
        {"params": params}, phones, phone_len, prompt_tokens, prompt_len,
        caches, kv_valid, method=VALLE.ar_prefill_ragged,
    )

    def body(carry, i):
        caches, logits, rngs, gen_len, done = carry
        rngs, r = split_each(rngs, 2)
        tok = jax.vmap(
            lambda k, lg: sample_logits(k, lg, temperature, top_k)
        )(r, logits.astype(jnp.float32))
        done_new = done | (tok == c.eos_id)
        tok_clean = jnp.where(done_new, 0, tok)
        logits_new, caches_new = model.apply(
            {"params": params}, tok_clean, caches, l0 + i, kv_valid,
            method=VALLE.ar_step,
        )
        gen_len = jnp.where(done_new, gen_len, i + 1)
        return (caches_new, logits_new, rngs, gen_len, done_new), tok_clean

    init = (caches, logits, rngs, jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), bool))
    (_, _, _, gen_len, _), toks = jax.lax.scan(body, init, jnp.arange(max_new))
    return jnp.moveaxis(toks, 0, 1), gen_len


def _nar_generate_ragged(mod: VALLE, phones, phone_len, tokens0, target_len,
                         prompt_tokens_all, prompt_len):
    """Ragged `nar_generate`: per-sample phone/prompt/target lengths.

    Everything runs in a per-sample compact layout
    ``[phones_i | prompt_i | target_i | pad]`` (ops/ragged.py) so RoPE
    positions match single-request runs; the NAR encoder is trained
    right-padded with masks, so the tail padding is exact. Greedy per
    stage (no RNG) — batch invariance needs no per-sample keys here.
    Returns (B, Q, T_max) target-region codes, zero past each length."""
    from amphion_tpu.ops.ragged import pack_segments, unpack_target

    c = mod.cfg
    b, t_max = tokens0.shape
    tp_max = prompt_tokens_all.shape[2]
    ttot = tp_max + t_max
    full_t = jnp.full((b,), t_max, prompt_len.dtype)
    # pack the audio stream (prompt ++ target) per sample; Q rides as the
    # trailing feature dim through the gather
    tgt_all = jnp.zeros((b, c.num_quantizers, t_max), tokens0.dtype)
    tgt_all = tgt_all.at[:, 0].set(tokens0)
    all_tokens = jnp.transpose(pack_segments(
        [jnp.transpose(prompt_tokens_all.astype(tokens0.dtype), (0, 2, 1)),
         jnp.transpose(tgt_all, (0, 2, 1))],
        [prompt_len, full_t],
    ), (0, 2, 1))  # (B, Q, Ttot)
    pos = jnp.arange(ttot)[None, :]
    prompt_mask = (pos < prompt_len[:, None]).astype(jnp.float32)
    token_mask = (pos < (prompt_len + target_len)[:, None]).astype(jnp.float32)

    pe = mod.phone_embed(phones)
    phone_mask_pos = jnp.arange(phones.shape[1])[None, :] < phone_len[:, None]

    for q in range(1, c.num_quantizers):
        stage = jnp.full((b,), q, jnp.int32)
        # embedding sum in packed audio space (same math as nar_forward)
        acc = mod.audio_embeds[0](all_tokens[:, 0])
        for j in range(1, c.num_quantizers):
            contrib = mod.audio_embeds[j](all_tokens[:, j])
            take = jnp.broadcast_to((stage > j)[:, None], (b, ttot))
            take = jnp.logical_or(take, prompt_mask > 0)
            acc = acc + jnp.where(take[..., None], contrib, 0.0)
        # compact [phones_i | audio_i | pad] — phone padding must not shift
        # the audio positions
        x = pack_segments([pe, acc], [phone_len, prompt_len + target_len])
        xpos = jnp.arange(x.shape[1])[None, :]
        mask = (
            xpos < (phone_len + prompt_len + target_len)[:, None]
        ).astype(jnp.float32)
        cond = mod.stage_embed(stage - 1)
        h = mod.nar(x, cond=cond, mask=mask)
        h_audio = unpack_target(h, phone_len, ttot)
        logits = mod.nar_head(h_audio)
        pred = jnp.argmax(logits, axis=-1)
        pred = jnp.where(prompt_mask > 0, all_tokens[:, q], pred)
        all_tokens = all_tokens.at[:, q].set(pred)

    target = jnp.transpose(unpack_target(
        jnp.transpose(all_tokens, (0, 2, 1)), prompt_len, t_max), (0, 2, 1))
    tvalid = jnp.arange(t_max)[None, None, :] < target_len[:, None, None]
    return jnp.where(tvalid, target, 0)


@functools.lru_cache(maxsize=32)
def _nar_generate_ragged_jitted(model, compute_dtype):
    def core(params, phones, phone_len, tokens0, target_len,
             prompt_tokens_all, prompt_len):
        dt = jnp.dtype(compute_dtype)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
        return model.apply(
            {"params": params}, phones, phone_len, tokens0, target_len,
            prompt_tokens_all, prompt_len, method=_nar_generate_ragged,
        )
    return jax.jit(core)


def nar_generate_ragged(model, params, phones, phone_len, tokens0,
                        target_len, prompt_tokens_all, prompt_len,
                        compute_dtype="bfloat16"):
    """Ragged batched NAR stage (greedy, one compiled program per bucket).

    int8/int4 requests map to bf16 here: weight-only AR-decode
    quantization does not apply to the NAR's plain forward passes, and
    naively casting params to an integer dtype would silently destroy
    them (the bug this guard fixes — `valle_generate_ragged` forwards
    the AR compute_dtype verbatim)."""
    if compute_dtype in ("int8", "int4"):
        compute_dtype = "bfloat16"
    fn = _nar_generate_ragged_jitted(model, compute_dtype)
    return fn(params, jnp.asarray(phones), jnp.asarray(phone_len),
              jnp.asarray(tokens0), jnp.asarray(target_len),
              jnp.asarray(prompt_tokens_all), jnp.asarray(prompt_len))


def valle_generate_ragged(model, params, phones, phone_len,
                          prompt_tokens_all, prompt_len, rngs, max_new=512,
                          temperature=1.0, top_k=50,
                          compute_dtype="bfloat16"):
    """Full ragged zero-shot decode: AR codebook-0 continuation + NAR fill.

    Serving composition (`amphion_tpu/serving/`): B requests with
    per-sample phone/prompt lengths → (codes (B, Q, max_new), gen_len (B,)).
    The acoustic prompt conditions the NAR pass as a prefix
    (ref `models/tts/valle/valle.py:585-605` NAR inference)."""
    toks0, gen_len = ar_generate_ragged(
        model, params, phones, phone_len, prompt_tokens_all[:, 0],
        prompt_len, rngs, max_new=max_new, temperature=temperature,
        top_k=top_k, compute_dtype=compute_dtype,
    )
    codes = nar_generate_ragged(
        model, params, phones, phone_len, toks0, gen_len,
        prompt_tokens_all, prompt_len, compute_dtype=compute_dtype,
    )
    return codes, gen_len
