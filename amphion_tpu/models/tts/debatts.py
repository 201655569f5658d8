"""DebaTTS: zero-shot rebuttal/debate-speech TTS.

Reference `models/tts/debatts/` (6.5k LoC incl. private hparam/util
copies). Two stages:

* **T2S** — `t2s_model.py:26` ``T2SLlama_new``: an AR Llama
  (``LlamaForCausalLM``) over a unified token space
  ``[prompt0 | phone | target]``. ``prompt0`` is the semantic-token
  stream of the *opponent's statement being rebutted* (its own
  BOS/EOS ids, no vocab shift — it shares the semantic vocab,
  `t2s_model.py:148-188`); phone ids are shifted by ``target_vocab``
  (`t2s_model.py:240`); only the target stream carries loss (labels
  are -100 on prompt0/phone, `t2s_model.py:262-291`). Inference
  (`sample_hf`, `t2s_model.py:311`) packs
  ``[prompt0+eos, phones, BOS_target + speaker-prompt semantics]`` and
  continues with HF sampling (temperature 0.3, top-k 30, top-p 0.7,
  repetition penalty 3.5, min 50 new tokens).
* **S2A** — SoundStorm: the MaskGCT-S2A masked-generative acoustic
  stage (`s2a_egs/s2a_debatts_full.json`: 12 quantizers, llama-style
  backbone, cond codebook 8192) — shared with our MaskGCT
  implementation.

The earlier draft of this file modelled T2S as a masked-generative
stage; this is the faithful AR rebuild (oracle-verified in
tests/test_weight_conversion.py::test_debatts_t2s).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from amphion_tpu.models.tts.dualcodec_tts import _apply_repetition_penalty
from amphion_tpu.models.tts.maskgct.maskgct import MaskGCTS2A, S2AConfig
from amphion_tpu.models.vc.ar_transformer import _pack_block
from amphion_tpu.modules.llama import LlamaConfig, LlamaDecoder
from amphion_tpu.ops.sampling import sample_logits


@dataclass(frozen=True)
class DebaTTST2SConfig:
    """Defaults = `t2s_egs/t2s_debatts.json` (phone 1024 / semantic 8192,
    8×2048 Llama); special-id layout = `t2s_model.py:36-42`."""

    phone_vocab: int = 1024
    target_vocab: int = 8192
    hidden: int = 2048
    intermediate: int | None = 8192
    num_layers: int = 8
    num_heads: int = 16
    max_position: int = 8192
    decode_quant: str = "none"
    remat: bool = False

    @property
    def pad_id(self) -> int:
        return self.phone_vocab + self.target_vocab

    @property
    def bos_target_id(self) -> int:
        return self.pad_id + 1

    @property
    def eos_target_id(self) -> int:
        return self.pad_id + 2

    @property
    def bos_phone_id(self) -> int:
        return self.pad_id + 3

    @property
    def eos_phone_id(self) -> int:
        return self.pad_id + 4

    @property
    def bos_prompt0_id(self) -> int:
        return self.pad_id + 5

    @property
    def eos_prompt0_id(self) -> int:
        return self.pad_id + 6

    @property
    def total_vocab(self) -> int:
        # +20 headroom, ref `t2s_model.py:119` vocab_size=phone+target+20
        return self.phone_vocab + self.target_vocab + 20

    def llama(self) -> LlamaConfig:
        return LlamaConfig(
            hidden_size=self.hidden, num_layers=self.num_layers,
            num_heads=self.num_heads, intermediate_size=self.intermediate,
            max_position=self.max_position, remat=self.remat,
            decode_quant=self.decode_quant,
        )


class DebaTTST2S(nn.Module):
    """AR text+opponent-context → semantic tokens (ref ``T2SLlama_new``)."""

    cfg: DebaTTST2SConfig

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.total_vocab, c.hidden)
        self.decoder = LlamaDecoder(c.llama())
        self.lm_head = nn.Dense(c.total_vocab, use_bias=False)

    def _pack(self, prompt0_ids, prompt0_mask, phone_ids, phone_mask,
              target_ids, target_mask):
        """Reference label packing (`t2s_model.py:219-291`): each block
        becomes [BOS, tokens(+shift), EOS, PAD…]; phones shift by
        ``target_vocab``; prompt0/target stay in the semantic vocab."""
        c = self.cfg
        p0_ids, p0_m = _pack_block(
            prompt0_ids, prompt0_mask, c.bos_prompt0_id, c.eos_prompt0_id,
            c.pad_id, 0)
        ph_ids, ph_m = _pack_block(
            phone_ids, phone_mask, c.bos_phone_id, c.eos_phone_id,
            c.pad_id, c.target_vocab)
        tg_ids, tg_m = _pack_block(
            target_ids, target_mask, c.bos_target_id, c.eos_target_id,
            c.pad_id, 0)
        return p0_ids, p0_m, ph_ids, ph_m, tg_ids, tg_m

    def forward(self, prompt0_ids, prompt0_mask, phone_ids, phone_mask,
                target_ids, target_mask):
        """Teacher-forced logits over [prompt0 | phone | target] blocks,
        (B, Lp0+Lph+Ltg+6, V); returns the packed target block too."""
        p0_ids, p0_m, ph_ids, ph_m, tg_ids, tg_m = self._pack(
            prompt0_ids, prompt0_mask, phone_ids, phone_mask,
            target_ids, target_mask)
        ids = jnp.concatenate([p0_ids, ph_ids, tg_ids], axis=1)
        mask = jnp.concatenate([p0_m, ph_m, tg_m], axis=1)
        h = self.decoder(self.embed_tokens(ids), mask=mask)
        return self.lm_head(h), tg_ids, tg_m

    def loss(self, prompt0_ids, prompt0_mask, phone_ids, phone_mask,
             target_ids, target_mask):
        """HF-style shifted CE: labels -100 outside the target block
        (ref forward passes labels to LlamaForCausalLM — loss covers
        predicting [BOS_target, targets, EOS_target])."""
        logits, tg_ids, tg_m = self.forward(
            prompt0_ids, prompt0_mask, phone_ids, phone_mask,
            target_ids, target_mask)
        lo = tg_ids.shape[1]
        tgt_logits = logits[:, -lo - 1:-1]
        w = tg_m.astype(jnp.float32)
        logp = jax.nn.log_softmax(tgt_logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, tg_ids[..., None], axis=-1)[..., 0]
        loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
        acc = jnp.sum((tgt_logits.argmax(-1) == tg_ids) * w) / jnp.maximum(
            jnp.sum(w), 1.0)
        return loss, {"t2s_loss": loss, "t2s_acc": acc}

    # -- decode ---------------------------------------------------------

    def prefill(self, ids, caches):
        h, caches = self.decoder(self.embed_tokens(ids), caches=caches,
                                 cache_index=0)
        return self.lm_head(h[:, -1]), caches

    def step(self, token, caches, cache_index):
        emb = self.embed_tokens(token)[:, None, :]
        h, caches = self.decoder(emb, caches=caches, cache_index=cache_index)
        return self.lm_head(h[:, -1]), caches

    def make_cache(self, batch, total_len, dtype=jnp.float32):
        return self.decoder.init_cache(batch, total_len, dtype=dtype)


def debatts_prefix_ids(cfg: DebaTTST2SConfig, prompt0_ids, phone_ids,
                       prompt_ids) -> jax.Array:
    """Inference prefix (ref `sample_hf` t2s_model.py:311-360): prompt0
    keeps its EOS, the speaker prompt drops its EOS ("continue mode").
    Valid (no-pad) inputs only — decode is per-utterance like the
    reference."""
    b = phone_ids.shape[0]
    full = lambda v: jnp.full((b, 1), v, jnp.int32)
    return jnp.concatenate([
        full(cfg.bos_prompt0_id), prompt0_ids.astype(jnp.int32),
        full(cfg.eos_prompt0_id),
        full(cfg.bos_phone_id),
        (phone_ids + cfg.target_vocab).astype(jnp.int32),
        full(cfg.eos_phone_id),
        full(cfg.bos_target_id), prompt_ids.astype(jnp.int32),
    ], axis=1)


@functools.lru_cache(maxsize=16)
def _debatts_generate_jitted(model, max_new, temperature, top_k, top_p,
                             repeat_penalty, min_new_tokens, compute_dtype):
    core = functools.partial(
        _debatts_generate_impl, model, max_new=max_new,
        temperature=temperature, top_k=top_k, top_p=top_p,
        repeat_penalty=repeat_penalty, min_new_tokens=min_new_tokens,
        compute_dtype=compute_dtype)
    return jax.jit(core)


def debatts_t2s_generate(model, params, prompt0_ids, phone_ids, prompt_ids,
                         rng, max_new=1024, temperature=0.3, top_k=30,
                         top_p=0.7, repeat_penalty=3.5, min_new_tokens=50,
                         compute_dtype="bfloat16"):
    """KV-cache decode with the reference's HF sampling knobs
    (`sample_hf` defaults: T=0.3, top-k 30, top-p 0.7, repetition
    penalty 3.5 over the full context, ≥50 new tokens). temperature<=0
    = greedy (token-exact vs HF `generate(do_sample=False)`). Returns
    (tokens (B, max_new), lengths)."""
    return _debatts_generate_jitted(
        model, max_new, temperature, top_k, top_p, repeat_penalty,
        min_new_tokens, compute_dtype)(
            params, prompt0_ids, phone_ids, prompt_ids, rng)


def _debatts_generate_impl(model, params, prompt0_ids, phone_ids, prompt_ids,
                           rng, max_new, temperature, top_k, top_p,
                           repeat_penalty, min_new_tokens, compute_dtype):
    c = model.cfg
    dt = jnp.dtype(compute_dtype)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
    ids = debatts_prefix_ids(c, prompt0_ids, phone_ids, prompt_ids)
    b, pref_len = ids.shape
    caches = LlamaDecoder(c.llama()).init_cache(b, pref_len + max_new,
                                                dtype=dt)
    logits, caches = model.apply({"params": params}, ids, caches,
                                 method=DebaTTST2S.prefill)
    # HF repetition penalty runs over input_ids + generated tokens
    seen = jnp.zeros((b, c.total_vocab), bool)
    seen = seen.at[jnp.arange(b)[:, None], ids].set(True)

    def body(carry, i):
        caches, logits, rng, seen, gen_len, done = carry
        rng, r = jax.random.split(rng)
        lg = _apply_repetition_penalty(
            logits.astype(jnp.float32), seen, repeat_penalty)
        # MinNewTokensLengthLogitsProcessor: EOS is unreachable early
        lg = lg.at[:, c.eos_target_id].set(jnp.where(
            i < min_new_tokens, -jnp.inf, lg[:, c.eos_target_id]))
        tok = sample_logits(r, lg, temperature, top_k, top_p)
        done_new = done | (tok == c.eos_target_id)
        tok_clean = jnp.where(done_new, 0, tok)
        seen = jnp.where(done[:, None], seen,
                         seen.at[jnp.arange(b), tok].set(True))
        logits_new, caches_new = model.apply(
            {"params": params}, tok_clean, caches, pref_len + i,
            method=DebaTTST2S.step)
        gen_len = jnp.where(done_new, gen_len, i + 1)
        return (caches_new, logits_new, rng, seen, gen_len, done_new), tok_clean

    init = (caches, logits, rng, seen, jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), bool))
    (_, _, _, _, gen_len, _), toks = jax.lax.scan(
        body, init, jnp.arange(max_new))
    return jnp.moveaxis(toks, 0, 1), gen_len


@dataclass(frozen=True)
class DebaTTSConfig:
    t2s: DebaTTST2SConfig = field(default_factory=DebaTTST2SConfig)
    # s2a_debatts_full.json: 12 quantizers over the 8192 semantic vocab
    s2a: S2AConfig = field(default_factory=S2AConfig)


class DebaTTS:
    """Two-stage assembly: AR T2S (opponent context via prompt0) +
    SoundStorm S2A (= MaskGCT S2A machinery)."""

    def __init__(self, cfg: DebaTTSConfig, params: dict):
        self.cfg = cfg
        self.t2s = DebaTTST2S(cfg.t2s)
        self.s2a = MaskGCTS2A(cfg.s2a)
        self.params = params

    def synthesize_semantic(self, opponent_semantic, prompt_semantic,
                            phone_id, rng, max_new=1024, **kw):
        """Rebuttal prompting: opponent statement → prompt0 block,
        speaker prompt → target-continuation block."""
        return debatts_t2s_generate(
            self.t2s, self.params["t2s"], opponent_semantic, phone_id,
            prompt_semantic, rng, max_new=max_new, **kw)
