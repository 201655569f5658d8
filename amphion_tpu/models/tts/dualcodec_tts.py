"""DualCodec TTS stack: VALLE-style AR + NAR over dual-stream codes, and
the VoiceBox flow-matching variant.

Reference: `models/codec/dualcodec/dualcodec/model_tts/` —
`valle_ar/llama_wrapper.py` (plain causal Llama LM over
[text, sep, semantic-codes, eos] with a unified offset vocab),
`valle_nar/valle_nar_model.py` (bidirectional Llama with adaptive RMSNorm
conditioned on a quantization-layer embedding; summed multi-stream code
embeddings — 16384-vocab 25 Hz semantic first layer + 4096-vocab acoustic
residual layers; per-layer LM heads), and `voicebox/voicebox_models.py`
(CFM mel infilling conditioned on upsampled semantic codes — expressed
here as `FlowMatchingTransformer(cond_scale_factor=...)`, the same model
family as Vevo FM).

TPU-first: the AR decode is a `lax.scan` KV-cache program with top-k/p
sampling and HF-semantics repetition penalty (tracked as a per-vocab
"seen" table); the NAR pass replaces the reference's dynamic
prompt-length slicing with prompt masks so shapes stay static under jit;
the per-layer LM heads and residual-stream embeddings are stacked
parameters indexed by the (traced) layer id instead of 7 separate
modules, so one compiled program serves every layer.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.modules.llama import (
    LlamaConfig,
    LlamaDecoder,
    LlamaEncoder,
)
from amphion_tpu.ops.sampling import sample_logits

# -------------------------------------------------------------------------
# AR stage: text → 25 Hz semantic codes
# -------------------------------------------------------------------------


@dataclass(frozen=True)
class DualARConfig:
    text_vocab: int = 51866  # whisper-tokenizer text ids
    speech_vocab: int = 16384  # dualcodec 25 Hz semantic stream
    initial_offset: int = 10  # ref llama_wrapper.py: speech ids shift
    sep_token: int = 3  # ref: "last text token used as offset"
    eos_id: int = 2
    hidden: int = 1024
    intermediate: int = 4096
    num_layers: int = 12
    num_heads: int = 16
    max_position: int = 4096

    @property
    def total_vocab(self) -> int:
        return self.speech_vocab + self.initial_offset + self.text_vocab

    def llama(self) -> LlamaConfig:
        return LlamaConfig(
            hidden_size=self.hidden, intermediate_size=self.intermediate,
            num_layers=self.num_layers, num_heads=self.num_heads,
            max_position=self.max_position)


class DualCodecValleAR(nn.Module):
    """Causal LM over [text+offset, SEP, semantic+offset, EOS]
    (ref `llama_wrapper.py` LLM). Batched training uses fixed-width
    text/speech blocks (masked pads); single-utterance decode is
    contiguous, matching the reference packing exactly."""

    cfg: DualARConfig

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.total_vocab, c.hidden)
        self.decoder = LlamaDecoder(c.llama())
        self.lm_head = nn.Dense(c.total_vocab, use_bias=False)

    def _pack(self, text_ids, text_mask, speech_ids, speech_mask):
        """[text][SEP][speech][EOS] blocks; returns ids, mask, labels
        (-100 on text/SEP/pad)."""
        c = self.cfg
        b, lt = text_ids.shape
        text = (text_ids + c.speech_vocab + c.initial_offset) * text_mask
        sp = (speech_ids + c.initial_offset) * speech_mask
        k = jnp.sum(speech_mask, axis=1).astype(jnp.int32)
        sp_eos = jnp.concatenate([sp, jnp.zeros((b, 1), sp.dtype)], axis=1)
        pos = jnp.arange(sp_eos.shape[1])[None]
        sp_eos = jnp.where(pos < k[:, None], sp_eos,
                           jnp.where(pos == k[:, None], c.eos_id, 0))
        sp_eos_mask = (pos <= k[:, None]).astype(speech_mask.dtype)
        ids = jnp.concatenate(
            [text.astype(jnp.int32),
             jnp.full((b, 1), c.sep_token, jnp.int32),
             sp_eos.astype(jnp.int32)], axis=1)
        mask = jnp.concatenate(
            [text_mask, jnp.ones((b, 1), text_mask.dtype), sp_eos_mask],
            axis=1)
        labels = jnp.concatenate(
            [jnp.full((b, lt + 1), -100, jnp.int32),
             jnp.where(sp_eos_mask > 0, sp_eos, -100).astype(jnp.int32)],
            axis=1)
        return ids, mask, labels

    def loss(self, text_ids, text_mask, speech_ids, speech_mask):
        """HF-style shifted CE over the speech block + EOS
        (ref `llama_wrapper.py` forward)."""
        ids, mask, labels = self._pack(text_ids, text_mask, speech_ids,
                                       speech_mask)
        h = self.decoder(self.embed_tokens(ids), mask=mask)
        logits = self.lm_head(h)
        shift_logits = logits[:, :-1]
        shift_labels = labels[:, 1:]
        w = (shift_labels >= 0).astype(jnp.float32)
        logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
        tgt = jnp.maximum(shift_labels, 0)
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
        acc = jnp.sum((shift_logits.argmax(-1) == tgt) * w) / jnp.maximum(
            jnp.sum(w), 1.0)
        return loss, {"ar_loss": loss, "ar_acc": acc}

    # -- decode ----------------------------------------------------------

    def prefill(self, text_ids, prompt_speech, caches):
        """[text+off, SEP, prompt_speech+off] (valid tokens only, B small);
        returns (last logits, caches, prompt_len)."""
        c = self.cfg
        b = text_ids.shape[0]
        ids = jnp.concatenate(
            [(text_ids + c.speech_vocab + c.initial_offset).astype(jnp.int32),
             jnp.full((b, 1), c.sep_token, jnp.int32),
             (prompt_speech + c.initial_offset).astype(jnp.int32)], axis=1)
        h, caches = self.decoder(self.embed_tokens(ids), caches=caches,
                                 cache_index=0)
        return self.lm_head(h[:, -1]), caches, ids.shape[1], ids

    def step(self, token, caches, cache_index):
        h, caches = self.decoder(self.embed_tokens(token)[:, None],
                                 caches=caches, cache_index=cache_index)
        return self.lm_head(h[:, -1]), caches


def _apply_repetition_penalty(logits, seen, penalty):
    """HF semantics: for every token already in the sequence,
    logit > 0 → logit/penalty, logit < 0 → logit*penalty."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


@functools.lru_cache(maxsize=16)
def _dual_ar_generate_jitted(model, max_new, temperature, top_k, top_p,
                             repeat_penalty):
    c = model.cfg

    @jax.jit
    def run(params, text_ids, prompt_speech, rng):
        def apply(method, *a):
            return model.apply({"params": params}, *a, method=method)

        b = text_ids.shape[0]
        total = text_ids.shape[1] + 1 + prompt_speech.shape[1] + max_new
        caches = LlamaDecoder(c.llama()).init_cache(b, total)
        logits, caches, plen, prompt_ids = apply(
            DualCodecValleAR.prefill, text_ids, prompt_speech, caches)
        seen0 = jnp.zeros((b, c.total_vocab), bool)
        seen0 = seen0.at[jnp.arange(b)[:, None], prompt_ids].set(True)

        def sample(logits, seen, r, done):
            logits = _apply_repetition_penalty(
                logits.astype(jnp.float32), seen, repeat_penalty)
            tok = sample_logits(r, logits, temperature=temperature,
                                top_k=top_k, top_p=top_p)
            tok = jnp.where(done, jnp.int32(c.eos_id), tok.astype(jnp.int32))
            return tok

        r0, rng = jax.random.split(rng)
        tok0 = sample(logits, seen0, r0, jnp.zeros((b,), bool))
        done0 = tok0 == c.eos_id
        seen0 = seen0.at[jnp.arange(b), tok0].set(True)

        def body(carry, step):
            tok, caches, seen, done, rng = carry
            logits, caches = apply(DualCodecValleAR.step, tok, caches,
                                   plen + step)
            r, rng = jax.random.split(rng)
            nxt = sample(logits, seen, r, done)
            seen = seen.at[jnp.arange(b), nxt].set(True)
            done = done | (nxt == c.eos_id)
            return (nxt, caches, seen, done, rng), nxt

        (_, _, _, _, _), nxts = jax.lax.scan(
            body, (tok0, caches, seen0, done0, rng), jnp.arange(max_new - 1))
        toks = jnp.concatenate([tok0[:, None], jnp.moveaxis(nxts, 0, 1)],
                               axis=1)
        lengths = jnp.sum((toks != c.eos_id).astype(jnp.int32), axis=1)
        return toks - c.initial_offset, lengths

    return run


def dual_ar_generate(model, params, text_ids, prompt_speech, rng,
                     max_new=1000, temperature=1.0, top_k=20, top_p=0.9,
                     repeat_penalty=1.1):
    """Sampled semantic-code continuation (ref `LLM.inference`: top-k/p +
    repetition penalty, EOS stop). Returns (codes (B, max_new) with EOS
    padding removed by `lengths`, lengths)."""
    return _dual_ar_generate_jitted(
        model, int(max_new), float(temperature), int(top_k), float(top_p),
        float(repeat_penalty))(params, text_ids, prompt_speech, rng)


# -------------------------------------------------------------------------
# NAR stage: semantic first layer → acoustic residual layers 1..7
# -------------------------------------------------------------------------


@dataclass(frozen=True)
class DualNARConfig:
    phone_vocab: int = 51866
    first_layer_vocab: int = 16384
    target_vocab: int = 4096
    hidden: int = 1024
    intermediate: int = 4096
    num_layers: int = 12
    num_heads: int = 16
    num_quantizers: int = 8
    max_position: int = 4096

    @property
    def head_vocab(self) -> int:
        # ref LlamaForNARModeling: lm_head out dim = config.vocab_size
        # = phone_vocab + target_vocab + 10
        return self.phone_vocab + self.target_vocab + 10

    def llama(self) -> LlamaConfig:
        return LlamaConfig(
            hidden_size=self.hidden, intermediate_size=self.intermediate,
            num_layers=self.num_layers, num_heads=self.num_heads,
            adaptive=True, max_position=self.max_position)


class DualCodecValleNAR(nn.Module):
    """Bidirectional adaptive-RMSNorm Llama predicting acoustic residual
    layer q from [phones, prompt frames (all 8 streams summed), target
    frames (streams < q summed)] (ref `valle_nar_model.py` ValleNAR).

    Static-shape reformulation: the reference slices the sequence at a
    random prompt length; here `prompt_mask` (B, T) marks prompt frames
    and each frame embedding selects full-sum (prompt) vs partial-sum
    (target) — identical math, one compiled program. The residual-stream
    embeddings (+1 slot for the token-dropout mask id) and the 7 LM heads
    are stacked params indexed by the traced layer id."""

    cfg: DualNARConfig

    def setup(self):
        c = self.cfg
        self.phone_embedder = nn.Embed(c.phone_vocab + 10, c.hidden)
        self.embed_first = nn.Embed(c.first_layer_vocab, c.hidden)
        self.embed_rest = self.param(
            "embed_rest", nn.initializers.normal(0.02),
            (c.num_quantizers - 1, c.target_vocab + 1, c.hidden))
        self.embed_cond = nn.Embed(c.num_quantizers, c.hidden)
        self.backbone = LlamaEncoder(c.llama())
        self.lm_heads = self.param(
            "lm_heads", nn.initializers.normal(0.02),
            (c.num_quantizers - 1, c.hidden, c.head_vocab))

    def _frame_embedding(self, codes, layer, prompt_mask):
        """codes (Q, B, T) → (B, T, H): prompt frames sum all Q streams,
        target frames sum streams < layer."""
        c = self.cfg
        emb = self.embed_first(codes[0])  # (B, T, H), always included
        rest = jnp.take(self.embed_rest.reshape(-1, c.hidden),
                        jnp.arange(c.num_quantizers - 1)[:, None, None]
                        * (c.target_vocab + 1) + codes[1:], axis=0)
        # stream q (index i = q-1) weight: 1 in prompt; 1 if q < layer
        q_ids = jnp.arange(1, c.num_quantizers)  # (Q-1,)
        in_target = (q_ids[:, None, None] < layer).astype(emb.dtype)
        w = jnp.where(prompt_mask[None] > 0, 1.0, in_target)
        return emb + jnp.sum(rest * w[..., None], axis=0)

    def forward(self, phone_ids, phone_mask, codes, frame_mask, layer,
                prompt_mask):
        """Returns logits (B, T_frames, head_vocab) for residual layer
        `layer` (traced int array), over ALL frames (caller masks to the
        target region)."""
        c = self.cfg
        phone_emb = self.phone_embedder(phone_ids)
        frames = self._frame_embedding(codes, layer, prompt_mask)
        x = jnp.concatenate([phone_emb, frames], axis=1)
        mask = jnp.concatenate([phone_mask, frame_mask], axis=1)
        cond = self.embed_cond(jnp.broadcast_to(jnp.asarray(layer),
                                                (x.shape[0],)))
        h = self.backbone(x, cond=cond, mask=mask)
        h = h[:, phone_emb.shape[1]:]
        head = jnp.take(self.lm_heads, layer - 1, axis=0)  # (H, V)
        return h @ head

    def loss(self, phone_ids, phone_mask, codes, frame_mask, rng,
             token_dropout: float = 0.0):
        """Training objective (ref ValleNAR.forward): random residual
        layer (uniform 1..Q-1), random prompt length in
        [min(T/4, 5), T/2), CE on non-prompt frames."""
        c = self.cfg
        r_layer, r_plen, r_drop = jax.random.split(rng, 3)
        b, t = codes.shape[1], codes.shape[2]
        layer = jax.random.randint(r_layer, (), 1, c.num_quantizers)
        lo = min(t // 4, 5)
        hi = max(t // 2, lo + 1)
        plen = jax.random.randint(r_plen, (b,), lo, hi)
        prompt_mask = (jnp.arange(t)[None, :] < plen[:, None]).astype(
            frame_mask.dtype)
        if token_dropout > 0:
            # ref randomly_set_elements: dropped target ids → mask slot
            drop = (jax.random.uniform(r_drop, codes[1:].shape)
                    < token_dropout)
            drop = drop & (prompt_mask[None] == 0)
            codes = codes.at[1:].set(
                jnp.where(drop, c.target_vocab, codes[1:]))
        logits = self.forward(phone_ids, phone_mask, codes, frame_mask,
                              layer, prompt_mask)
        target = jnp.take_along_axis(
            codes, jnp.broadcast_to(layer, (1, b, t)), axis=0)[0]
        w = frame_mask * (1.0 - prompt_mask)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
        acc = jnp.sum((logits.argmax(-1) == target) * w) / jnp.maximum(
            jnp.sum(w), 1.0)
        return loss, {"nar_loss": loss, "nar_acc": acc,
                      "nar_layer": layer.astype(jnp.float32)}


@functools.lru_cache(maxsize=16)
def _dual_nar_generate_jitted(model, prompt_len):
    c = model.cfg

    @jax.jit
    def run(params, phone_ids, prompt_codes, first_codes):
        """prompt_codes (Q, B, Lp); first_codes (B, Lt) — greedy per-layer
        NAR generation of residual layers 1..Q-1."""
        q, b, lp = prompt_codes.shape
        lt = first_codes.shape[1]
        t = lp + lt
        codes = jnp.concatenate(
            [prompt_codes,
             jnp.concatenate([first_codes[None],
                              jnp.zeros((q - 1, b, lt), jnp.int32)], axis=0)],
            axis=2)
        # fix up: layer 0 = [prompt layer0, first_codes]; rest prompt-only
        codes = codes.at[0].set(
            jnp.concatenate([prompt_codes[0], first_codes], axis=1))
        codes = codes.at[1:, :, :lp].set(prompt_codes[1:])
        prompt_mask = (jnp.arange(t)[None, :] < lp).astype(jnp.float32)
        phone_mask = jnp.ones(phone_ids.shape, jnp.float32)
        frame_mask = jnp.ones((b, t), jnp.float32)
        for layer in range(1, c.num_quantizers):
            logits = model.apply(
                {"params": params}, phone_ids, phone_mask, codes, frame_mask,
                jnp.asarray(layer), prompt_mask,
                method=DualCodecValleNAR.forward)
            pred = jnp.argmax(
                logits[..., :c.target_vocab].astype(jnp.float32), axis=-1)
            codes = codes.at[layer, :, lp:].set(pred[:, lp:])
        return codes[:, :, lp:]

    return run


def dual_nar_generate(model, params, phone_ids, prompt_codes, first_codes):
    """Greedy residual-layer completion: returns (Q, B, Lt) acoustic codes
    for the target region (ref `ValleNAR.sample_hf` layer loop)."""
    return _dual_nar_generate_jitted(model, int(prompt_codes.shape[2]))(
        params, phone_ids, prompt_codes, first_codes)
