"""Self-speculative greedy decode for the AR families (VERDICT r3 lever
(a)): draft k tokens with an EARLY-EXIT pass (the first ``draft_layers``
of the same decoder + the shared final-norm/head), then verify all k in
ONE chunked full-model forward over the KV cache. Greedy verification
emits exactly the full model's greedy tokens REGARDLESS of draft quality
(the property tests/test_speculative.py asserts), so the only effect of
a bad draft is wasted compute; each ACCEPTED draft token amortizes the
per-step weight stream k-fold.

Design notes (TPU-first):
- one KV cache: the draft layers ARE the full model's first layers, so
  draft K/V writes land in the same cache slots the verify chunk
  overwrites with identical values; rejected-position slots are garbage
  but sit beyond ``cache_index`` and the per-query causal bound keeps
  them unread until overwritten (modules/llama.py scale-after-dot path,
  per-query bound added round 4).
- the outer loop is a fixed-trip `lax.scan` (max_new iterations — every
  iteration emits ≥1 true token: the verify pass's own argmax), with a
  scatter-write output buffer; no data-dependent Python control flow.
- B = 1 (single-stream latency is the use case; batched serving already
  amortizes the weight stream without speculation).

Frontends: `ar_transformer_generate_speculative` (Vevo content-style AR)
and `valle_ar_generate_speculative` (VALL-E codebook-0 AR) share the
`_speculative_core` loop.

Performance is ACCEPTANCE-dependent: t_iter ≈ k·t_draft + t_verify(k+1)
and tokens/iter = m+1 (m = accepted drafts), so the speedup over plain
decode is (m+1)·t_step / t_iter. With random weights acceptance is
~chance — `bench.py --inproc vevo_spec_cost` measures the honest cost
side (worst-case RTF + speedup-vs-acceptance curve) on hardware.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from amphion_tpu.models.vc.ar_transformer import (
    ARTransformer,
    _quantize_for_decode,
)
from amphion_tpu.modules.llama import LlamaDecoder


def _speculative_core(*, caches, pref_len, first_logits, draft_step,
                      verify, eos_id, max_new, k):
    """Generic B=1 greedy speculative loop.

    draft_step(last (1,), dcaches, pos) -> (next (1,), dcaches)
    verify(chunk (1, k+1), caches, idx) -> (logits (1, k+1, V), caches)
    Returns (tokens (1, max_new), gen_len (1,)).
    """
    last = jnp.argmax(first_logits.astype(jnp.float32), axis=-1)  # (1,)

    def body(carry, _):
        caches, idx, last, n_gen, done = carry

        dcaches = caches
        dlast = last
        drafts = []
        for j in range(k):
            dlast, dcaches = draft_step(dlast, dcaches, idx + j)
            drafts.append(dlast)
        drafts = jnp.stack(drafts, axis=1)  # (1, k)

        chunk = jnp.concatenate([last[:, None], drafts], axis=1)
        logits, caches = verify(chunk, caches, idx)
        targets = jnp.argmax(logits.astype(jnp.float32), axis=-1)

        match = (drafts == targets[:, :k])
        m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)[0]
        emit_n = m + 1
        pos_in = jnp.arange(k + 1)
        emit_mask = (pos_in <= m) & (n_gen + pos_in < max_new) & (~done)
        is_eos = targets[0] == eos_id
        eos_before = jnp.cumsum(
            jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             is_eos.astype(jnp.int32)[:-1]])) > 0
        emit_mask = emit_mask & (~eos_before)
        # plain generate writes 0 in the EOS slot (tok_clean) and does
        # not count it in gen_len — mirror exactly for token identity
        emitted = jnp.where(emit_mask & (~is_eos), targets[0], -1)
        wrote = jnp.sum((emit_mask & (~is_eos)).astype(jnp.int32))
        done_new = done | jnp.any(is_eos & emit_mask) | (
            n_gen + jnp.sum(emit_mask.astype(jnp.int32)) >= max_new)

        last_new = targets[0, jnp.minimum(m, k)][None]
        idx_new = jnp.where(done, idx, idx + emit_n)
        out_pos = jnp.where(emit_mask, n_gen + jnp.cumsum(
            emit_mask.astype(jnp.int32)) - 1, max_new + k)  # drop slot
        n_gen_new = jnp.where(done, n_gen, n_gen + wrote)
        return ((caches, idx_new,
                 jnp.where(done, last, last_new), n_gen_new, done_new),
                (emitted, out_pos))

    # the prefill logits' argmax IS the first emitted token (plain
    # generate's step i=0 consumes them the same way)
    first_eos = last[0] == eos_id
    out0 = jnp.where(first_eos, 0, last[0])
    n_gen0 = jnp.where(first_eos, 0, 1).astype(jnp.int32)
    init = (caches, pref_len, last, n_gen0, first_eos)
    (_, _, _, n_gen, _), (em, pos) = jax.lax.scan(
        body, init, None, length=max_new)
    out = jnp.zeros((max_new + k + 1,), jnp.int32)
    out = out.at[0].set(out0)
    out = out.at[pos.reshape(-1)].set(
        jnp.maximum(em.reshape(-1), 0), mode="drop")
    return out[None, :max_new], n_gen[None]


def _draft_decoder(llama_cfg, decoder_params, draft_layers):
    dcfg = dataclasses.replace(llama_cfg, num_layers=draft_layers)
    draft = LlamaDecoder(dcfg)
    dparams = {f"layer_{i}": decoder_params[f"layer_{i}"]
               for i in range(draft_layers)}
    dparams["final_norm"] = decoder_params["final_norm"]
    return draft, dparams


# ---------------------------------------------------------------------------
# Vevo content-style AR (models/vc/ar_transformer.py)
# ---------------------------------------------------------------------------


def _verify_chunk(m: ARTransformer, toks, caches, cache_index):
    h = m.embed_tokens(toks)
    h, caches = m.decoder(h, caches=caches, cache_index=cache_index)
    return m.lm_head(h), caches


def _head(m: ARTransformer, h):
    return m.lm_head(h)


@functools.lru_cache(maxsize=16)
def _spec_jitted(model, max_new, draft_layers, k, compute_dtype):
    core = functools.partial(
        _ar_speculative_impl, model, max_new=max_new,
        draft_layers=draft_layers, k=k, compute_dtype=compute_dtype)
    return jax.jit(core)


def ar_transformer_generate_speculative(
        model: ARTransformer, params, input_tokens,
        max_new: int = 1024, draft_layers: int = 5, k: int = 4,
        compute_dtype: str = "bfloat16"):
    """Greedy zero-shot decode, token-identical to greedy
    `ar_transformer_generate` (top_k=1). Returns
    (tokens (1, max_new), gen_len (1,))."""
    assert input_tokens.shape[0] == 1, "speculative decode is B=1"
    return _spec_jitted(model, max_new, draft_layers, k, compute_dtype)(
        params, input_tokens)


def _ar_speculative_impl(model, params, input_tokens, *, max_new,
                         draft_layers, k, compute_dtype):
    model, params, dt = _quantize_for_decode(model, params, compute_dtype)
    c = model.cfg
    b, li = input_tokens.shape
    total = li + 2 + 1 + max_new + k + 2  # chunk-write headroom
    caches = LlamaDecoder(c.llama()).init_cache(b, total, dtype=dt)
    logits, caches, pref_len = model.apply(
        {"params": params}, input_tokens, caches, None, None, None,
        method=ARTransformer.prefill)

    draft, dparams = _draft_decoder(c.llama(), params["decoder"],
                                    draft_layers)
    embed_tab = params["embed_tokens"]["embedding"]

    def draft_step(dlast, dcaches, pos):
        h = jnp.take(embed_tab, dlast, axis=0)[:, None].astype(dt)
        sub = [dcaches[i] for i in range(draft_layers)]
        h, sub = draft.apply({"params": dparams}, h, caches=sub,
                             cache_index=pos)
        dl = model.apply({"params": params}, h[:, -1], method=_head)
        return (jnp.argmax(dl.astype(jnp.float32), axis=-1),
                list(sub) + list(dcaches[draft_layers:]))

    def verify(chunk, caches, idx):
        return model.apply({"params": params}, chunk, caches, idx,
                           method=_verify_chunk)

    return _speculative_core(
        caches=caches, pref_len=pref_len, first_logits=logits,
        draft_step=draft_step, verify=verify, eos_id=c.eos_id,
        max_new=max_new, k=k)


# ---------------------------------------------------------------------------
# VALL-E codebook-0 AR (models/tts/valle/valle.py)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _valle_spec_jitted(model, max_new, draft_layers, k, compute_dtype):
    core = functools.partial(
        _valle_speculative_impl, model, max_new=max_new,
        draft_layers=draft_layers, k=k, compute_dtype=compute_dtype)
    return jax.jit(core)


def valle_ar_generate_speculative(
        model, params, phones, prompt_tokens,
        max_new: int = 512, draft_layers: int = 4, k: int = 4,
        compute_dtype: str = "bfloat16"):
    """Greedy VALL-E AR continuation, token-identical to greedy
    `valle.ar_generate` (top_k=1)."""
    assert phones.shape[0] == 1, "speculative decode is B=1"
    return _valle_spec_jitted(model, max_new, draft_layers, k,
                              compute_dtype)(params, phones, prompt_tokens)


def _valle_verify(m, toks, caches, cache_index):
    emb = m.audio_embeds[0](toks)
    h, caches = m.ar(emb, caches=caches, cache_index=cache_index)
    return m.ar_head(h), caches


def _valle_head(m, h):
    return m.ar_head(h)


def _valle_speculative_impl(model, params, phones, prompt_tokens, *,
                            max_new, draft_layers, k, compute_dtype):
    from amphion_tpu.models.tts.valle.valle import VALLE, _prep_decode

    model, params, dt = _prep_decode(model, params, compute_dtype)
    c = model.cfg
    b, lp = phones.shape
    lt = prompt_tokens.shape[1]
    total = lp + lt + max_new + k + 2
    caches = LlamaDecoder(c.llama(False)).init_cache(b, total, dtype=dt)
    logits, caches = model.apply(
        {"params": params}, phones, prompt_tokens, caches,
        method=VALLE.ar_prefill)

    draft, dparams = _draft_decoder(c.llama(False), params["ar"],
                                    draft_layers)
    embed_tab = params["audio_embed_0"]["embedding"]

    def draft_step(dlast, dcaches, pos):
        h = jnp.take(embed_tab, dlast, axis=0)[:, None].astype(dt)
        sub = [dcaches[i] for i in range(draft_layers)]
        h, sub = draft.apply({"params": dparams}, h, caches=sub,
                             cache_index=pos)
        dl = model.apply({"params": params}, h[:, -1], method=_valle_head)
        return (jnp.argmax(dl.astype(jnp.float32), axis=-1),
                list(sub) + list(dcaches[draft_layers:]))

    def verify(chunk, caches, idx):
        return model.apply({"params": params}, chunk, caches, idx,
                           method=_valle_verify)

    return _speculative_core(
        caches=caches, pref_len=lp + lt, first_logits=logits,
        draft_step=draft_step, verify=verify, eos_id=c.eos_id,
        max_new=max_new, k=k)
