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


def _filtered(logits, temperature, top_k, top_p):
    from amphion_tpu.ops.sampling import top_k_filter, top_p_filter

    l = logits.astype(jnp.float32) / max(temperature, 1e-6)
    return top_p_filter(top_k_filter(l, top_k), top_p)


def _speculative_core(*, caches, pref_len, first_logits, draft_step,
                      verify, eos_id, max_new, k, rng=None,
                      temperature=1.0, top_k=0, top_p=1.0):
    """Generic B=1 speculative loop.

    draft_step(last (1,), dcaches, pos) -> (logits (1, V), dcaches)
    verify(chunk (1, k+1), caches, idx) -> (logits (1, k+1, V), caches)

    ``rng=None`` → GREEDY verification (emits exactly the full model's
    argmax tokens). With ``rng``, standard speculative SAMPLING
    (Leviathan/Chen): draft token x_j ~ q_j is accepted with probability
    min(1, p_j(x_j)/q_j(x_j)); the first rejection resamples from the
    residual max(p−q, 0)/Z; all-accepted earns a bonus draw from p_k —
    the emitted sequence is distributed EXACTLY as plain sampling from
    the full model (distribution-level test in tests/test_speculative.py).
    Returns (tokens (1, max_new), gen_len (1,), n_iters (1,)).

    The outer loop is a `lax.while_loop` with EARLY EXIT (round 5;
    the round-4 fixed-trip `lax.scan` ran max_new iterations regardless
    of acceptance, so accepted drafts could never shorten wall-clock —
    the whole point of speculation). Each iteration emits ≥1 true
    token, so iterations ≈ tokens / (mean accepted + 1); ``n_iters``
    is returned so callers can compute the measured acceptance rate
    α = (gen_len/n_iters − 1)/k (the `vevo_spec_accept` bench)."""
    sampled = rng is not None

    def pick(lg, key):
        if not sampled:
            return jnp.argmax(lg.astype(jnp.float32), axis=-1)
        return jax.random.categorical(
            key, _filtered(lg, temperature, top_k, top_p), axis=-1)

    if sampled:
        rng, r0 = jax.random.split(rng)
    else:
        r0 = None
    last = pick(first_logits, r0)  # (1,)

    def body(carry):
        if sampled:
            caches, idx, last, n_gen, done, out, iters, key = carry
            keys = jax.random.split(key, k + 4)
            key_next, kd, ku, ky = keys[0], keys[1:k + 1], keys[k + 1], \
                keys[k + 2]
        else:
            caches, idx, last, n_gen, done, out, iters = carry

        dcaches = caches
        dlast = last
        drafts, dlogits = [], []
        for j in range(k):
            dl, dcaches = draft_step(dlast, dcaches, idx + j)
            dlast = pick(dl, kd[j] if sampled else None)
            drafts.append(dlast)
            dlogits.append(dl[0])
        drafts = jnp.stack(drafts, axis=1)  # (1, k)

        chunk = jnp.concatenate([last[:, None], drafts], axis=1)
        logits, caches = verify(chunk, caches, idx)

        if not sampled:
            targets = jnp.argmax(logits.astype(jnp.float32), axis=-1)
            match = (drafts == targets[:, :k])
            m = jnp.sum(jnp.cumprod(match.astype(jnp.int32),
                                    axis=1), axis=1)[0]
            emit_tok = targets[0]
            last_new = targets[0, jnp.minimum(m, k)][None]
        else:
            p = jax.nn.softmax(_filtered(logits[0], temperature, top_k,
                                         top_p), axis=-1)  # (k+1, V)
            q = jax.nn.softmax(_filtered(jnp.stack(dlogits), temperature,
                                         top_k, top_p), axis=-1)  # (k, V)
            x = drafts[0]  # (k,)
            px = jnp.take_along_axis(p[:k], x[:, None], axis=1)[:, 0]
            qx = jnp.take_along_axis(q, x[:, None], axis=1)[:, 0]
            u = jax.random.uniform(ku, (k,))
            acc = u < px / jnp.maximum(qx, 1e-30)
            m = jnp.sum(jnp.cumprod(acc.astype(jnp.int32)))
            # token at position m: residual resample (rejection) or the
            # bonus draw from p_k (all accepted; residual q = 0)
            p_sel = p[m]
            q_sel = jnp.where(m < k,
                              q[jnp.minimum(m, k - 1)], jnp.zeros_like(p_sel))
            res = jnp.maximum(p_sel - q_sel, 0.0)
            res = jnp.where(jnp.sum(res) > 1e-12, res, p_sel)
            y = jax.random.categorical(ky, jnp.log(res + 1e-30))
            emit_tok = jnp.where(jnp.arange(k + 1) < m, jnp.pad(x, (0, 1)),
                                 y)
            last_new = y[None]

        emit_n = m + 1
        pos_in = jnp.arange(k + 1)
        emit_mask = (pos_in <= m) & (n_gen + pos_in < max_new) & (~done)
        is_eos = emit_tok == eos_id
        eos_before = jnp.cumsum(
            jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             is_eos.astype(jnp.int32)[:-1]])) > 0
        emit_mask = emit_mask & (~eos_before)
        # plain generate writes 0 in the EOS slot (tok_clean) and does
        # not count it in gen_len — mirror exactly for token identity
        emitted = jnp.where(emit_mask & (~is_eos), emit_tok, -1)
        wrote = jnp.sum((emit_mask & (~is_eos)).astype(jnp.int32))
        done_new = done | jnp.any(is_eos & emit_mask) | (
            n_gen + jnp.sum(emit_mask.astype(jnp.int32)) >= max_new)

        idx_new = jnp.where(done, idx, idx + emit_n)
        out_pos = jnp.where(emit_mask, n_gen + jnp.cumsum(
            emit_mask.astype(jnp.int32)) - 1, max_new + k)  # drop slot
        n_gen_new = jnp.where(done, n_gen, n_gen + wrote)
        out = out.at[out_pos].set(jnp.maximum(emitted, 0), mode="drop")
        new_carry = (caches, idx_new, jnp.where(done, last, last_new),
                     n_gen_new, done_new, out, iters + 1)
        if sampled:
            new_carry = new_carry + (key_next,)
        return new_carry

    # the prefill logits' pick IS the first emitted token (plain
    # generate's step i=0 consumes them the same way)
    first_eos = last[0] == eos_id
    out = jnp.zeros((max_new + k + 1,), jnp.int32)
    out = out.at[0].set(jnp.where(first_eos, 0, last[0]))
    n_gen0 = jnp.where(first_eos, 0, 1).astype(jnp.int32)
    done0 = first_eos | (n_gen0 >= max_new)
    init = (caches, pref_len, last, n_gen0, done0, out,
            jnp.zeros((), jnp.int32))
    if sampled:
        init = init + (rng,)

    def cond(carry):
        return (~carry[4]) & (carry[6] < max_new)

    carry = jax.lax.while_loop(cond, body, init)
    n_gen, out, n_iters = carry[3], carry[5], carry[6]
    return out[None, :max_new], n_gen[None], n_iters[None]


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
def _spec_jitted(model, max_new, draft_layers, k, compute_dtype,
                 temperature, top_k, top_p, sampled):
    core = functools.partial(
        _ar_speculative_impl, model, max_new=max_new,
        draft_layers=draft_layers, k=k, compute_dtype=compute_dtype,
        temperature=temperature, top_k=top_k, top_p=top_p)
    if not sampled:
        core = functools.partial(core, rng=None)
    return jax.jit(core)


def ar_transformer_generate_speculative(
        model: ARTransformer, params, input_tokens, rng=None,
        max_new: int = 1024, draft_layers: int = 5, k: int = 4,
        temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
        compute_dtype: str = "bfloat16", return_iters: bool = False):
    """Speculative zero-shot decode. rng=None → greedy, token-identical
    to greedy `ar_transformer_generate` (top_k=1); with rng → exact
    speculative sampling under the same temperature/top-k/top-p
    transform as `sample_logits`. Returns (tokens (1, max_new),
    gen_len (1,)); with ``return_iters`` also the while-loop trip count
    (1,) — acceptance α = (gen_len/n_iters − 1)/k.

    Measured tuning guidance (vevo_spec_accept bench, overfit model,
    single v5e chip — BENCHMARKS.md speculative section): speedup needs
    α ≳ 0.5; the early-exit draft tracks the full model only when the
    model is confident, so on real checkpoints measure α on YOUR data
    before enabling (`VevoPipeline(speculative=k)`); k=4,
    draft_layers=5 is the measured sweet spot at high α."""
    assert input_tokens.shape[0] == 1, "speculative decode is B=1"
    fn = _spec_jitted(model, max_new, draft_layers, k, compute_dtype,
                      float(temperature), int(top_k), float(top_p),
                      rng is not None)
    out = (fn(params, input_tokens) if rng is None
           else fn(params, input_tokens, rng=rng))
    return out if return_iters else out[:2]


def _ar_speculative_impl(model, params, input_tokens, *, max_new,
                         draft_layers, k, compute_dtype, rng=None,
                         temperature=1.0, top_k=0, top_p=1.0):
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
        return dl, list(sub) + list(dcaches[draft_layers:])

    def verify(chunk, caches, idx):
        return model.apply({"params": params}, chunk, caches, idx,
                           method=_verify_chunk)

    return _speculative_core(
        caches=caches, pref_len=pref_len, first_logits=logits,
        draft_step=draft_step, verify=verify, eos_id=c.eos_id,
        max_new=max_new, k=k, rng=rng, temperature=temperature,
        top_k=top_k, top_p=top_p)


# ---------------------------------------------------------------------------
# VALL-E codebook-0 AR (models/tts/valle/valle.py)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _valle_spec_jitted(model, max_new, draft_layers, k, compute_dtype,
                       temperature, top_k, top_p, sampled):
    core = functools.partial(
        _valle_speculative_impl, model, max_new=max_new,
        draft_layers=draft_layers, k=k, compute_dtype=compute_dtype,
        temperature=temperature, top_k=top_k, top_p=top_p)
    if not sampled:
        core = functools.partial(core, rng=None)
    return jax.jit(core)


def valle_ar_generate_speculative(
        model, params, phones, prompt_tokens, rng=None,
        max_new: int = 512, draft_layers: int = 4, k: int = 4,
        temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
        compute_dtype: str = "bfloat16", return_iters: bool = False):
    """Speculative VALL-E AR continuation: greedy (rng=None,
    token-identical to greedy `valle.ar_generate`) or exact speculative
    sampling (with rng)."""
    assert phones.shape[0] == 1, "speculative decode is B=1"
    fn = _valle_spec_jitted(model, max_new, draft_layers, k,
                            compute_dtype, float(temperature), int(top_k),
                            float(top_p), rng is not None)
    out = (fn(params, phones, prompt_tokens) if rng is None
           else fn(params, phones, prompt_tokens, rng=rng))
    return out if return_iters else out[:2]


def _valle_verify(m, toks, caches, cache_index):
    emb = m.audio_embeds[0](toks)
    h, caches = m.ar(emb, caches=caches, cache_index=cache_index)
    return m.ar_head(h), caches


def _valle_head(m, h):
    return m.ar_head(h)


def _valle_speculative_impl(model, params, phones, prompt_tokens, *,
                            max_new, draft_layers, k, compute_dtype,
                            rng=None, temperature=1.0, top_k=0,
                            top_p=1.0):
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
        return dl, list(sub) + list(dcaches[draft_layers:])

    def verify(chunk, caches, idx):
        return model.apply({"params": params}, chunk, caches, idx,
                           method=_valle_verify)

    return _speculative_core(
        caches=caches, pref_len=lp + lt, first_logits=logits,
        draft_step=draft_step, verify=verify, eos_id=c.eos_id,
        max_new=max_new, k=k, rng=rng, temperature=temperature,
        top_k=top_k, top_p=top_p)
