"""Ragged batched MaskGCT sampling — many requests, one compiled program.

Serving-oriented generalization of `maskgct.py`'s fixed-shape samplers
(reference runs strictly batch-1 inference,
`models/tts/maskgct/maskgct_utils.py:237-330`): a batch of B requests with
per-sample prompt / phone / target lengths is packed into ONE static-shape
program. On TPU through the axon tunnel each dispatched program costs
~50 ms of latency regardless of size (BENCHMARKS.md), and the mask-predict
backbone is weight-HBM-bound at small batch — so batching B requests into
one sampler call multiplies serving throughput by ~B until the MXU
saturates.

Faithfulness: the model is TRAINED on right-padded sequences with
attention masks (`MaskGCTT2S.compute_loss` passes `x_mask`/`phone_mask`,
same as the reference trainer), and RoPE positions are `arange(L)` over
the padded layout (`modules/llama.py:250-255`). Packing each sample as
``[prompt_i | target_i | pad]`` therefore reproduces the exact positions
and masking a single-request run would see:

- per-sample lengths drive gather-based pack/unpack (no ragged shapes
  inside jit — static `Lp_max`/`T_max` buckets, per-sample index maps);
- the re-masking schedule count is per-sample
  ``floor(sin(t·π/2)·target_len_i)``;
- CFG std-rescale statistics are computed PER SAMPLE over valid positions
  (the fixed-shape path's global `jnp.std` is identical at B=1 — the only
  regime the reference ever runs — and would couple unrelated requests at
  B>1);
- every random draw comes from that sample's own key (a (B,) key array),
  so a batched run's TOKEN streams are bit-identical to B independent
  single-request runs — `tests/test_ragged_sampling.py` asserts this.
  (Float outputs downstream of the tokens match to ~1e-6: XLA compiles a
  separate program per batch size and the reduction order may differ.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.models.tts.maskgct.maskgct import (
    MaskGCTS2A,
    MaskGCTT2S,
    _gumbel,
    _topk_filter_frac,
)
from amphion_tpu.modules.llama import sinusoidal_step_embedding
from amphion_tpu.ops.ragged import (
    masked_std as _masked_std,
    pack_segments,
    split_each as _split_each,
    unpack_target,
)

# ---------------------------------------------------------------------------
# pack / unpack index maps
# ---------------------------------------------------------------------------


def pack_prefix_target(prefix: jax.Array, target: jax.Array,
                       prefix_len: jax.Array) -> jax.Array:
    """Per-sample ``[prefix_i | target_i | pad]`` layout.

    prefix (B, Lp, ...) right-padded, target (B, T, ...) right-padded,
    prefix_len (B,) — returns (B, Lp+T, ...). Positions past
    ``prefix_len_i + valid-target`` hold target padding; callers mask them.
    """
    b, t_max = target.shape[0], target.shape[1]
    full_t = jnp.full((b,), t_max, prefix_len.dtype)
    return pack_segments([prefix, target], [prefix_len, full_t])


def _vmapped_gumbel(keys: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """(B,) keys → (B, *shape) gumbel noise, per-sample streams."""
    return jax.vmap(lambda k: _gumbel(k, shape))(keys)


# ---------------------------------------------------------------------------
# T2S
# ---------------------------------------------------------------------------


def _t2s_step_ragged(mod: MaskGCTT2S, seq, mask, target_len, t, prompt_tokens,
                     prompt_len, phone_id, phone_len, cfg_scale, rescale_cfg):
    """One ragged reverse step → CFG'd logits in target space (B, T, V).

    Same math as `MaskGCTT2S.sample_step` with the prompt packed at each
    sample's own offset and per-sample std-rescale statistics."""
    b, t_max = seq.shape
    tvalid = jnp.arange(t_max)[None, :] < target_len[:, None]
    tok_emb = jnp.where(
        mask[..., None], mod.mask_emb[None, None, :], mod.cond_emb(seq)
    )
    prompt_emb = mod.cond_emb(prompt_tokens)
    # The phone prefix sits BEFORE the sequence (DiffLlamaPrefixEncoder), so
    # its padding would shift every downstream RoPE position — pack all three
    # segments compactly per sample and drive the inner encoder directly.
    phone_prefix = mod.backbone.cond_mlp(mod.phone_emb(phone_id))
    full = pack_segments(
        [phone_prefix.astype(tok_emb.dtype), prompt_emb, tok_emb],
        [phone_len, prompt_len, target_len],
    )
    pos = jnp.arange(full.shape[1])[None, :]
    x_mask = (
        pos < (phone_len + prompt_len + target_len)[:, None]
    ).astype(jnp.float32)
    d = mod.backbone.diff_step_mlp(
        sinusoidal_step_embedding(t, mod.backbone.cfg.hidden_size)
    ).astype(full.dtype)
    out = mod.backbone.encoder(full, cond=d, mask=x_mask)
    embeds = unpack_target(out, phone_len + prompt_len, t_max)
    # unconditional branch: no prompt, no phones — target space directly
    un = mod.estimate(tok_emb, t, tvalid.astype(jnp.float32))
    std_pos = _masked_std(embeds, tvalid).astype(embeds.dtype)
    g = embeds + cfg_scale * (embeds - un)
    g_rescaled = g * std_pos / jnp.maximum(
        _masked_std(g, tvalid).astype(g.dtype), 1e-6
    )
    g = rescale_cfg * g_rescaled + (1 - rescale_cfg) * g
    return mod.to_logit(g)


def _t2s_sample_ragged_impl(
    model: MaskGCTT2S,
    params,
    prompt_tokens: jax.Array,  # (B, Lp_max) right-padded
    prompt_len: jax.Array,  # (B,)
    phone_id: jax.Array,  # (B, Lph_max) right-padded
    phone_len: jax.Array,  # (B,)
    target_len: jax.Array,  # (B,)
    rngs: jax.Array,  # (B,) key array — one stream per request
    t_max: int,
    n_steps: int = 25,
    temp: float = 0.9,
    filter_thres: float = 0.98,
    cfg: float = 1.0,
    rescale_cfg: float = 0.75,
    compute_dtype: str = "bfloat16",
):
    dt = jnp.dtype(compute_dtype)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params
    )
    b = prompt_tokens.shape[0]
    t_list = np.asarray([1.0 - i / n_steps for i in range(n_steps + 1)],
                        np.float32)
    tvalid = jnp.arange(t_max)[None, :] < target_len[:, None]
    seq0 = jnp.zeros((b, t_max), jnp.int32)

    def body(carry, inp):
        seq, mask, rngs = carry
        step_i, t_val, t_next = inp
        rngs, r_samp, r_choice = _split_each(rngs, 3)
        t = jnp.full((b,), t_val)
        logits = model.apply(
            {"params": params}, seq, mask, target_len, t, prompt_tokens,
            prompt_len, phone_id, phone_len, cfg, rescale_cfg,
            method=_t2s_step_ragged,
        ).astype(jnp.float32)
        logits = _topk_filter_frac(logits, filter_thres)
        temp_i = jnp.maximum(temp * t_val, 1e-3)
        is_last = step_i == n_steps - 1
        gumbel_ids = jnp.argmax(
            logits / temp_i + _vmapped_gumbel(r_samp, logits.shape[1:]), axis=-1
        )
        sampled = jnp.where(is_last, jnp.argmax(logits, axis=-1), gumbel_ids)
        seq = jnp.where(mask, sampled, seq)

        probs = jax.nn.softmax(logits, axis=-1)
        conf = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
        scores = (1.0 - conf) + temp * t_val * _vmapped_gumbel(
            r_choice, conf.shape[1:]
        )
        scores = jnp.where(mask, scores, -jnp.inf)
        # per-sample re-mask count from each request's own schedule
        next_num = jnp.floor(
            jnp.sin(t_next * jnp.pi / 2) * target_len.astype(jnp.float32)
        ).astype(jnp.int32)
        order = jnp.argsort(-scores, axis=-1)
        rank = jnp.argsort(order, axis=-1)
        new_mask = (rank < next_num[:, None]) & mask
        seq = jnp.where(new_mask, 0, seq)
        return (seq, new_mask, rngs), None

    xs = (jnp.arange(n_steps), jnp.asarray(t_list[:-1]), jnp.asarray(t_list[1:]))
    (seq, _, _), _ = jax.lax.scan(body, (seq0, tvalid, rngs), xs)
    return jnp.where(tvalid, seq, 0)


@functools.lru_cache(maxsize=64)
def _t2s_ragged_jitted(model, t_max, n_steps, temp, filter_thres, cfg,
                       rescale_cfg, compute_dtype):
    core = functools.partial(
        _t2s_sample_ragged_impl, model, t_max=t_max, n_steps=n_steps,
        temp=temp, filter_thres=filter_thres, cfg=cfg,
        rescale_cfg=rescale_cfg, compute_dtype=compute_dtype,
    )
    return jax.jit(core)


def t2s_sample_ragged(model, params, prompt_tokens, prompt_len, phone_id,
                      phone_len, target_len, rngs, t_max, n_steps=25,
                      temp=0.9, filter_thres=0.98, cfg=1.0, rescale_cfg=0.75,
                      compute_dtype="bfloat16"):
    """Ragged batched text→semantic sampling; see module docstring.

    ``rngs`` is a (B,) `jax.random.key` array — one independent stream per
    request, so results are invariant to what else shares the batch."""
    fn = _t2s_ragged_jitted(model, int(t_max), n_steps, temp, filter_thres,
                            cfg, rescale_cfg, compute_dtype)
    return fn(params, jnp.asarray(prompt_tokens), jnp.asarray(prompt_len),
              jnp.asarray(phone_id), jnp.asarray(phone_len),
              jnp.asarray(target_len), rngs)


# ---------------------------------------------------------------------------
# S2A
# ---------------------------------------------------------------------------


def _s2a_step_ragged(mod: MaskGCTS2A, tokens_all, mask, target_len, layer, t,
                     semantic_packed, prompt_tokens_all, prompt_len,
                     cfg_scale, rescale_cfg=1.0):
    """Ragged `MaskGCTS2A.sample_layer_step`: per-sample prompt offsets.

    ``semantic_packed`` (B, Lp_max+T_max, D|int) must already be in the
    packed ``[sem_prompt_i | sem_target_i | pad]`` layout
    (`pack_prefix_target` builds it from right-padded halves)."""
    c = mod.cfg
    b, q_n, t_max = tokens_all.shape
    lp_max = prompt_tokens_all.shape[2]
    tvalid = jnp.arange(t_max)[None, :] < target_len[:, None]
    prompt_emb = jnp.zeros((b, lp_max, c.hidden), mod.mask_emb.dtype)
    for q in range(c.num_quantizers):
        prompt_emb = prompt_emb + mod.token_embs[q](prompt_tokens_all[:, q])
    cur = mod._xt(tokens_all, layer, mask, jnp.zeros((b, t_max), bool))
    x_emb = pack_prefix_target(prompt_emb, cur, prompt_len)
    cond = mod._cond_of(semantic_packed) + mod.layer_emb(layer)[:, None, :]
    pos = jnp.arange(lp_max + t_max)[None, :]
    am = (pos < (prompt_len + target_len)[:, None]).astype(jnp.float32)
    h = mod.backbone(x_emb, t, cond, mask=am)
    embeds_c = unpack_target(h, prompt_len, t_max)
    cond_t = unpack_target(cond, prompt_len, t_max)
    h_u = mod.backbone(cur, t, cond_t, mask=tvalid.astype(jnp.float32))
    std_pos = _masked_std(embeds_c, tvalid).astype(embeds_c.dtype)
    g = embeds_c + cfg_scale * (embeds_c - h_u)
    g_rescaled = g * std_pos / jnp.maximum(
        _masked_std(g, tvalid).astype(g.dtype), 1e-6
    )
    g = rescale_cfg * g_rescaled + (1 - rescale_cfg) * g
    return mod._layer_logits(g, layer)


def _s2a_sample_ragged_impl(
    model: MaskGCTS2A,
    params,
    semantic_packed: jax.Array,  # (B, Lp_max+T_max, D) or int (B, Lp_max+T_max)
    prompt_tokens_all: jax.Array,  # (B, Q, Lp_max) right-padded
    prompt_len: jax.Array,  # (B,)
    target_len: jax.Array,  # (B,)
    rngs: jax.Array,  # (B,) key array
    t_max: int,
    first_layer_steps: int = 16,
    rest_layer_steps: int = 1,
    temp: float = 1.0,
    cfg: float = 1.0,
    compute_dtype: str = "bfloat16",
):
    dt = jnp.dtype(compute_dtype)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params
    )
    if jnp.issubdtype(semantic_packed.dtype, jnp.floating):
        semantic_packed = semantic_packed.astype(dt)
    c = model.cfg
    b = prompt_tokens_all.shape[0]
    tvalid = jnp.arange(t_max)[None, :] < target_len[:, None]
    tokens = jnp.zeros((b, c.num_quantizers, t_max), jnp.int32)

    for q in range(c.num_quantizers):
        n_steps = first_layer_steps if q == 0 else rest_layer_steps
        layer = jnp.full((b,), q, jnp.int32)
        t_list = np.asarray(
            [1.0 - i / n_steps for i in range(n_steps + 1)], np.float32
        )

        def body(carry, inp):
            tokens, mask, rngs = carry
            step_i, t_val, t_next = inp
            rngs, r_s, r_c = _split_each(rngs, 3)
            t = jnp.full((b,), t_val)
            logits = model.apply(
                {"params": params}, tokens, mask, target_len, layer, t,
                semantic_packed, prompt_tokens_all, prompt_len, cfg,
                method=_s2a_step_ragged,
            ).astype(jnp.float32)
            temp_i = jnp.maximum(temp * t_val, 1e-3)
            sampled = jnp.argmax(
                logits / temp_i + _vmapped_gumbel(r_s, logits.shape[1:]), -1
            )
            sampled = jnp.where(
                step_i == n_steps - 1, jnp.argmax(logits, -1), sampled
            )
            cur = jnp.take_along_axis(tokens, layer[:, None, None], axis=1)[:, 0]
            cur = jnp.where(mask, sampled, cur)
            probs = jax.nn.softmax(logits, axis=-1)
            conf = jnp.take_along_axis(probs, sampled[..., None], -1)[..., 0]
            scores = jnp.where(
                mask,
                (1 - conf) + temp * t_val * _vmapped_gumbel(r_c, conf.shape[1:]),
                -jnp.inf,
            )
            next_num = jnp.floor(
                jnp.sin(t_next * jnp.pi / 2) * target_len.astype(jnp.float32)
            ).astype(jnp.int32)
            order = jnp.argsort(-scores, axis=-1)
            rank = jnp.argsort(order, axis=-1)
            new_mask = (rank < next_num[:, None]) & mask
            cur = jnp.where(new_mask, 0, cur)
            onehot = jax.nn.one_hot(
                layer, c.num_quantizers, dtype=tokens.dtype
            )[:, :, None]
            tokens = jnp.expand_dims(cur, 1) * onehot + tokens * (1 - onehot)
            return (tokens, new_mask, rngs), None

        xs = (jnp.arange(n_steps), jnp.asarray(t_list[:-1]),
              jnp.asarray(t_list[1:]))
        rngs, layer_rngs = _split_each(rngs, 2)
        (tokens, _, rest), _ = jax.lax.scan(body, (tokens, tvalid, layer_rngs), xs)
    return jnp.where(tvalid[:, None, :], tokens, 0)


@functools.lru_cache(maxsize=64)
def _s2a_ragged_jitted(model, t_max, first_layer_steps, rest_layer_steps,
                       temp, cfg, compute_dtype):
    core = functools.partial(
        _s2a_sample_ragged_impl, model, t_max=t_max,
        first_layer_steps=first_layer_steps,
        rest_layer_steps=rest_layer_steps, temp=temp, cfg=cfg,
        compute_dtype=compute_dtype,
    )
    return jax.jit(core)


def s2a_sample_ragged(model, params, semantic_packed, prompt_tokens_all,
                      prompt_len, target_len, rngs, t_max,
                      first_layer_steps=16, rest_layer_steps=1, temp=1.0,
                      cfg=1.0, compute_dtype="bfloat16"):
    """Ragged batched semantic→acoustic sampling; see module docstring."""
    fn = _s2a_ragged_jitted(model, int(t_max), first_layer_steps,
                            rest_layer_steps, temp, cfg, compute_dtype)
    return fn(params, jnp.asarray(semantic_packed),
              jnp.asarray(prompt_tokens_all), jnp.asarray(prompt_len),
              jnp.asarray(target_len), rngs)
