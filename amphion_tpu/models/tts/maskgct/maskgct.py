"""MaskGCT: masked generative codec transformer (flagship zero-shot TTS).

Two stages, same capability surface as the reference (reference:
`models/tts/maskgct/maskgct_t2s.py:35` — T2S text→semantic with sin(t·π/2)
masking schedule, prompt-prefix conditioning, CFG with rescale, iterative
confidence-based re-masking `reverse_diffusion:226`;
`models/tts/maskgct/maskgct_s2a.py:35` — S2A semantic→acoustic over RVQ
layers, SoundStorm-style per-layer mask-predict `reverse_diffusion:318`;
backbone `llama_nar.py:202/427` adaptive-RMSNorm Llama), re-designed TPU-first:

- the backbone is the shared adaptive `LlamaEncoder` conditioned on the
  continuous mask-ratio timestep through adaLN;
- the ENTIRE iterative sampler is one `lax.scan`: re-mask counts come from a
  precomputed schedule and the top-k "keep most confident" selection is done
  with rank comparisons (static shapes, no per-step host sync) — the
  reference's python loop does ~50 sequential GPU dispatches per utterance;
- classifier-free guidance runs the conditional and unconditional branches
  inside the same compiled program.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.modules.llama import (DiffLlamaEncoder,
                                       DiffLlamaPrefixEncoder, LlamaConfig)


def _gumbel(rng, shape):
    u = jax.random.uniform(rng, shape, minval=1e-10, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def _topk_filter_frac(logits: jax.Array, thres: float) -> jax.Array:
    """Keep the top ceil((1-thres)·V) logits (ref `maskgct_t2s.py:14-19`).

    Uses lax.top_k, NOT a full sort — a full-vocab sort on the VPU was
    measured ~10x the cost of the entire backbone forward."""
    v = logits.shape[-1]
    k = max(1, int(np.ceil((1 - thres) * v)))
    vals = jax.lax.top_k(logits, k)[0]
    kth = vals[..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def mask_prob_schedule(t: jax.Array) -> jax.Array:
    """sin(t·π/2) masking ratio (ref `maskgct_t2s.py:110`)."""
    return jnp.sin(t * jnp.pi / 2.0)


# Unmasking schedules for the reverse pass: fraction of target positions
# still masked after the step at time t. "sin" is the reference's
# (`maskgct_t2s.py:110`; step COUNT is already config in the reference —
# `maskgct_t2s.py:226` — the schedule shape is the matching knob for the
# latency/quality frontier, BENCHMARKS.md maskgct_frontier).
_UNMASK_SCHEDULES = {
    "sin": lambda t: np.sin(t * np.pi / 2.0),
    "linear": lambda t: t,
    "pow2": lambda t: t * t,  # front-loads commitment (fewer late masks)
}


@dataclass(frozen=True)
class T2SConfig:
    hidden: int = 1024
    num_layers: int = 16
    num_heads: int = 16
    codebook_size: int = 8192  # semantic vocab
    phone_vocab: int = 1024
    cond_drop_prob: float = 0.2  # CFG dropout (ref `cfg_scale`)
    max_position: int = 8192
    remat: bool = False  # rematerialize backbone blocks (memory lever)

    def llama(self) -> LlamaConfig:
        # the reference builds DiffLlama layers with intermediate_size =
        # 4*hidden (llama_nar.py:214-219), not the Llama-2 8/3 convention
        return LlamaConfig(
            hidden_size=self.hidden, num_layers=self.num_layers,
            num_heads=self.num_heads, adaptive=True,
            intermediate_size=4 * self.hidden,
            max_position=self.max_position, remat=self.remat,
        )


class MaskGCTT2S(nn.Module):
    cfg: T2SConfig

    def setup(self):
        c = self.cfg
        self.phone_emb = nn.Embed(c.phone_vocab, c.hidden)
        self.cond_emb = nn.Embed(c.codebook_size, c.hidden)
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.normal(0.02), (c.hidden,)
        )
        # reference backbone exactly (DiffLlamaPrefix, llama_nar.py:427):
        # phone prefix through cond_mlp, diffusion step through adaLN
        self.backbone = DiffLlamaPrefixEncoder(c.llama())
        self.to_logit = nn.Dense(c.codebook_size)

    def estimate(self, x_emb, t, x_mask, phone_emb=None, phone_mask=None):
        """Run the backbone over [phone prefix; token embeddings]."""
        return self.backbone(x_emb, t, x_mask, phone_emb, phone_mask)

    def compute_loss(self, x0, x_mask, phone_id, phone_mask, rng):
        """Masked-token CE. x0: (B, T) semantic tokens."""
        c = self.cfg
        b, t_len = x0.shape
        r_t, r_mask, r_prompt, r_drop = jax.random.split(rng, 4)
        t = jnp.clip(jax.random.uniform(r_t, (b,)), 1e-5, 1.0)
        mp = jnp.maximum(mask_prob_schedule(t), 0.2)

        # prompt prefix of random length (dropped for CFG with cond_drop_prob)
        use_cond = jax.random.uniform(r_drop, (b,)) > c.cond_drop_prob
        max_pl = max(1, int(t_len * 0.4))
        prompt_len = jax.random.randint(r_prompt, (b,), 0, max_pl)
        prompt_len = jnp.where(use_cond, prompt_len, 0)
        pos = jnp.arange(t_len)[None, :]
        is_prompt = pos < prompt_len[:, None]

        mask = jax.random.bernoulli(r_mask, mp[:, None], (b, t_len))
        mask = mask & ~is_prompt
        # ensure at least one masked position per row
        none_masked = ~jnp.any(mask, axis=1)
        force = pos == prompt_len[:, None]
        mask = mask | (none_masked[:, None] & force)

        x_emb = jnp.where(
            mask[..., None], self.mask_emb[None, None, :], self.cond_emb(x0)
        )
        phone_emb = self.phone_emb(phone_id)
        # CFG: drop phone condition together with the prompt
        phone_mask_eff = phone_mask * use_cond[:, None].astype(phone_mask.dtype)
        logits = self.to_logit(
            self.estimate(x_emb, t, x_mask, phone_emb, phone_mask_eff)
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, x0[..., None], axis=-1)[..., 0]
        w = mask.astype(jnp.float32) * x_mask
        loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
        acc = jnp.sum((logits.argmax(-1) == x0) * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, {"t2s_loss": loss, "t2s_acc": acc}

    def sample_step(self, seq, mask, t, prompt_tokens, phone_id, cfg_scale,
                    rescale_cfg):
        """One reverse step: returns logits after CFG (B, T, V)."""
        c = self.cfg
        tok_emb = jnp.where(
            mask[..., None], self.mask_emb[None, None, :], self.cond_emb(seq)
        )
        prompt_emb = self.cond_emb(prompt_tokens)
        x_emb = jnp.concatenate([prompt_emb, tok_emb], axis=1)
        b, total = x_emb.shape[:2]
        x_mask = jnp.ones((b, total))
        phone_emb = self.phone_emb(phone_id)
        phone_mask = jnp.ones_like(phone_id, jnp.float32)
        embeds = self.estimate(x_emb, t, x_mask, phone_emb, phone_mask)
        embeds = embeds[:, prompt_tokens.shape[1] :]
        # unconditional branch: no prompt, no phones
        un = self.estimate(tok_emb, t, jnp.ones_like(mask, jnp.float32))
        # CFG with std rescale (ref `maskgct_t2s.py:296-305`)
        std_pos = jnp.std(embeds)
        g = embeds + cfg_scale * (embeds - un)
        g_rescaled = g * std_pos / jnp.maximum(jnp.std(g), 1e-6)
        g = rescale_cfg * g_rescaled + (1 - rescale_cfg) * g
        return self.to_logit(g)


import functools


@functools.lru_cache(maxsize=64)
def _t2s_sample_jitted(model, target_len, n_steps, temp, filter_thres, cfg,
                       rescale_cfg, compute_dtype, schedule="sin"):
    """Memoized jitted sampler per (model, static config) — calling the scan
    eagerly costs ~100x through the TPU tunnel (measured RTF 2.1 vs 0.02)."""
    core = functools.partial(
        _t2s_sample_impl, model, target_len=target_len, n_steps=n_steps,
        temp=temp, filter_thres=filter_thres, cfg=cfg, rescale_cfg=rescale_cfg,
        compute_dtype=compute_dtype, schedule=schedule,
    )
    return jax.jit(core)


def t2s_sample(
    model: MaskGCTT2S,
    params,
    prompt_tokens: jax.Array,  # (B, Lp) semantic prompt
    phone_id: jax.Array,  # (B, Lphone)
    target_len: int,
    rng: jax.Array,
    n_steps: int = 25,
    temp: float = 0.9,
    filter_thres: float = 0.98,
    cfg: float = 1.0,
    rescale_cfg: float = 0.75,
    compute_dtype: str = "bfloat16",
    schedule: str = "sin",
):
    """Iterative mask-predict decoding, fully jit-compiled (one program).
    bf16 by default: each of the 25 steps re-reads every weight from HBM;
    sampling/confidence math stays f32. ``n_steps`` and ``schedule`` span
    the latency/quality frontier (BENCHMARKS.md maskgct_frontier)."""
    fn = _t2s_sample_jitted(
        model, target_len, n_steps, temp, filter_thres, cfg, rescale_cfg,
        compute_dtype, schedule,
    )
    return fn(params, prompt_tokens, phone_id, rng)


def _t2s_sample_impl(
    model: MaskGCTT2S,
    params,
    prompt_tokens: jax.Array,
    phone_id: jax.Array,
    rng: jax.Array,
    target_len: int,
    n_steps: int = 25,
    temp: float = 0.9,
    filter_thres: float = 0.98,
    cfg: float = 1.0,
    rescale_cfg: float = 0.75,
    compute_dtype: str = "bfloat16",
    schedule: str = "sin",
):
    """Iterative mask-predict decoding as a single lax.scan."""
    dt = jnp.dtype(compute_dtype)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params
    )
    b = prompt_tokens.shape[0]
    t_list = np.asarray([1.0 - i / n_steps for i in range(n_steps + 1)], np.float32)
    # number of tokens still masked after each step
    sched = _UNMASK_SCHEDULES[schedule]
    next_mask_nums = np.asarray(
        [int(sched(t) * target_len) for t in t_list[1:]], np.int32
    )

    seq0 = jnp.zeros((b, target_len), jnp.int32)
    mask0 = jnp.ones((b, target_len), bool)

    def body(carry, inp):
        seq, mask, rng = carry
        step_i, t_val, next_num = inp
        rng, r_samp, r_choice = jax.random.split(rng, 3)
        t = jnp.full((b,), t_val)
        logits = model.apply(
            {"params": params}, seq, mask, t, prompt_tokens, phone_id,
            cfg, rescale_cfg, method=MaskGCTT2S.sample_step,
        )
        logits = logits.astype(jnp.float32)
        logits = _topk_filter_frac(logits, filter_thres)
        anneal = t_val
        temp_i = jnp.maximum(temp * anneal, 1e-3)
        is_last = step_i == n_steps - 1
        gumbel_ids = jnp.argmax(
            logits / temp_i + _gumbel(r_samp, logits.shape), axis=-1
        )
        greedy_ids = jnp.argmax(logits, axis=-1)
        sampled = jnp.where(is_last, greedy_ids, gumbel_ids)
        seq = jnp.where(mask, sampled, seq)

        probs = jax.nn.softmax(logits, axis=-1)
        conf = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
        scores = (1.0 - conf) + temp * anneal * _gumbel(r_choice, conf.shape)
        # only previously-masked positions are candidates for re-masking
        scores = jnp.where(mask, scores, -jnp.inf)
        # re-mask the next_num highest scores (least confident)
        order = jnp.argsort(-scores, axis=-1)
        rank = jnp.argsort(order, axis=-1)
        new_mask = (rank < next_num) & mask
        seq = jnp.where(new_mask, 0, seq)
        return (seq, new_mask, rng), None

    xs = (
        jnp.arange(n_steps),
        jnp.asarray(t_list[:-1]),
        jnp.asarray(next_mask_nums),
    )
    (seq, _, _), _ = jax.lax.scan(body, (seq0, mask0, rng), xs)
    return seq


# ---------------------------------------------------------------------------
# S2A — semantic → acoustic RVQ layers (SoundStorm-style)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class S2AConfig:
    hidden: int = 1024
    num_layers: int = 16
    num_heads: int = 16
    codebook_size: int = 1024  # acoustic codebook size per RVQ layer
    num_quantizers: int = 12
    cond_codebook_size: int = 8192  # semantic vocab (ref cond_codebook_size)
    semantic_dim: int = 384  # dim of continuous semantic features (proxy path)
    cond_drop_prob: float = 0.2
    max_position: int = 8192
    remat: bool = False

    def llama(self) -> LlamaConfig:
        # the reference builds DiffLlama layers with intermediate_size =
        # 4*hidden (llama_nar.py:214-219), not the Llama-2 8/3 convention
        return LlamaConfig(
            hidden_size=self.hidden, num_layers=self.num_layers,
            num_heads=self.num_heads, adaptive=True,
            intermediate_size=4 * self.hidden,
            max_position=self.max_position, remat=self.remat,
        )


class MaskGCTS2A(nn.Module):
    """Semantic → acoustic RVQ mask-predict model, reference-parity
    parameterization (ref `maskgct_s2a.py:35`): per-layer token embeddings
    and heads, one shared mask embedding, layer embedding added to the
    per-token conditioning, DiffLlama backbone (cond added to input through
    cond_mlp, diffusion step through adaLN).

    The conditioning is the embedded semantic tokens (``cond_emb``, the
    reference path) or projected continuous features (``sem_proj``, the
    self-contained mel-proxy path) — selected by the dtype of the
    ``semantic`` argument (integer = token ids)."""

    cfg: S2AConfig

    def setup(self):
        c = self.cfg
        self.token_embs = [
            nn.Embed(c.codebook_size, c.hidden, name=f"tok_emb_{q}")
            for q in range(c.num_quantizers)
        ]
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.normal(0.02), (c.hidden,)
        )
        self.cond_emb = nn.Embed(c.cond_codebook_size, c.hidden)
        self.sem_proj = nn.Dense(c.hidden)
        self.layer_emb = nn.Embed(c.num_quantizers, c.hidden)
        self.backbone = DiffLlamaEncoder(c.llama())
        self.heads = [
            nn.Dense(c.codebook_size, name=f"head_{q}")
            for q in range(c.num_quantizers)
        ]

    def _cond_of(self, semantic):
        """Semantic conditioning: token ids → cond_emb, floats → sem_proj."""
        if jnp.issubdtype(semantic.dtype, jnp.integer):
            return self.cond_emb(semantic)
        return self.sem_proj(semantic)

    def _xt(self, tokens_all, layer, mask, is_prompt):
        """Input embedding sum, reference `forward_diffusion` construction
        (maskgct_s2a.py:186-248): layers below `layer` contribute their
        real embeddings, the target layer mixes mask/real by `mask`, layers
        above contribute real embeddings on the prompt and the mask token
        elsewhere. tokens_all (B, Q, T); layer (B,)."""
        c = self.cfg
        mask_tok = self.mask_emb[None, None, :]
        x = jnp.zeros(
            (tokens_all.shape[0], tokens_all.shape[2], c.hidden),
            self.mask_emb.dtype,
        )
        for q in range(c.num_quantizers):
            emb_q = self.token_embs[q](tokens_all[:, q])
            below = (layer > q)[:, None, None]
            at = (layer == q)[:, None, None]
            above = (layer < q)[:, None, None]
            mixed_at = jnp.where(mask[..., None], mask_tok, emb_q)
            mixed_above = jnp.where(is_prompt[..., None], emb_q, mask_tok)
            x = x + below * emb_q + at * mixed_at + above * mixed_above
        return x

    def _layer_logits(self, h, layer):
        """Select per-item head output for its layer (B,)-varying."""
        outs = jnp.stack([head(h) for head in self.heads], axis=1)  # (B, Q, T, V)
        return jnp.take_along_axis(
            outs, layer[:, None, None, None], axis=1
        )[:, 0]

    def compute_loss(self, tokens_all, x_mask, semantic, rng):
        """tokens_all (B, Q, T); semantic: (B, T) ids or (B, T, D) feats."""
        c = self.cfg
        b, q_n, t_len = tokens_all.shape
        r_t, r_mask, r_layer, r_prompt, r_drop = jax.random.split(rng, 5)
        layer = jax.random.randint(r_layer, (b,), 0, c.num_quantizers)
        t = jnp.clip(jax.random.uniform(r_t, (b,)), 1e-5, 1.0)
        mp = jnp.maximum(mask_prob_schedule(t), 0.2)

        use_cond = jax.random.uniform(r_drop, (b,)) > c.cond_drop_prob
        max_pl = max(1, int(t_len * 0.4))
        prompt_len = jnp.where(
            use_cond, jax.random.randint(r_prompt, (b,), 0, max_pl), 0
        )
        pos = jnp.arange(t_len)[None, :]
        is_prompt = pos < prompt_len[:, None]

        mask = jax.random.bernoulli(r_mask, mp[:, None], (b, t_len)) & ~is_prompt
        none_masked = ~jnp.any(mask, axis=1)
        mask = mask | (none_masked[:, None] & (pos == prompt_len[:, None]))

        target = jnp.take_along_axis(tokens_all, layer[:, None, None], axis=1)[:, 0]
        x_emb = self._xt(tokens_all, layer, mask, is_prompt)
        cond = self._cond_of(semantic) + self.layer_emb(layer)[:, None, :]
        h = self.backbone(x_emb, t, cond, mask=x_mask)
        logits = self._layer_logits(h, layer)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        w = mask.astype(jnp.float32) * x_mask
        loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, {"s2a_loss": loss}

    def sample_layer_step(self, tokens_all, mask, layer, t, semantic,
                          prompt_tokens_all, cfg_scale, rescale_cfg=1.0):
        """Logits for one mask-predict step on RVQ layer `layer` with an
        acoustic prompt prefix (ref `reverse_diffusion` maskgct_s2a.py:318):
        the prompt prefix sums ALL layers' embeddings; target positions use
        the below/at/above construction; CFG drops the prompt but keeps the
        semantic conditioning, with std rescale. prompt_tokens_all (B, Q, Lp);
        semantic covers prompt+target length."""
        c = self.cfg
        b, q_n, t_len = tokens_all.shape
        lp = prompt_tokens_all.shape[2]
        # prompt prefix: sum of every layer's real embedding
        prompt_emb = jnp.zeros((b, lp, c.hidden), self.mask_emb.dtype)
        for q in range(c.num_quantizers):
            prompt_emb = prompt_emb + self.token_embs[q](prompt_tokens_all[:, q])
        cur = self._xt(tokens_all, layer, mask,
                       jnp.zeros((b, t_len), bool))
        x_emb = jnp.concatenate([prompt_emb, cur], axis=1)
        cond = self._cond_of(semantic) + self.layer_emb(layer)[:, None, :]
        am = jnp.ones((b, lp + t_len))
        h = self.backbone(x_emb, t, cond, mask=am)
        embeds_c = h[:, lp:]
        # unconditional: no acoustic prompt, semantic conditioning kept
        h_u = self.backbone(cur, t, cond[:, lp:], mask=jnp.ones((b, t_len)))
        std_pos = jnp.std(embeds_c)
        g = embeds_c + cfg_scale * (embeds_c - h_u)
        g_rescaled = g * std_pos / jnp.maximum(jnp.std(g), 1e-6)
        g = rescale_cfg * g_rescaled + (1 - rescale_cfg) * g
        return self._layer_logits(g, layer)


@functools.lru_cache(maxsize=64)
def _s2a_sample_jitted(model, target_len, first_layer_steps, rest_layer_steps,
                       temp, cfg, compute_dtype):
    core = functools.partial(
        _s2a_sample_impl, model, target_len=target_len,
        first_layer_steps=first_layer_steps, rest_layer_steps=rest_layer_steps,
        temp=temp, cfg=cfg, compute_dtype=compute_dtype,
    )
    return jax.jit(core)


def s2a_sample(
    model: MaskGCTS2A,
    params,
    semantic_feats: jax.Array,  # (B, Lp+T, D) covering prompt + target
    prompt_tokens_all: jax.Array,  # (B, Q, Lp)
    target_len: int,
    rng: jax.Array,
    first_layer_steps: int = 16,
    rest_layer_steps: int = 1,
    temp: float = 1.0,
    cfg: float = 1.0,
    compute_dtype: str = "bfloat16",
):
    """Layer-by-layer mask-predict, fully jit-compiled (bf16 default)."""
    fn = _s2a_sample_jitted(
        model, target_len, first_layer_steps, rest_layer_steps, temp, cfg,
        compute_dtype,
    )
    return fn(params, semantic_feats, prompt_tokens_all, rng)


def _s2a_sample_impl(
    model: MaskGCTS2A,
    params,
    semantic_feats: jax.Array,
    prompt_tokens_all: jax.Array,
    rng: jax.Array,
    target_len: int,
    first_layer_steps: int = 16,
    rest_layer_steps: int = 1,
    temp: float = 1.0,
    cfg: float = 1.0,
    compute_dtype: str = "bfloat16",
):
    """Layer-by-layer mask-predict: iterative for layer 0, few-step for rest
    (ref `maskgct_s2a.py:318` — '1-layer then full, per RVQ layer')."""
    dt = jnp.dtype(compute_dtype)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params
    )
    if jnp.issubdtype(semantic_feats.dtype, jnp.floating):
        semantic_feats = semantic_feats.astype(dt)
    c = model.cfg
    b = prompt_tokens_all.shape[0]
    tokens = jnp.zeros((b, c.num_quantizers, target_len), jnp.int32)

    for q in range(c.num_quantizers):
        n_steps = first_layer_steps if q == 0 else rest_layer_steps
        layer = jnp.full((b,), q, jnp.int32)
        t_list = np.asarray([1.0 - i / n_steps for i in range(n_steps + 1)], np.float32)
        nums = np.asarray(
            [int(np.sin(t * np.pi / 2) * target_len) for t in t_list[1:]], np.int32
        )
        mask = jnp.ones((b, target_len), bool)

        def body(carry, inp):
            tokens, mask, rng = carry
            step_i, t_val, next_num = inp
            rng, r_s, r_c = jax.random.split(rng, 3)
            t = jnp.full((b,), t_val)
            logits = model.apply(
                {"params": params}, tokens, mask, layer, t, semantic_feats,
                prompt_tokens_all, cfg, method=MaskGCTS2A.sample_layer_step,
            ).astype(jnp.float32)
            temp_i = jnp.maximum(temp * t_val, 1e-3)
            sampled = jnp.argmax(logits / temp_i + _gumbel(r_s, logits.shape), -1)
            sampled = jnp.where(step_i == n_steps - 1, jnp.argmax(logits, -1), sampled)
            cur = jnp.take_along_axis(tokens, layer[:, None, None], axis=1)[:, 0]
            cur = jnp.where(mask, sampled, cur)
            probs = jax.nn.softmax(logits, axis=-1)
            conf = jnp.take_along_axis(probs, sampled[..., None], -1)[..., 0]
            scores = jnp.where(mask, (1 - conf) + temp * t_val * _gumbel(r_c, conf.shape), -jnp.inf)
            order = jnp.argsort(-scores, axis=-1)
            rank = jnp.argsort(order, axis=-1)
            new_mask = (rank < next_num) & mask
            cur = jnp.where(new_mask, 0, cur)
            tokens = jnp.expand_dims(cur, 1) * jax.nn.one_hot(
                layer, c.num_quantizers, dtype=tokens.dtype
            )[:, :, None] + tokens * (
                1 - jax.nn.one_hot(layer, c.num_quantizers, dtype=tokens.dtype)
            )[:, :, None]
            return (tokens, new_mask, rng), None

        xs = (jnp.arange(n_steps), jnp.asarray(t_list[:-1]), jnp.asarray(nums))
        rng, r = jax.random.split(rng)
        (tokens, _, _), _ = jax.lax.scan(body, (tokens, mask, r), xs)
    return tokens
