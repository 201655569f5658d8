"""Metis: unified masked-generative foundation model (TTS/VC/TSE/SE/L2S).

Reference: `models/tts/metis/metis.py:172` + `metis_model.py` — masked
generative pre-training on (SSL-token → acoustic) with task fine-tuning;
per-task inference scripts `metis_infer_{tts,vc,tse,se,omni}.py`.

`MetisStage1` (ref `metis_model.py:43`) IS a MaskGCT T2S plus one
fine-tune conditioning pathway: continuous task features (SSL feats of
the degraded/source audio, visual embeddings, ...) pass through a
zero-gated `SimpleAdapter` (`metis_model.py:19`: Linear→SiLU→Linear,
output scaled by a zero-init gate) and are ADDED element-wise to the
masked token-embedding sequence — the adapter output covers
[prompt ‖ target] at inference (`reverse_diffusion`,
`metis_model.py:191`: cond branch adds the full-length adapter output,
the CFG branch adds the without-prompt slice). Tasks differ only in what
features are fed:

- tts: phone condition (= MaskGCT T2S, no adapter)
- vc / tse: SSL features of [prompt_speech ‖ source] + semantic prompt
  tokens (`metis.py:410` `speech2semantic_w_prompt`)
- se: SSL features of the noisy speech, empty prompt (`metis.py:396`)
- l2s: visual embedding sequence (`video2semantic`)

The S2A stage is the shared MaskGCT semantic→acoustic model.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.models.tts.maskgct.maskgct import (
    MaskGCTS2A,
    MaskGCTT2S,
    S2AConfig,
    T2SConfig,
    _gumbel,
    _topk_filter_frac,
    mask_prob_schedule,
    s2a_sample,
    t2s_sample,
)

TASKS = ("tts", "vc", "se", "tse", "l2s")


class SimpleAdapter(nn.Module):
    """Zero-gated conditioning adapter (ref `metis_model.py:19-40`):
    Linear(D→4H) → SiLU → Linear(4H→H), scaled by a zero-init gate so
    fine-tuning starts from the pre-trained behaviour."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_dim * 4, name="in_linear")(x)
        h = nn.silu(h)
        h = nn.Dense(self.out_dim, name="out_linear")(h)
        gate = self.param("gate_scale", nn.initializers.zeros, (1,))
        return h * gate


@dataclass(frozen=True)
class MetisConfig:
    t2s: T2SConfig = field(default_factory=T2SConfig)
    s2a: S2AConfig = field(default_factory=S2AConfig)
    cond_feature_dim: int = 1024  # continuous conditioning (SSL / visual)


class Metis(nn.Module):
    cfg: MetisConfig

    def setup(self):
        self.t2s = MaskGCTT2S(self.cfg.t2s)
        self.s2a = MaskGCTS2A(self.cfg.s2a)
        self.cond_adapter = SimpleAdapter(self.cfg.t2s.hidden)

    def t2s_loss(self, task: str, x0, x_mask, rng, phone_id=None,
                 phone_mask=None, cond_feats=None):
        """Masked CE on semantic tokens with task-specific conditioning
        (ref `metis_model.py:117-161`): clamped mask prob (≥0.2), an
        unmasked prompt region of random length, adapter output added
        element-wise. ``cond_feats`` must be time-aligned with ``x0``."""
        if task == "tts":
            assert phone_id is not None
            return self.t2s.compute_loss(x0, x_mask, phone_id, phone_mask, rng)
        assert cond_feats is not None and cond_feats.shape[1] == x0.shape[1]
        c = self.cfg.t2s
        b, t_len = x0.shape
        r_t, r_mask, r_prompt, r_drop = jax.random.split(rng, 4)
        t = jnp.clip(jax.random.uniform(r_t, (b,)), 1e-5, 1.0)
        mp = jnp.maximum(mask_prob_schedule(t), 0.2)

        # prompt region r ~ U[min(T//4, 5), 0.4T), dropped with cfg prob
        # (ref forward_diffusion, metis_model.py:83-93)
        use_cond = jax.random.uniform(r_drop, (b,)) > c.cond_drop_prob
        lo = min(max(t_len // 4, 1), 5)
        hi = max(int(t_len * 0.4), lo + 1)
        prompt_len = jnp.where(
            use_cond, jax.random.randint(r_prompt, (b,), lo, hi), 0)
        is_prompt = jnp.arange(t_len)[None, :] < prompt_len[:, None]
        mask = jax.random.bernoulli(r_mask, mp[:, None], x0.shape) & ~is_prompt
        # all-zero rows get position prompt_len masked (ref :105-108)
        none_masked = ~jnp.any(mask, axis=1)
        fix = (jnp.arange(t_len)[None, :]
               == jnp.minimum(prompt_len, t_len - 1)[:, None])
        mask = mask | (none_masked[:, None] & fix)

        x_emb = jnp.where(mask[..., None], self.t2s.mask_emb[None, None, :],
                          self.t2s.cond_emb(x0))
        x_emb = x_emb + self.cond_adapter(cond_feats)
        h = self.t2s.estimate(x_emb, t, x_mask)
        logits = self.t2s.to_logit(h)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, x0[..., None], axis=-1)[..., 0]
        w = mask.astype(jnp.float32) * x_mask
        loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, {f"{task}_t2s_loss": loss}

    def s2a_loss(self, tokens_all, x_mask, semantic_feats, rng):
        return self.s2a.compute_loss(tokens_all, x_mask, semantic_feats, rng)

    def task_sample_step(self, seq, mask, t, prompt_tokens, cond_feats,
                         cfg_scale, rescale_cfg):
        """One reverse step for adapter-conditioned tasks (ref
        `reverse_diffusion`, `metis_model.py:191-310`): the semantic
        prompt rides as embedded prefix, the adapter output is added over
        the full sequence on the cond branch and over the target slice on
        the CFG branch; std-rescaled guidance."""
        plen = prompt_tokens.shape[1]
        ftc = self.cond_adapter(cond_feats)  # (B, plen+T, H)
        tok = jnp.where(mask[..., None], self.t2s.mask_emb[None, None, :],
                        self.t2s.cond_emb(seq))
        cur_prompt = self.t2s.cond_emb(prompt_tokens)
        x_full = jnp.concatenate([cur_prompt, tok], axis=1) + ftc
        b, t_len = seq.shape
        full_mask = jnp.ones((b, plen + t_len))
        emb = self.t2s.estimate(x_full, t, full_mask)[:, plen:]
        un = self.t2s.estimate(tok + ftc[:, plen:], t,
                               jnp.ones((b, t_len)))
        std_pos = jnp.std(emb)
        g = emb + cfg_scale * (emb - un)
        g_rescaled = g * std_pos / jnp.maximum(jnp.std(g), 1e-6)
        g = rescale_cfg * g_rescaled + (1 - rescale_cfg) * g
        return self.t2s.to_logit(g)


def metis_infer_tts(model: Metis, params, prompt_semantic, phone_id, target_len,
                    rng, **kw):
    """TTS task = MaskGCT pipeline over the shared backbones."""
    return t2s_sample(
        MaskGCTT2S(model.cfg.t2s), params["t2s"], prompt_semantic, phone_id,
        target_len, rng, **kw,
    )


@functools.lru_cache(maxsize=32)
def _metis_task_sample_jitted(model, prompt_len, target_len, n_steps, temp,
                              filter_thres, cfg, rescale_cfg, compute_dtype):
    def core(params, prompt_tokens, cond_feats, rng):
        dt = jnp.dtype(compute_dtype)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params
        )
        cond_feats = cond_feats.astype(dt)
        b = cond_feats.shape[0]
        t_list = np.asarray(
            [1.0 - i / n_steps for i in range(n_steps + 1)], np.float32)
        next_nums = np.asarray(
            [int(np.sin(t * np.pi / 2) * target_len) for t in t_list[1:]],
            np.int32)
        seq0 = jnp.zeros((b, target_len), jnp.int32)
        mask0 = jnp.ones((b, target_len), bool)

        def body(carry, inp):
            seq, mask, rng = carry
            step_i, t_val, next_num = inp
            rng, r_s, r_c = jax.random.split(rng, 3)
            t = jnp.full((b,), t_val)
            logits = model.apply(
                {"params": params}, seq, mask, t, prompt_tokens, cond_feats,
                cfg, rescale_cfg, method=Metis.task_sample_step,
            ).astype(jnp.float32)
            logits = _topk_filter_frac(logits, filter_thres)
            temp_i = jnp.maximum(temp * t_val, 1e-3)
            is_last = step_i == n_steps - 1
            gumbel_ids = jnp.argmax(
                logits / temp_i + _gumbel(r_s, logits.shape), axis=-1)
            sampled = jnp.where(is_last, jnp.argmax(logits, -1), gumbel_ids)
            seq = jnp.where(mask, sampled, seq)
            probs = jax.nn.softmax(logits, axis=-1)
            conf = jnp.take_along_axis(probs, sampled[..., None], -1)[..., 0]
            scores = (1.0 - conf) + temp * t_val * _gumbel(r_c, conf.shape)
            scores = jnp.where(mask, scores, -jnp.inf)
            order = jnp.argsort(-scores, axis=-1)
            rank = jnp.argsort(order, axis=-1)
            new_mask = (rank < next_num) & mask
            seq = jnp.where(new_mask, 0, seq)
            return (seq, new_mask, rng), None

        xs = (jnp.arange(n_steps), jnp.asarray(t_list[:-1]),
              jnp.asarray(next_nums))
        (seq, _, _), _ = jax.lax.scan(body, (seq0, mask0, rng), xs)
        return seq

    return jax.jit(core)


def metis_infer_task(model: Metis, params, task: str, cond_feats, target_len,
                     rng, prompt_tokens=None, n_steps=25, temp=0.9,
                     filter_thres=0.98, cfg=1.5, rescale_cfg=0.75,
                     compute_dtype="bfloat16"):
    """Adapter-conditioned semantic generation for vc/se/tse/l2s
    (ref `metis_infer_{vc,tse,se}.py` → `reverse_diffusion`):
    cond_feats (B, Lp+target_len, D) time-aligned features,
    prompt_tokens (B, Lp) semantic prompt (empty for se/l2s) →
    semantic tokens (B, target_len). Fully jit-compiled mask-predict."""
    assert task in TASKS and task != "tts"
    if prompt_tokens is None:
        prompt_tokens = jnp.zeros((cond_feats.shape[0], 0), jnp.int32)
    assert cond_feats.shape[1] == prompt_tokens.shape[1] + target_len
    fn = _metis_task_sample_jitted(
        model, int(prompt_tokens.shape[1]), target_len, n_steps, temp,
        filter_thres, cfg, rescale_cfg, compute_dtype,
    )
    return fn(params, jnp.asarray(prompt_tokens, jnp.int32), cond_feats, rng)


def metis_infer_vc(model, params, src_feats, target_len, rng,
                   prompt_tokens=None, **kw):
    """Voice conversion: SSL features of [prompt ‖ source] + the timbre
    reference's semantic tokens → semantic tokens."""
    return metis_infer_task(model, params, "vc", src_feats, target_len, rng,
                            prompt_tokens=prompt_tokens, **kw)


def metis_infer_se(model, params, noisy_feats, target_len, rng, **kw):
    """Speech enhancement: degraded-audio features, no prompt
    (ref `speech2semantic_wo_prompt`, metis.py:396)."""
    return metis_infer_task(model, params, "se", noisy_feats, target_len,
                            rng, **kw)


def metis_infer_tse(model, params, mixture_feats, target_len, rng,
                    prompt_tokens=None, **kw):
    """Target-speaker extraction: features of [enrollment ‖ mixture] with
    the enrollment's semantic tokens as prompt."""
    return metis_infer_task(model, params, "tse", mixture_feats, target_len,
                            rng, prompt_tokens=prompt_tokens, **kw)


def metis_infer_l2s(model, params, visual_feats, target_len, rng, **kw):
    """Lip-to-speech: visual embedding sequence → semantics."""
    return metis_infer_task(model, params, "l2s", visual_feats, target_len,
                            rng, **kw)
