"""Metis: unified masked-generative foundation model (TTS/VC/TSE/SE/L2S).

Reference: `models/tts/metis/metis.py:172` + `metis_model.py` — masked
generative pre-training on (SSL-token → acoustic) with per-task conditioning
adapters and fine-tuning; per-task inference scripts
`metis_infer_{tts,vc,tse,se,omni}.py`. Reuses the MaskGCT backbones: the
task defines what conditions the T2S/S2A stages:

- tts: phone condition (= MaskGCT T2S)
- vc:  source semantic tokens condition directly (identity T2S)
- se / tse: degraded-audio SSL features as continuous conditioning
- l2s: lip/visual embedding sequence as continuous conditioning

This module implements the unifying wrapper: a task-conditioned masked
semantic-token generator + the shared S2A stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.tts.maskgct.maskgct import (
    MaskGCTS2A,
    MaskGCTT2S,
    S2AConfig,
    T2SConfig,
    s2a_sample,
    t2s_sample,
)

TASKS = ("tts", "vc", "se", "tse", "l2s")


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
        self.cond_proj = nn.Dense(self.cfg.t2s.hidden)
        self.task_embed = nn.Embed(len(TASKS), self.cfg.t2s.hidden)

    def _task_id(self, task: str) -> int:
        return TASKS.index(task)

    def t2s_loss(self, task: str, x0, x_mask, rng, phone_id=None,
                 phone_mask=None, cond_feats=None):
        """Masked CE on semantic tokens with task-specific conditioning.

        For continuous-conditioned tasks the conditioning sequence is
        injected as a prefix embedding (same mechanism as the phone prefix).
        """
        if task == "tts":
            assert phone_id is not None
            return self.t2s.compute_loss(x0, x_mask, phone_id, phone_mask, rng)
        # continuous conditioning path: reuse compute_loss with a pseudo
        # phone embedding built from projected features + task embedding
        assert cond_feats is not None
        b, lc, _ = cond_feats.shape
        prefix = self.cond_proj(cond_feats) + self.task_embed(
            jnp.full((b,), self._task_id(task))
        )[:, None, :]
        # inline masked objective (mirrors MaskGCTT2S.compute_loss with an
        # embedding prefix instead of token ids)
        c = self.cfg.t2s
        r_t, r_mask = jax.random.split(rng)
        t = jnp.clip(jax.random.uniform(r_t, (b,)), 1e-5, 1.0)
        from amphion_tpu.models.tts.maskgct.maskgct import mask_prob_schedule

        mp = jnp.maximum(mask_prob_schedule(t), 0.2)
        mask = jax.random.bernoulli(r_mask, mp[:, None], x0.shape)
        mask = mask | (~jnp.any(mask, axis=1))[:, None] & (
            jnp.arange(x0.shape[1])[None, :] == 0
        )
        x_emb = jnp.where(
            mask[..., None], self.t2s.mask_emb[None, None, :], self.t2s.cond_emb(x0)
        )
        prefix_mask = jnp.ones((b, lc))
        h = self.t2s.estimate(x_emb, t, x_mask, prefix, prefix_mask)
        logits = self.t2s.to_logit(h)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, x0[..., None], axis=-1)[..., 0]
        w = mask.astype(jnp.float32) * x_mask
        loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, {f"{task}_t2s_loss": loss}

    def s2a_loss(self, tokens_all, x_mask, semantic_feats, rng):
        return self.s2a.compute_loss(tokens_all, x_mask, semantic_feats, rng)


def metis_infer_tts(model: Metis, params, prompt_semantic, phone_id, target_len,
                    rng, **kw):
    """TTS task = MaskGCT pipeline over the shared backbones."""
    return t2s_sample(
        MaskGCTT2S(model.cfg.t2s), params["t2s"], prompt_semantic, phone_id,
        target_len, rng, **kw,
    )


def _metis_task_sample_step(model: Metis, params, task_id, seq, mask, t,
                            cond_feats, cfg_scale, rescale_cfg):
    """One reverse step for continuous-conditioned tasks (vc/se/tse/l2s):
    the conditioning prefix is projected features + task embedding instead
    of phone embeddings; CFG contrasts with the unconditioned branch."""

    def run(prm, seq, mask, t, cond_feats):
        def fwd(mdl):
            tok_emb = jnp.where(
                mask[..., None], mdl.t2s.mask_emb[None, None, :],
                mdl.t2s.cond_emb(seq),
            )
            b = seq.shape[0]
            prefix = mdl.cond_proj(cond_feats) + mdl.task_embed(
                jnp.full((b,), task_id)
            )[:, None, :]
            prefix_mask = jnp.ones(prefix.shape[:2])
            x_mask = jnp.ones_like(mask, jnp.float32)
            emb = mdl.t2s.estimate(tok_emb, t, x_mask, prefix, prefix_mask)
            un = mdl.t2s.estimate(tok_emb, t, x_mask)
            std_pos = jnp.std(emb)
            g = emb + cfg_scale * (emb - un)
            g_rescaled = g * std_pos / jnp.maximum(jnp.std(g), 1e-6)
            g = rescale_cfg * g_rescaled + (1 - rescale_cfg) * g
            return mdl.t2s.to_logit(g)

        return nn.apply(fwd, model)({"params": prm})

    return run(params, seq, mask, t, cond_feats)


import functools

import numpy as np

from amphion_tpu.models.tts.maskgct.maskgct import _gumbel, _topk_filter_frac


@functools.lru_cache(maxsize=32)
def _metis_task_sample_jitted(model, task_id, target_len, n_steps, temp,
                              filter_thres, cfg, rescale_cfg, compute_dtype):
    def core(params, cond_feats, rng):
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
            logits = _metis_task_sample_step(
                model, params, task_id, seq, mask, t, cond_feats, cfg,
                rescale_cfg,
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
                     rng, n_steps=25, temp=0.9, filter_thres=0.98, cfg=1.5,
                     rescale_cfg=0.75, compute_dtype="bfloat16"):
    """Continuous-conditioned semantic generation for vc/se/tse/l2s
    (ref `metis_infer_{vc,tse,se}.py`): cond_feats (B, Lc, D) → semantic
    tokens (B, target_len). Fully jit-compiled mask-predict scan."""
    task_id = TASKS.index(task)
    fn = _metis_task_sample_jitted(
        model, task_id, target_len, n_steps, temp, filter_thres, cfg,
        rescale_cfg, compute_dtype,
    )
    return fn(params, cond_feats, rng)


def metis_infer_vc(model, params, src_feats, target_len, rng, **kw):
    """Voice conversion: source SSL features → semantic tokens."""
    return metis_infer_task(model, params, "vc", src_feats, target_len, rng, **kw)


def metis_infer_se(model, params, noisy_feats, target_len, rng, **kw):
    """Speech enhancement: degraded-audio features → clean semantics."""
    return metis_infer_task(model, params, "se", noisy_feats, target_len, rng, **kw)


def metis_infer_tse(model, params, mixture_feats, target_len, rng, **kw):
    """Target-speaker extraction (enrollment is part of the feature seq)."""
    return metis_infer_task(model, params, "tse", mixture_feats, target_len,
                            rng, **kw)


def metis_infer_l2s(model, params, visual_feats, target_len, rng, **kw):
    """Lip-to-speech: visual embedding sequence → semantics."""
    return metis_infer_task(model, params, "l2s", visual_feats, target_len,
                            rng, **kw)
