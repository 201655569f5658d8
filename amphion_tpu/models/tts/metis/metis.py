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
