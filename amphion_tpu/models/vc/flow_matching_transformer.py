"""Vevo flow-matching transformer: content-style tokens → mel.

Same capability as the reference (reference:
`models/vc/flow_matching_transformer/fmt_model.py` — llama_nar backbone
predicting the CFM velocity field over mel frames, timbre carried by a
prompt-mel prefix `vevo_utils.py:273`, 32 Euler steps at inference
`vevo_utils.py:414`; trainer with online feature extraction
`fmt_trainer.py:61-102`): the adaptive Llama encoder takes
[prompt mel; noisy mel] + token condition and the flow time, and the sampler
integrates the ODE with `amphion_tpu/modules/flow_matching` scans.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.diffusion import timestep_embedding
from amphion_tpu.modules.flow_matching import cfm_loss, cfm_pair, euler_sample
from amphion_tpu.modules.llama import LlamaConfig, LlamaEncoder


@dataclass(frozen=True)
class FMTConfig:
    token_vocab: int = 8192  # content-style tokens
    n_mel: int = 80
    hidden: int = 1024
    num_layers: int = 16
    num_heads: int = 16
    max_position: int = 8192
    cond_drop_prob: float = 0.2
    sigma_min: float = 1e-4

    remat: bool = False  # rematerialize backbone blocks (memory lever)

    def llama(self) -> LlamaConfig:
        return LlamaConfig(
            hidden_size=self.hidden, num_layers=self.num_layers,
            num_heads=self.num_heads, adaptive=True,
            max_position=self.max_position, remat=self.remat,
        )


class FlowMatchingTransformer(nn.Module):
    cfg: FMTConfig

    def setup(self):
        c = self.cfg
        self.token_embed = nn.Embed(c.token_vocab, c.hidden)
        self.prompt_flag = nn.Embed(2, c.hidden)
        self.mel_proj = nn.Dense(c.hidden)
        self.time_proj = nn.Dense(c.hidden)
        self.backbone = LlamaEncoder(c.llama())
        self.out_proj = nn.Dense(c.n_mel)

    def velocity(self, x_t, t, tokens, prompt_mel, prompt_len_mask, x_mask,
                 drop_cond=False):
        """Predict velocity. x_t: (B, T, n_mel) noisy target mel;
        prompt_mel: (B, T, n_mel) with valid frames marked by
        prompt_len_mask (B, T) — prompt frames are *clean* (the CFM prefix
        trick carrying timbre); tokens: (B, T) frame-aligned."""
        c = self.cfg
        tok = self.token_embed(tokens)
        tok = tok * (1.0 - jnp.asarray(drop_cond, jnp.float32))
        # clean prompt frames replace the noisy ones
        x_in = jnp.where(prompt_len_mask[..., None] > 0, prompt_mel, x_t)
        h = self.mel_proj(x_in) + tok
        # mark prompt frames so the model can distinguish them
        h = h + self.prompt_flag(prompt_len_mask.astype(jnp.int32))
        cond = self.time_proj(nn.silu(timestep_embedding(t * 1000.0, c.hidden)))
        out = self.backbone(h, cond=cond, mask=x_mask)
        return self.out_proj(out)

    def loss(self, mel, tokens, prompt_len_mask, x_mask, rng):
        """CFM loss on non-prompt frames. mel (B, T, n_mel)."""
        c = self.cfg
        r_t, r_n, r_d = jax.random.split(rng, 3)
        b = mel.shape[0]
        t = jnp.clip(jax.random.uniform(r_t, (b,)), 1e-5, 1.0)
        noise = jax.random.normal(r_n, mel.shape)
        x_t, v_target = cfm_pair(mel, t, noise, c.sigma_min)
        drop = jax.random.uniform(r_d, ()) < c.cond_drop_prob
        v_pred = self.velocity(
            x_t, t, tokens, mel, prompt_len_mask, x_mask,
            drop_cond=drop,
        )
        w = x_mask * (1.0 - prompt_len_mask)
        loss = cfm_loss(v_pred, v_target, w)
        return loss, {"fm_loss": loss}


import functools


@functools.lru_cache(maxsize=32)
def _fmt_inference_jitted(model, b, t_len, num_steps, cfg_scale):
    def core(params, tokens, prompt_mel, prompt_len_mask, rng):
        x_mask = jnp.ones((b, t_len))

        def vfield(x, t):
            tt = jnp.full((b,), t)
            v = model.apply(
                {"params": params}, x, tt, tokens, prompt_mel, prompt_len_mask,
                x_mask, False, method=FlowMatchingTransformer.velocity,
            )
            if cfg_scale > 0:
                vu = model.apply(
                    {"params": params}, x, tt, tokens, prompt_mel,
                    prompt_len_mask, x_mask, True,
                    method=FlowMatchingTransformer.velocity,
                )
                v = vu + (1 + cfg_scale) * (v - vu)
            return v

        mel = euler_sample(
            vfield, (b, t_len, model.cfg.n_mel), rng, num_steps=num_steps
        )
        # return only generated frames (prompt region replaced by the prompt)
        return jnp.where(prompt_len_mask[..., None] > 0, prompt_mel, mel)

    return jax.jit(core)


def fmt_inference(
    model: FlowMatchingTransformer,
    params,
    tokens: jax.Array,  # (B, T) frame-aligned content-style tokens
    prompt_mel: jax.Array,  # (B, T, n_mel); frames beyond prompt_len are junk
    prompt_len_mask: jax.Array,  # (B, T) 1 on prompt frames
    rng: jax.Array,
    num_steps: int = 32,
    cfg_scale: float = 0.0,
):
    """Euler ODE from noise to mel; prompt frames stay clamped to the prompt
    (timbre conditioning), CFG optional. Memoized self-jitting (one cached
    program per shape bucket — eager scans dispatch op-by-op through the
    TPU tunnel, and a fresh jit per call would recompile every utterance)."""
    b, t_len = tokens.shape
    return _fmt_inference_jitted(model, b, t_len, num_steps, cfg_scale)(
        params, tokens, prompt_mel, prompt_len_mask, rng
    )
