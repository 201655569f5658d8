"""AudioLDM: text-conditioned latent diffusion over VAE mel latents.

Reference: `models/tta/ldm/audioldm.py` (2-D UNet with cross-attention on
T5/CLAP text embeddings, `attention.py`), trainer with diffusers DDPM/DDIM/
PNDM schedulers (`audioldm_trainer.py:47`), inference
`audioldm_inference.py`. TPU design: compact NHWC UNet with self+cross
attention at low resolutions, schedules/samplers from
`amphion_tpu/modules/diffusion` (single-scan sampling), classifier-free
guidance by text-embedding dropout. Text encoding wraps a frozen
`transformers` T5 encoder on the host (the reference does the same with
torch) — any (B, L, text_dim) embedding works.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.diffusion import (
    DiffusionSchedule,
    ddim_sample,
    timestep_embedding,
)
from amphion_tpu.models.tta.autoencoder_kl import ResBlock2D


@dataclass(frozen=True)
class AudioLDMConfig:
    latent_channels: int = 8
    base_channels: int = 128
    channel_mults: tuple[int, ...] = (1, 2, 4)
    attn_levels: tuple[int, ...] = (1, 2)
    num_heads: int = 8
    text_dim: int = 768
    num_train_steps: int = 1000
    cond_drop_prob: float = 0.1


class CrossAttention2D(nn.Module):
    channels: int
    num_heads: int

    @nn.compact
    def __call__(self, x, context=None):
        """x (B, H, W, C); context (B, L, D) or None (self-attention)."""
        b, h, w, c = x.shape
        q_in = x.reshape(b, h * w, c)
        ctx = q_in if context is None else context
        nh = self.num_heads
        d = c // nh
        q = nn.Dense(c, name="q")(q_in).reshape(b, -1, nh, d)
        k = nn.Dense(c, name="k")(ctx).reshape(b, -1, nh, d)
        v = nn.Dense(c, name="v")(ctx).reshape(b, -1, nh, d)
        att = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d), axis=-1
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, h * w, c)
        return x + nn.Dense(c, name="out")(out).reshape(b, h, w, c)


class UNetBlock(nn.Module):
    channels: int
    use_attn: bool
    num_heads: int

    @nn.compact
    def __call__(self, x, temb, context):
        h = ResBlock2D(self.channels)(x)
        h = h + nn.Dense(self.channels, name="temb_proj")(nn.swish(temb))[:, None, None, :]
        h = ResBlock2D(self.channels)(h)
        if self.use_attn:
            h = nn.GroupNorm(num_groups=min(32, self.channels))(h)
            h = CrossAttention2D(self.channels, self.num_heads, name="self_attn")(h)
            h = CrossAttention2D(self.channels, self.num_heads, name="cross_attn")(
                h, context
            )
        return h


class AudioLDM(nn.Module):
    """eps-prediction UNet over latents (B, T', F', latent_channels)."""

    cfg: AudioLDMConfig

    @property
    def schedule(self) -> DiffusionSchedule:
        return DiffusionSchedule.create(self.cfg.num_train_steps)

    @nn.compact
    def __call__(self, z_t, t, text_emb):
        c = self.cfg
        temb = nn.Dense(c.base_channels * 4)(
            nn.swish(nn.Dense(c.base_channels * 4)(timestep_embedding(t, c.base_channels)))
        )
        ctx = nn.Dense(c.base_channels * 4, name="ctx_proj")(text_emb)

        h = nn.Conv(c.base_channels, (3, 3), padding="SAME")(z_t)
        skips = [h]
        # down path
        for i, m in enumerate(c.channel_mults):
            ch = c.base_channels * m
            h = UNetBlock(ch, i in c.attn_levels, c.num_heads, name=f"down_{i}")(
                h, temb, ctx
            )
            skips.append(h)
            if i < len(c.channel_mults) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                            name=f"downsample_{i}")(h)
        # middle
        mid_ch = c.base_channels * c.channel_mults[-1]
        h = UNetBlock(mid_ch, True, c.num_heads, name="mid")(h, temb, ctx)
        # up path
        for i in reversed(range(len(c.channel_mults))):
            ch = c.base_channels * c.channel_mults[i]
            if i < len(c.channel_mults) - 1:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(cc, (3, 3), padding="SAME", name=f"upsample_{i}")(h)
            skip = skips[i + 1]
            h = jnp.concatenate([h[:, : skip.shape[1], : skip.shape[2]], skip], -1)
            h = UNetBlock(ch, i in c.attn_levels, c.num_heads, name=f"up_{i}")(
                h, temb, ctx
            )
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]))(h)
        h = nn.swish(h)
        return nn.Conv(c.latent_channels, (3, 3), padding="SAME",
                       kernel_init=nn.initializers.zeros)(h)

    def loss(self, z0, text_emb, rng):
        sched = self.schedule
        r_t, r_n, r_d = jax.random.split(rng, 3)
        b = z0.shape[0]
        t = jax.random.randint(r_t, (b,), 0, sched.num_steps)
        noise = jax.random.normal(r_n, z0.shape)
        z_t = sched.q_sample(z0, t, noise)
        drop = jax.random.bernoulli(r_d, self.cfg.cond_drop_prob, (b,))
        text_emb = text_emb * (1.0 - drop[:, None, None].astype(text_emb.dtype))
        eps = self(z_t, t, text_emb)
        loss = jnp.mean((eps - noise) ** 2)
        return loss, {"ldm_loss": loss}


def audioldm_sample(
    model: AudioLDM,
    params,
    text_emb: jax.Array,
    shape: tuple,
    rng: jax.Array,
    num_steps: int = 50,
    guidance_scale: float = 3.0,
):
    """DDIM sampling with classifier-free guidance (memoized self-jitting —
    a fresh jit per call would recompile every prompt)."""
    return _audioldm_sample_jitted(model, shape, num_steps, guidance_scale)(
        params, text_emb, rng
    )


import functools


@functools.lru_cache(maxsize=16)
def _audioldm_sample_jitted(model, shape, num_steps, guidance_scale):
    sched = model.schedule
    b = shape[0]

    def core(params, text_emb, rng):
        null_emb = jnp.zeros_like(text_emb)

        def eps_fn(x, t):
            tt = jnp.full((b,), t)
            # one batched fwd for [cond; uncond] halves the step count
            e2 = model.apply(
                {"params": params},
                jnp.concatenate([x, x]), jnp.concatenate([tt, tt]),
                jnp.concatenate([text_emb, null_emb]),
            )
            e_c, e_u = e2[:b], e2[b:]
            return e_u + guidance_scale * (e_c - e_u)

        return ddim_sample(eps_fn, sched, shape, rng, num_steps)

    return jax.jit(core)


def hash_text_embed(texts: list[str], dim: int = 768, max_len: int = 32):
    """Deterministic hashed token embeddings — an offline text-conditioning
    fallback for environments without a pretrained-T5 cache. Each whitespace
    token maps to a fixed pseudo-random unit-scale vector keyed by a stable
    hash, so the conditioning signal is consistent across train/infer runs
    (the UNet's ctx projection learns on top of it)."""
    import hashlib

    import numpy as np

    out = np.zeros((len(texts), max_len, dim), np.float32)
    for b, text in enumerate(texts):
        for j, tok in enumerate(text.lower().split()[:max_len]):
            h = int.from_bytes(hashlib.sha256(tok.encode()).digest()[:8], "little")
            out[b, j] = np.random.default_rng(h).standard_normal(dim)
    return jnp.asarray(out / np.sqrt(dim))


def encode_text(texts: list[str], dim: int = 768, backend: str = "auto"):
    """Text → (B, L, dim) conditioning. backend: 't5' | 'hash' | 'auto'
    (t5 if a local HF cache has the weights, else hashed embeddings)."""
    if backend in ("t5", "auto"):
        try:
            # auto must not hit the network: only use an existing local cache
            emb = encode_text_t5(texts, local_files_only=(backend == "auto"))
            if emb.shape[-1] != dim:
                raise ValueError(f"t5 dim {emb.shape[-1]} != cfg text_dim {dim}")
            return emb
        except Exception:
            if backend == "t5":
                raise
    return hash_text_embed(texts, dim)


def encode_text_t5(texts: list[str], model_name: str = "t5-base", device="cpu",
                   local_files_only: bool = False):
    """Frozen T5 text encoder via transformers (host-side, like the
    reference's torch T5; ref `audioldm_trainer.py` text conditioning)."""
    import numpy as np
    import torch
    from transformers import AutoTokenizer, T5EncoderModel

    tok = AutoTokenizer.from_pretrained(model_name,
                                        local_files_only=local_files_only)
    enc = T5EncoderModel.from_pretrained(
        model_name, local_files_only=local_files_only
    ).eval()
    with torch.no_grad():
        batch = tok(texts, return_tensors="pt", padding=True, truncation=True)
        out = enc(**batch).last_hidden_state
    return jnp.asarray(np.asarray(out))
