"""AudioLDM: text-conditioned latent diffusion over VAE mel latents,
checkpoint-compatible with the reference UNet
(`models/tta/ldm/audioldm.py:546` UNetModel + `attention.py:284`
SpatialTransformer — the Stable-Diffusion lineage):

- [cos|sin] timestep embedding → SiLU MLP;
- input/middle/output TimestepEmbedSequential blocks: GroupNorm32 ResBlocks
  (plain time-emb addition), SpatialTransformers (GN + 1x1 proj_in, pre-LN
  self-attn → cross-attn on the text context → GEGLU FF, zero proj_out),
  stride-2 conv Downsample / nearest-2x + conv Upsample;
- skip concatenation on the channel axis, zero-init output conv.

Sampling/training keep this repo's single-scan DDIM with classifier-free
guidance by text-embedding dropout. Text encoding wraps a frozen
`transformers` T5 encoder on the host — any (B, L, text_dim) embedding
works.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.modules.diffusion import DiffusionSchedule, ddim_sample


@dataclass(frozen=True)
class AudioLDMConfig:
    latent_channels: int = 4  # in/out channels (ref in_channels/out_channels)
    base_channels: int = 256  # ref model_channels
    channel_mults: tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attention_resolutions: tuple[int, ...] = (4, 2, 1)  # ds values with attn
    num_heads: int = 8
    transformer_depth: int = 1
    text_dim: int = 768  # ref context_dim
    num_train_steps: int = 1000
    cond_drop_prob: float = 0.1

    # back-compat alias: attn at LEVEL indices (old compact config)
    attn_levels: tuple[int, ...] | None = None

    def __post_init__(self):
        if self.attn_levels is not None:
            object.__setattr__(
                self, "attention_resolutions",
                tuple(2**i for i in self.attn_levels))


def _sd_timestep_embedding(t, dim, max_period=10000.0):
    """ref audioldm.py:81 — [cos | sin] order."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _gn32(x, name=None):
    """GroupNorm32 (ref audioldm.py:108); tiny test configs with <32
    channels fall back to channel-count groups."""
    return nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-5,
                        name=name)(x)


class SDResBlock(nn.Module):
    """ref audioldm.py:381 (use_scale_shift_norm=False)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, emb):
        h = nn.swish(_gn32(x, "in_norm"))
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="in_conv")(h)
        h = h + nn.Dense(self.out_channels, name="emb_proj")(
            nn.swish(emb))[:, None, None, :]
        h = nn.swish(_gn32(h, "out_norm"))
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="skip")(x)
        return x + h


class SDCrossAttention(nn.Module):
    """ref attention.py:201 — q/k/v without bias, scale dim_head^-0.5."""

    query_dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        inner = self.heads * self.dim_head
        b, n, _ = x.shape
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, -1, self.heads, self.dim_head)
        v = v.reshape(b, -1, self.heads, self.dim_head)
        sim = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (self.dim_head**-0.5)
        att = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, n, inner)
        return nn.Dense(self.query_dim, name="to_out")(out)


class SDTransformerBlock(nn.Module):
    """ref attention.py:244 BasicTransformerBlock."""

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context):
        x = SDCrossAttention(self.dim, self.heads, self.dim_head,
                             name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)) + x
        x = SDCrossAttention(self.dim, self.heads, self.dim_head,
                             name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context) + x
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        # GEGLU (attention.py:89): proj → (x, gate), x * gelu(gate)
        h = nn.Dense(self.dim * 4 * 2, name="ff_proj")(h)
        a, gate = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.gelu(gate, approximate=False)
        x = nn.Dense(self.dim, name="ff_out")(h) + x
        return x


class SDSpatialTransformer(nn.Module):
    """ref attention.py:284."""

    channels: int
    heads: int
    dim_head: int
    depth: int = 1

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        y = _gn32(x, "norm")
        y = nn.Conv(self.channels, (1, 1), name="proj_in")(y)
        y = y.reshape(b, h * w, self.channels)
        for i in range(self.depth):
            y = SDTransformerBlock(self.channels, self.heads, self.dim_head,
                                   name=f"block_{i}")(y, context)
        y = y.reshape(b, h, w, self.channels)
        y = nn.Conv(self.channels, (1, 1),
                    kernel_init=nn.initializers.zeros, name="proj_out")(y)
        return y + res


class SDDownsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2),
                       padding=[(1, 1), (1, 1)], name="op")(x)


class SDUpsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                       name="conv")(x)


class AudioLDM(nn.Module):
    """eps-prediction UNet over latents (B, H, W, latent_channels)."""

    cfg: AudioLDMConfig

    @property
    def schedule(self) -> DiffusionSchedule:
        return DiffusionSchedule.create(self.cfg.num_train_steps)

    @nn.compact
    def __call__(self, z_t, t, text_emb):
        c = self.cfg
        m = c.base_channels
        emb = nn.Dense(4 * m, name="time_embed_2")(
            nn.swish(nn.Dense(4 * m, name="time_embed_0")(
                _sd_timestep_embedding(t, m))))

        def attn(ch, name):
            # legacy=False: dim_head = ch // num_heads
            return SDSpatialTransformer(ch, c.num_heads, ch // c.num_heads,
                                        c.transformer_depth, name=name)

        h = nn.Conv(m, (3, 3), padding=[(1, 1), (1, 1)], name="input_0_0")(z_t)
        hs = [h]
        idx = 1
        ds = 1
        ch = m
        # input blocks (mirror ref UNetModel construction indices)
        for level, mult in enumerate(c.channel_mults):
            for _ in range(c.num_res_blocks):
                h = SDResBlock(mult * m, name=f"input_{idx}_0")(h, emb)
                ch = mult * m
                if ds in c.attention_resolutions:
                    h = attn(ch, f"input_{idx}_1")(h, text_emb)
                hs.append(h)
                idx += 1
            if level != len(c.channel_mults) - 1:
                h = SDDownsample(ch, name=f"input_{idx}_0")(h)
                hs.append(h)
                idx += 1
                ds *= 2
        # middle
        h = SDResBlock(ch, name="middle_0")(h, emb)
        h = attn(ch, "middle_1")(h, text_emb)
        h = SDResBlock(ch, name="middle_2")(h, emb)
        # output blocks
        idx = 0
        for level, mult in list(enumerate(c.channel_mults))[::-1]:
            for i in range(c.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = SDResBlock(mult * m, name=f"output_{idx}_0")(h, emb)
                ch = mult * m
                j = 1
                if ds in c.attention_resolutions:
                    h = attn(ch, f"output_{idx}_{j}")(h, text_emb)
                    j += 1
                if level and i == c.num_res_blocks:
                    h = SDUpsample(ch, name=f"output_{idx}_{j}")(h)
                    ds //= 2
                idx += 1
        h = nn.swish(_gn32(h, "out_norm"))
        return nn.Conv(c.latent_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=nn.initializers.zeros, name="out_conv")(h)

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
    compute_dtype: str = "bfloat16",
):
    """DDIM sampling with classifier-free guidance (memoized self-jitting —
    a fresh jit per call would recompile every prompt). UNet runs in
    ``compute_dtype``; guidance and DDIM math stay f32."""
    return _audioldm_sample_jitted(
        model, shape, num_steps, guidance_scale, compute_dtype)(
        params, text_emb, rng
    )


@functools.lru_cache(maxsize=16)
def _audioldm_sample_jitted(model, shape, num_steps, guidance_scale,
                            compute_dtype="bfloat16"):
    sched = model.schedule
    b = shape[0]
    dt = jnp.dtype(compute_dtype)

    def core(params, text_emb, rng):
        params = jax.tree_util.tree_map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
        text_emb = text_emb.astype(dt)
        null_emb = jnp.zeros_like(text_emb)

        def eps_fn(x, t):
            tt = jnp.full((b,), t)
            # one batched fwd for [cond; uncond] halves the step count
            e2 = model.apply(
                {"params": params},
                jnp.concatenate([x, x]).astype(dt), jnp.concatenate([tt, tt]),
                jnp.concatenate([text_emb, null_emb]),
            ).astype(jnp.float32)
            e_c, e_u = e2[:b], e2[b:]
            return e_u + guidance_scale * (e_c - e_u)

        return ddim_sample(eps_fn, sched, shape, rng, num_steps)

    return jax.jit(core)


def hash_text_embed(texts: list[str], dim: int = 768, max_len: int = 32):
    """Deterministic hashed token embeddings — an offline text-conditioning
    fallback for environments without a pretrained-T5 cache. Each whitespace
    token maps to a fixed pseudo-random unit-scale vector keyed by a stable
    hash, so the conditioning signal is consistent across train/infer runs
    (the UNet's cross-attention learns on top of it)."""
    import hashlib

    out = np.zeros((len(texts), max_len, dim), np.float32)
    for b, text in enumerate(texts):
        for i, tok in enumerate(text.lower().split()[:max_len]):
            seed = int.from_bytes(
                hashlib.sha1(tok.encode()).digest()[:8], "little")
            out[b, i] = np.random.default_rng(seed).standard_normal(dim)
    return jnp.asarray(out)


def encode_text(texts: list[str], dim: int = 768, backend: str = "auto",
                t5=None, token_ids=None, token_mask=None):
    """Text → (B, L, dim) conditioning.

    backend "t5_native": the on-device flax T5 encoder
    (`modules/t5.T5Encoder`, weights via `--model t5_encoder` ingestion)
    — pass ``t5=(module, params)`` and pre-tokenized ``token_ids``
    [+ ``token_mask``]; no torch in the inference path. "t5" / "auto":
    the frozen host torch encoder (reference behavior,
    `audioldm_trainer.py:42`); "auto" falls back to hashed embeddings
    offline."""
    if backend == "t5_native" or (backend == "auto" and t5 is not None):
        if t5 is None or token_ids is None:
            raise ValueError(
                "t5_native backend needs t5=(module, params) and token_ids")
        module, params = t5
        import jax

        ids = jnp.asarray(token_ids)
        mask = None if token_mask is None else jnp.asarray(
            token_mask, jnp.int32)
        return jax.jit(
            lambda p, i, m: module.apply({"params": p}, i, m)
        )(params, ids, mask)
    if backend in ("auto", "t5"):
        try:
            return encode_text_t5(texts)
        except Exception:
            if backend == "t5":
                raise
    return hash_text_embed(texts, dim)


def encode_text_t5(texts: list[str], model_name: str = "t5-base", device="cpu",
                   max_len: int = 32):
    """Frozen T5 text encoder via transformers (host-side, torch CPU)."""
    import torch
    from transformers import AutoTokenizer, T5EncoderModel

    # local_files_only: cache hit or fail fast — a zero-egress
    # environment otherwise hangs on the hub fetch
    tok = AutoTokenizer.from_pretrained(model_name, local_files_only=True)
    enc = T5EncoderModel.from_pretrained(
        model_name, local_files_only=True).eval().to(device)
    batch = tok(texts, return_tensors="pt", padding="max_length",
                truncation=True, max_length=max_len)
    with torch.no_grad():
        out = enc(**batch).last_hidden_state
    return jnp.asarray(out.numpy())
