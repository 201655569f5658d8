"""Noro: noise-robust zero-shot voice conversion, checkpoint-compatible
with the reference (`models/vc/Noro/noro_model.py`):

- ReferenceEncoder (`:701`): in/out linears + the NS2-family transformer
  (use_new_ffn → conv-SiLU-linear FFN, no SALN) + learned speaker queries
  attending over the encoded reference (heads = hidden // 64);
- content_f0_enc (`Noro_VCmodel:1133`): LayerNorm over [content ; f0] then
  a k3 conv to hidden;
- DiffWaveNet + mean-reverting-SDE diffusion — identical classes to
  NaturalSpeech2's (`wavenet.py`/`diffusion.py` copies), reused from
  `amphion_tpu/models/tts/naturalspeech2/ns2`;
- robustness: dual clean/noisy reference branches averaged (ref
  `Noro_VCmodel.forward`) + a noise-agnostic contrastive speaker loss
  (trainer-side in the reference).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.tts.naturalspeech2.ns2 import MHA, Diffusion, NS2Config
from amphion_tpu.modules.saln_transformer import NS3TransformerEncoder


@dataclass(frozen=True)
class NoroConfig:
    n_mel: int = 80
    content_dim: int = 768  # SSL content feature dim (mhubert)
    hidden: int = 512
    ref_in_dim: int = 80  # reference branch input (mel)
    ref_layers: int = 6
    ref_heads: int = 8
    ref_filter: int = 2048
    ref_kernel: int = 5
    num_query_emb: int = 32
    wavenet_layers: int = 40
    wavenet_cattn_every: int = 3
    wavenet_dilation_cycle: int = 2
    wavenet_heads: int = 8
    beta_min: float = 0.05
    beta_max: float = 20.0
    sigma: float = 1.0
    noise_factor: float = 1.0
    contrastive_weight: float = 0.25

    def ns2(self) -> NS2Config:
        return NS2Config(
            latent_dim=self.n_mel, hidden=self.hidden,
            wavenet_layers=self.wavenet_layers,
            wavenet_cattn_every=self.wavenet_cattn_every,
            wavenet_dilation_cycle=self.wavenet_dilation_cycle,
            wavenet_heads=self.wavenet_heads, beta_min=self.beta_min,
            beta_max=self.beta_max, sigma=self.sigma,
            noise_factor=self.noise_factor,
        )


class ReferenceEncoder(nn.Module):
    """ref noro_model.py:701."""

    cfg: NoroConfig

    def setup(self):
        c = self.cfg
        self.in_linear = (nn.Dense(c.hidden, name="in_linear")
                          if c.ref_in_dim != c.hidden else None)
        self.transformer_encoder = NS3TransformerEncoder(
            hidden=c.hidden, num_layers=c.ref_layers, heads=c.ref_heads,
            filter_size=c.ref_filter, kernel_size=c.ref_kernel,
            use_cln=False, ffn_act="silu", name="transformer_encoder")
        self.query_embs = nn.Embed(c.num_query_emb, c.hidden,
                                   name="query_embs")
        self.query_attn = MHA(c.hidden, max(c.hidden // 64, 1),
                              name="query_attn")

    def __call__(self, x_ref, ref_mask=None):
        """(B, T', ref_in_dim) → (spk_embs (B, Q, hidden), encoded x)."""
        c = self.cfg
        x = self.in_linear(x_ref) if self.in_linear is not None else x_ref
        x = self.transformer_encoder(x, mask=ref_mask)
        q = self.query_embs(jnp.arange(c.num_query_emb))[None]
        q = jnp.broadcast_to(q, (x.shape[0], c.num_query_emb, c.hidden))
        spk = self.query_attn(q, x, key_mask=ref_mask)
        return spk, x


class Noro(nn.Module):
    cfg: NoroConfig

    def setup(self):
        c = self.cfg
        self.reference_encoder = ReferenceEncoder(c, name="reference_encoder")
        self.content_f0_ln = nn.LayerNorm(epsilon=1e-5, name="content_f0_ln")
        self.content_f0_conv = nn.Conv(c.hidden, (3,), padding=[(1, 1)],
                                       name="content_f0_conv")
        self.diffusion = Diffusion(c.ns2(), name="diffusion")

    def _condition(self, content, f0):
        """ref Noro_VCmodel.content_f0_enc: LN([content ; f0]) → k3 conv."""
        h = jnp.concatenate([content, f0[..., None]], axis=-1)
        return self.content_f0_conv(self.content_f0_ln(h))

    def encode_reference(self, ref_mel, ref_mask=None):
        spk, _ = self.reference_encoder(ref_mel, ref_mask)
        return spk

    def loss(self, mel, content, f0, ref_clean, ref_noisy, mask, rng):
        """Dual-branch training (ref Noro_VCmodel.forward: clean + noisy
        reference embeddings AVERAGED) with the NS2-style x0+noise
        diffusion losses and a noise-agnostic contrastive speaker loss."""
        c = self.cfg
        spk_c, _ = self.reference_encoder(ref_clean)
        spk_n, _ = self.reference_encoder(ref_noisy)
        spk = (spk_c + spk_n) / 2.0
        cond = self._condition(content, f0)

        r_t, r_n = jax.random.split(rng)
        b = mel.shape[0]
        t = jnp.clip(jax.random.uniform(r_t, (b,)), 1e-5, 1.0 - 1e-5)
        z = jax.random.normal(r_n, mel.shape)
        diff = self.diffusion.loss_terms(mel, mask, cond, spk, t, z)
        w = mask[..., None]
        norm = jnp.maximum(jnp.sum(w) * mel.shape[-1], 1.0)
        diff_loss = (jnp.sum((diff["x0_pred"] - mel) ** 2 * w) / norm
                     + jnp.sum((diff["noise_pred"] - z) ** 2 * w) / norm)

        # noise-agnostic contrastive speaker loss (InfoNCE over the batch
        # on mean-pooled query embeddings)
        zc = jnp.mean(spk_c, axis=1)
        zn = jnp.mean(spk_n, axis=1)
        zc = zc / (jnp.linalg.norm(zc, axis=-1, keepdims=True) + 1e-8)
        zn = zn / (jnp.linalg.norm(zn, axis=-1, keepdims=True) + 1e-8)
        sim = zc @ zn.T / 0.07
        labels = jnp.arange(b)
        logp = jax.nn.log_softmax(sim, axis=-1)
        contrast = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], -1))
        total = diff_loss + c.contrastive_weight * contrast
        return total, {"diff": diff_loss, "contrastive": contrast}

    def denoise_step(self, xt, mask, cond, spk, t, h):
        return self.diffusion.cal_dxt(xt, mask, cond, spk, t, h)

    def prepare_inference(self, content, f0, ref_mel):
        spk, _ = self.reference_encoder(ref_mel)
        return self._condition(content, f0), spk


@functools.lru_cache(maxsize=16)
def _noro_convert_jitted(model, num_steps, compute_dtype):
    c = model.cfg
    dt = jnp.dtype(compute_dtype)
    h = 1.0 / num_steps

    def core(params, content, f0, ref_mel, rng):
        # reference/condition encoders run once in f32; the num_steps
        # denoise loop in compute_dtype with f32 SDE math (cal_dxt upcasts)
        cond, spk = model.apply(
            {"params": params}, content, f0, ref_mel,
            method=Noro.prepare_inference)
        b, t_len = content.shape[:2]
        params_dt = jax.tree_util.tree_map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
        cond_dt, spk_dt = cond.astype(dt), spk.astype(dt)
        xt = jax.random.normal(rng, (b, t_len, c.n_mel)) * c.noise_factor
        mask = jnp.ones((b, t_len))

        def body(x, i):
            t = (1.0 - (i.astype(jnp.float32) + 0.5) * h) * jnp.ones((b,))
            dxt = model.apply(
                {"params": params_dt}, x.astype(dt), mask, cond_dt, spk_dt,
                t, h, method=Noro.denoise_step)
            return x - dxt.astype(jnp.float32), None

        xt, _ = jax.lax.scan(body, xt, jnp.arange(num_steps))
        return xt

    return jax.jit(core)


def noro_convert(model: Noro, params, content, f0, ref_mel, rng,
                 num_steps=50, compute_dtype: str = "bfloat16"):
    """Zero-shot VC: reverse-SDE sample target mel given source content/F0
    + a reference (ref Noro inference → diffusion.reverse_diffusion).
    Memoized self-jitting; denoiser in ``compute_dtype``."""
    return _noro_convert_jitted(model, num_steps, compute_dtype)(
        params, content, f0, ref_mel, rng)
