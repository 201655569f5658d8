"""Noro: noise-robust zero-shot voice conversion.

Reference: `models/vc/Noro/noro_model.py:16` + `noro_trainer.py` — a
diffusion model over mel conditioned on source content (SSL features + F0)
and a reference-speech speaker branch; robustness comes from dual-branch
training (clean and noisy references) with a noise-agnostic contrastive
speaker loss pulling the two reference embeddings together.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.diffusion import DiffusionSchedule, ddim_sample
from amphion_tpu.modules.wavenet_denoiser import WaveNetDenoiser, WaveNetDenoiserConfig


@dataclass(frozen=True)
class NoroConfig:
    n_mel: int = 80
    content_dim: int = 768  # SSL content feature dim
    hidden: int = 256
    num_train_steps: int = 1000
    contrastive_weight: float = 0.25
    denoiser: WaveNetDenoiserConfig = field(
        default_factory=lambda: WaveNetDenoiserConfig(
            in_dim=80, hidden=256, num_layers=12, cond_dim=256
        )
    )


class ReferenceEncoder(nn.Module):
    """Reference mel → global speaker embedding."""

    dim: int

    @nn.compact
    def __call__(self, ref_mel):
        h = ref_mel
        for ch in (128, 256, self.dim):
            h = nn.Conv(ch, (5,), strides=(2,), padding="SAME")(h)
            h = nn.gelu(h)
        return jnp.mean(h, axis=1)


class Noro(nn.Module):
    cfg: NoroConfig

    def setup(self):
        c = self.cfg
        self.content_proj = nn.Dense(c.hidden)
        self.pitch_proj = nn.Dense(c.hidden)
        self.ref_encoder = ReferenceEncoder(c.hidden)
        self.denoiser = WaveNetDenoiser(c.denoiser)

    @property
    def schedule(self) -> DiffusionSchedule:
        return DiffusionSchedule.create(self.cfg.num_train_steps)

    def _cond(self, content, f0, spk):
        cond = self.content_proj(content) + self.pitch_proj(
            jnp.log1p(jnp.maximum(f0, 0.0))[..., None]
        )
        return cond + spk[:, None, :]

    def denoise(self, x_t, t, content, f0, spk):
        return self.denoiser(x_t, t, self._cond(content, f0, spk))

    def loss(self, mel, content, f0, ref_clean, ref_noisy, mask, rng):
        """Dual-branch training: diffusion loss with the CLEAN reference +
        contrastive alignment of clean/noisy speaker embeddings."""
        c = self.cfg
        spk_c = self.ref_encoder(ref_clean)
        spk_n = self.ref_encoder(ref_noisy)
        r_t, r_n, r_b = jax.random.split(rng, 3)
        # randomly train through either branch (robustness)
        use_noisy = jax.random.bernoulli(r_b, 0.5, (mel.shape[0],))
        spk = jnp.where(use_noisy[:, None], spk_n, spk_c)

        sched = self.schedule
        b = mel.shape[0]
        t = jax.random.randint(r_t, (b,), 0, sched.num_steps)
        noise = jax.random.normal(r_n, mel.shape)
        x_t = sched.q_sample(mel, t, noise)
        eps = self.denoise(x_t, t, content, f0, spk)
        w = mask[..., None]
        diff = jnp.sum(((eps - noise) ** 2) * w) / jnp.maximum(
            jnp.sum(w) * mel.shape[-1], 1.0
        )
        # noise-agnostic contrastive speaker loss (InfoNCE over the batch)
        zc = spk_c / (jnp.linalg.norm(spk_c, axis=-1, keepdims=True) + 1e-8)
        zn = spk_n / (jnp.linalg.norm(spk_n, axis=-1, keepdims=True) + 1e-8)
        sim = zc @ zn.T / 0.07
        labels = jnp.arange(b)
        logp = jax.nn.log_softmax(sim, axis=-1)
        contrast = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], -1))
        total = diff + c.contrastive_weight * contrast
        return total, {"diff": diff, "contrastive": contrast}


def noro_convert(model: Noro, params, content, f0, ref_mel, rng, num_steps=50):
    """Zero-shot VC: sample target mel given source content/F0 + reference."""
    spk = model.apply(
        {"params": params}, ref_mel,
        method=lambda m, r: m.ref_encoder(r),
    )
    b, t_len = content.shape[:2]
    shape = (b, t_len, model.cfg.n_mel)

    def eps_fn(x, t):
        return model.apply(
            {"params": params}, x, jnp.full((b,), t), content, f0, spk,
            method=Noro.denoise,
        )

    return ddim_sample(eps_fn, model.schedule, shape, rng, num_steps)
