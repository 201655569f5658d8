"""NaturalSpeech2: zero-shot latent-diffusion TTS over codec latents.

Reference: `models/tts/naturalspeech2/ns2.py:22` — prior encoder (phone
encoder + duration + pitch predictors with prompt-conditioned attention,
`modules/naturalpseech2/transformers.py`), a WaveNet denoiser
(`wavenet.py`) running diffusion (`diffusion.py`) or flow-matching
(`diffusion_flow.py`) over continuous codec latents, CE/duration/pitch
auxiliary losses; trained on the step-based trainer (`ns2_trainer.py`).

TPU design: prompt (reference speech latents) conditions through
mean-pooled style + cross-attention-free additive conditioning; the denoiser
is the shared WaveNet; both diffusion and flow-matching objectives are
supported via a config switch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.diffusion import DiffusionSchedule, ddim_sample
from amphion_tpu.modules.flow_matching import cfm_loss, cfm_pair, euler_sample
from amphion_tpu.modules.duration import length_regulate
from amphion_tpu.modules.norms import StyleAdaptiveLayerNorm
from amphion_tpu.modules.transformer import TransformerEncoder
from amphion_tpu.modules.wavenet_denoiser import WaveNetDenoiser, WaveNetDenoiserConfig


@dataclass(frozen=True)
class NS2Config:
    num_phones: int = 512
    latent_dim: int = 128  # codec latent channels
    hidden: int = 256
    n_layers: int = 4
    n_heads: int = 4
    ffn_hidden: int = 1024
    max_frames: int = 1000
    mode: str = "diffusion"  # "diffusion" | "flow"
    num_train_steps: int = 1000
    denoiser: WaveNetDenoiserConfig = field(
        default_factory=lambda: WaveNetDenoiserConfig(
            in_dim=128, hidden=256, num_layers=12, cond_dim=256
        )
    )


class PriorEncoder(nn.Module):
    cfg: NS2Config

    @nn.compact
    def __call__(self, phones, phone_mask, style, durations=None, pitch=None,
                 deterministic=True):
        c = self.cfg
        x = nn.Embed(c.num_phones, c.hidden, name="phone_embed")(phones)
        x = TransformerEncoder(
            c.hidden, c.n_heads, c.n_layers, c.ffn_hidden, window_size=4,
            name="encoder",
        )(x, phone_mask, deterministic)
        x = StyleAdaptiveLayerNorm(name="style_norm")(x, style)

        log_d = nn.Dense(1, name="dur_out")(
            jax.nn.relu(nn.Conv(c.hidden, (3,), padding="SAME", name="dur_conv")(x))
        )[..., 0]
        if durations is None:
            durations = jnp.maximum(
                jnp.round(jnp.exp(log_d) - 1.0).astype(jnp.int32), 0
            ) * phone_mask.astype(jnp.int32)
        x_f, fmask = length_regulate(x, durations, c.max_frames)

        pitch_pred = nn.Dense(1, name="pitch_out")(
            jax.nn.relu(nn.Conv(c.hidden, (3,), padding="SAME", name="pitch_conv")(x_f))
        )[..., 0]
        p = pitch if pitch is not None else pitch_pred
        x_f = x_f + nn.Dense(c.hidden, name="pitch_embed")(p[..., None])
        return x_f, fmask.astype(jnp.float32), {
            "log_duration_pred": log_d,
            "pitch_pred": pitch_pred,
        }


class NaturalSpeech2(nn.Module):
    cfg: NS2Config

    def setup(self):
        c = self.cfg
        self.prior = PriorEncoder(c)
        self.denoiser = WaveNetDenoiser(c.denoiser)
        self.prompt_proj = nn.Dense(c.hidden)

    @property
    def schedule(self) -> DiffusionSchedule:
        return DiffusionSchedule.create(self.cfg.num_train_steps)

    def _style(self, prompt_latent):
        """Mean-pooled prompt style vector (B, hidden)."""
        return self.prompt_proj(jnp.mean(prompt_latent, axis=1))

    def denoise(self, z_t, t, cond, style):
        # style enters through the conditioner stream
        return self.denoiser(z_t, t, cond + style[:, None, :])

    def loss(self, latent, phones, phone_mask, prompt_latent, durations, pitch,
             rng):
        """latent: (B, T, latent_dim) target codec latents."""
        c = self.cfg
        style = self._style(prompt_latent)
        cond, fmask, var = self.prior(
            phones, phone_mask, style, durations, pitch
        )
        r_t, r_n = jax.random.split(rng)
        b = latent.shape[0]
        w = fmask[..., None]
        if c.mode == "flow":
            t = jnp.clip(jax.random.uniform(r_t, (b,)), 1e-5, 1.0)
            noise = jax.random.normal(r_n, latent.shape)
            z_t, v_tgt = cfm_pair(latent, t, noise)
            v = self.denoise(z_t, t * 1000.0, cond, style)
            diff_loss = cfm_loss(v, v_tgt, fmask)
        else:
            sched = self.schedule
            t = jax.random.randint(r_t, (b,), 0, sched.num_steps)
            noise = jax.random.normal(r_n, latent.shape)
            z_t = sched.q_sample(latent, t, noise)
            eps = self.denoise(z_t, t, cond, style)
            diff_loss = jnp.sum(((eps - noise) ** 2) * w) / jnp.maximum(
                jnp.sum(w) * latent.shape[-1], 1.0
            )
        log_d_tgt = jnp.log(durations.astype(jnp.float32) + 1.0)
        dur_loss = jnp.sum(((var["log_duration_pred"] - log_d_tgt) ** 2) * phone_mask) / jnp.maximum(jnp.sum(phone_mask), 1.0)
        pitch_loss = jnp.sum(((var["pitch_pred"] - pitch) ** 2) * fmask) / jnp.maximum(jnp.sum(fmask), 1.0)
        total = diff_loss + dur_loss + pitch_loss
        return total, {"diff": diff_loss, "dur": dur_loss, "pitch": pitch_loss}

    def prior_infer(self, phones, phone_mask, prompt_latent):
        style = self._style(prompt_latent)
        cond, fmask, _ = self.prior(phones, phone_mask, style)
        return cond, fmask, style


def ns2_sample(
    model: NaturalSpeech2, params, phones, phone_mask, prompt_latent, rng,
    num_steps: int = 50,
):
    """Sample codec latents for the phones, zero-shot via prompt."""
    c = model.cfg
    cond, fmask, style = model.apply(
        {"params": params}, phones, phone_mask, prompt_latent,
        method=NaturalSpeech2.prior_infer,
    )
    b, t_len = fmask.shape
    shape = (b, t_len, c.latent_dim)

    if c.mode == "flow":
        def vfield(x, t):
            return model.apply(
                {"params": params}, x, jnp.full((b,), t * 1000.0), cond, style,
                method=NaturalSpeech2.denoise,
            )
        z = euler_sample(vfield, shape, rng, num_steps)
    else:
        def eps_fn(x, t):
            return model.apply(
                {"params": params}, x, jnp.full((b,), t), cond, style,
                method=NaturalSpeech2.denoise,
            )
        z = ddim_sample(eps_fn, model.schedule, shape, rng, num_steps)
    return z * fmask[..., None], fmask
