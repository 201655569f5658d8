"""Diffusion SVC ("MultipleContentsSVC" / DiffWaveNetSVC).

Same capability as the reference (reference:
`models/svc/diffusion/diffusion_trainer.py:14` + condition encoder
`modules/encoder/condition_encoder.py:147` + bidilated-conv denoiser
`modules/diffusion/bidilconv/bidilated_conv.py:14`, samplers via diffusers
DDPM/DDIM/PNDM in `diffusion_inference_pipeline.py`): SSL content features +
melody (F0/UV) + loudness + singer ID condition a dilated-conv denoiser that
learns mel via DDPM. TPU design: condition encoder + WaveNet denoiser from
the module library, schedules/samplers as compile-time scans.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.condition_encoder import (
    ConditionEncoder,
    ConditionEncoderConfig,
)
from amphion_tpu.modules.diffusion import (
    DiffusionSchedule,
    ddim_sample,
    ddpm_sample,
)
from amphion_tpu.modules.wavenet_denoiser import (
    WaveNetDenoiser,
    WaveNetDenoiserConfig,
)


@dataclass(frozen=True)
class DiffusionSVCConfig:
    n_mel: int = 100
    condition: ConditionEncoderConfig = field(default_factory=ConditionEncoderConfig)
    denoiser: WaveNetDenoiserConfig = field(
        default_factory=lambda: WaveNetDenoiserConfig(in_dim=100, cond_dim=384)
    )
    num_train_steps: int = 1000
    schedule: str = "linear"


class DiffusionSVC(nn.Module):
    cfg: DiffusionSVCConfig

    def setup(self):
        c = self.cfg
        self.condition_encoder = ConditionEncoder(c.condition)
        self.denoiser = WaveNetDenoiser(c.denoiser)

    @property
    def schedule(self) -> DiffusionSchedule:
        return DiffusionSchedule.create(self.cfg.num_train_steps, self.cfg.schedule)

    def denoise(self, x_t, t, features: dict):
        cond = self.condition_encoder(features)
        return self.denoiser(x_t, t, cond)

    def encode_condition(self, features: dict):
        return self.condition_encoder(features)

    def denoise_cond(self, x_t, t, cond):
        return self.denoiser(x_t, t, cond)

    def loss(self, mel, features: dict, mask, rng):
        """Epsilon-prediction MSE (masked). mel: (B, T, n_mel)."""
        sched = self.schedule
        r_t, r_n = jax.random.split(rng)
        b = mel.shape[0]
        t = jax.random.randint(r_t, (b,), 0, sched.num_steps)
        noise = jax.random.normal(r_n, mel.shape)
        x_t = sched.q_sample(mel, t, noise)
        eps = self.denoise(x_t, t, features)
        w = mask[..., None]
        loss = jnp.sum(((eps - noise) ** 2) * w) / jnp.maximum(
            jnp.sum(w) * mel.shape[-1], 1.0
        )
        return loss, {"diff_loss": loss}


@functools.lru_cache(maxsize=16)
def _diffusion_svc_sample_jitted(model, shape, sampler, num_steps,
                                 compute_dtype, return_trajectory=False):
    sched = model.schedule
    dt = jnp.dtype(compute_dtype)

    def core(params, features, rng):
        # condition encoder runs ONCE outside the denoise scan; the
        # num_steps x WaveNet loop runs in compute_dtype, sampler
        # coefficient math stays f32 (eps upcast)
        cond = model.apply(
            {"params": params}, features,
            method=DiffusionSVC.encode_condition)
        params_dt = jax.tree_util.tree_map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
        cond_dt = cond.astype(dt)

        def eps_fn(x, t):
            tt = jnp.full((shape[0],), t)
            return model.apply(
                {"params": params_dt}, x.astype(dt), tt, cond_dt,
                method=DiffusionSVC.denoise_cond).astype(jnp.float32)

        if sampler == "ddpm":
            return ddpm_sample(eps_fn, sched, shape, rng, num_steps,
                               return_trajectory=return_trajectory)
        return ddim_sample(eps_fn, sched, shape, rng, num_steps,
                           return_trajectory=return_trajectory)

    return jax.jit(core)


def diffusion_svc_sample(
    model: DiffusionSVC,
    params,
    features: dict,
    shape: tuple,
    rng: jax.Array,
    sampler: str = "ddim",
    num_steps: int = 50,
    compute_dtype: str = "bfloat16",
    return_trajectory: bool = False,
):
    """Sample mel given conditioning (ref `diffusion_inference_pipeline.py`).
    Memoized self-jitting; denoiser in ``compute_dtype`` (bf16 default).
    ``return_trajectory``: also return the stacked per-step mels
    (SingVisio dumps)."""
    return _diffusion_svc_sample_jitted(
        model, tuple(shape), sampler, num_steps, compute_dtype,
        return_trajectory)(params, features, rng)
