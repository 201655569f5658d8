"""ComoSVC: consistency-model distillation of diffusion SVC.

Same capability as the reference (reference:
`models/svc/comosvc/comosvc_trainer.py:18` — teacher diffusion model loaded
frozen (`_load_teacher_model:30`), student trained with the consistency
objective over adjacent Karras sigmas, single-step inference via
`modules/diffusion/karras/`): the student learns f(x_sigma, sigma) ≈ x0 such
that consistency holds along the teacher's ODE trajectory.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.models.svc.diffusion_svc import DiffusionSVC, DiffusionSVCConfig
from amphion_tpu.modules.diffusion import (
    consistency_sample,
    edm_denoiser_scalings,
    karras_sigmas,
)


class ComoSVC(nn.Module):
    """EDM-preconditioned x0-denoiser sharing the DiffusionSVC backbone."""

    cfg: DiffusionSVCConfig
    sigma_data: float = 0.5

    def setup(self):
        self.backbone = DiffusionSVC(self.cfg)

    def denoised(self, x, sigma, features: dict):
        """Consistency function f(x, sigma) -> x0 estimate."""
        c_skip, c_out, c_in = edm_denoiser_scalings(sigma, self.sigma_data)
        # map sigma to a pseudo-timestep for the embedding
        t = jnp.log(sigma + 1e-8) * 0.25 * 1000.0
        b = x.shape[0]
        f = self.backbone.denoise(c_in * x, jnp.full((b,), t), features)
        return c_skip * x + c_out * f


def consistency_distill_step(
    student: ComoSVC,
    student_params,
    teacher_eps_fn,  # (x, t_int) -> eps  (frozen teacher)
    teacher_schedule,
    mel: jax.Array,
    features: dict,
    mask: jax.Array,
    rng: jax.Array,
    num_sigmas: int = 40,
):
    """One consistency-distillation loss evaluation.

    Draws adjacent Karras sigmas (s_{i+1} > s_i), takes a teacher ODE step
    from x_{s_{i+1}} toward s_i, and penalizes
    ||f_theta(x_{s_{i+1}}, s_{i+1}) - f_theta-(x_s_i^teacher, s_i)||^2 with
    the target branch stop-gradded (EMA teacher simplified to same params).
    """
    sigmas = jnp.asarray(karras_sigmas(num_sigmas), jnp.float32)
    r_i, r_n = jax.random.split(rng)
    b = mel.shape[0]
    i = jax.random.randint(r_i, (), 0, num_sigmas - 1)
    s_hi = sigmas[i]
    s_lo = sigmas[i + 1]
    noise = jax.random.normal(r_n, mel.shape)
    x_hi = mel + s_hi * noise

    # teacher ODE (Euler) step from s_hi to s_lo using eps prediction
    ab = jnp.asarray(teacher_schedule.alphas_bar, jnp.float32)
    # convert sigma to the teacher's discrete t: sigma = sqrt((1-ab)/ab)
    sig_all = jnp.sqrt((1 - ab) / ab)
    t_hi = jnp.argmin(jnp.abs(sig_all - s_hi))
    eps = teacher_eps_fn(x_hi / jnp.sqrt(1 + s_hi**2), t_hi)
    d = eps  # dx/dsigma ≈ eps for VE parameterization
    x_lo = x_hi + (s_lo - s_hi) * d

    f_hi = student.apply(
        {"params": student_params}, x_hi, jnp.full((), s_hi), features,
        method=ComoSVC.denoised,
    )
    f_lo = student.apply(
        {"params": student_params}, x_lo, jnp.full((), s_lo), features,
        method=ComoSVC.denoised,
    )
    f_lo = jax.lax.stop_gradient(f_lo)
    w = mask[..., None]
    loss = jnp.sum(((f_hi - f_lo) ** 2) * w) / jnp.maximum(
        jnp.sum(w) * mel.shape[-1], 1.0
    )
    return loss


def comosvc_sample(
    student: ComoSVC, params, features: dict, shape: tuple, rng: jax.Array,
    sigmas: tuple = (80.0,),
):
    """Single/few-step inference (the ComoSVC selling point)."""

    def denoised_fn(x, sigma):
        return student.apply(
            {"params": params}, x, sigma, features, method=ComoSVC.denoised
        )

    return consistency_sample(denoised_fn, shape, rng, sigmas)
