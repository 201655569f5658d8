"""Gaussian diffusion: schedules, training targets, and scan-based samplers.

Covers the reference's diffusion machinery (reference: diffusers-wrapped
DDPM/DDIM/PNDM in `models/svc/diffusion/diffusion_wrapper.py` and
`models/tta/ldm/audioldm_trainer.py:47`; Karras/EDM + consistency models in
`modules/diffusion/karras/karras_diffusion.py:59` and `sample.py:31-165`)
re-designed for TPU: schedules are precomputed compile-time constants, every
sampler is a `lax.scan` over a static number of steps (one compiled program,
no per-step dispatch), and the denoiser is any `fn(x_t, t, cond) -> eps/x0`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def linear_betas(n: int, start: float = 1e-4, end: float = 0.02) -> np.ndarray:
    return np.linspace(start, end, n, dtype=np.float64)


def cosine_betas(n: int, s: float = 0.008) -> np.ndarray:
    t = np.linspace(0, n, n + 1) / n
    f = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
    alphas_bar = f / f[0]
    betas = 1 - alphas_bar[1:] / alphas_bar[:-1]
    return np.clip(betas, 0, 0.999)


@dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed DDPM quantities (all numpy → compile-time constants)."""

    betas: tuple  # stored as tuples for hashability under jit static args
    num_steps: int

    @classmethod
    def create(cls, num_steps: int = 1000, kind: str = "linear", **kw):
        betas = linear_betas(num_steps, **kw) if kind == "linear" else cosine_betas(num_steps)
        return cls(betas=tuple(betas.tolist()), num_steps=num_steps)

    @property
    def alphas_bar(self) -> np.ndarray:
        return np.cumprod(1.0 - np.asarray(self.betas))

    def q_sample(self, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """Forward process: x_t = sqrt(a_bar) x0 + sqrt(1-a_bar) eps."""
        ab = jnp.asarray(self.alphas_bar, x0.dtype)[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (
            jnp.sqrt(ab).reshape(shape) * x0
            + jnp.sqrt(1.0 - ab).reshape(shape) * noise
        )

    def training_target(self, x0, noise, t, prediction_type: str = "epsilon"):
        if prediction_type == "epsilon":
            return noise
        if prediction_type == "sample":
            return x0
        if prediction_type == "v":
            ab = jnp.asarray(self.alphas_bar, x0.dtype)[t]
            s = (-1,) + (1,) * (x0.ndim - 1)
            return (
                jnp.sqrt(ab).reshape(s) * noise - jnp.sqrt(1 - ab).reshape(s) * x0
            )
        raise ValueError(prediction_type)


def ddpm_sample(
    denoise_fn: Callable,
    schedule: DiffusionSchedule,
    shape: tuple,
    rng: jax.Array,
    num_steps: int | None = None,
    return_trajectory: bool = False,
) -> jax.Array:
    """Ancestral DDPM sampling (eps-prediction) as one lax.scan.
    ``return_trajectory`` additionally stacks every intermediate x
    (SingVisio step dumps)."""
    n = schedule.num_steps
    steps = num_steps or n
    ts = np.linspace(n - 1, 0, steps).round().astype(np.int32)
    betas = np.asarray(schedule.betas)
    alphas = 1.0 - betas
    ab = schedule.alphas_bar

    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape)

    def body(carry, t):
        x, rng = carry
        rng, step_rng = jax.random.split(rng)
        eps = denoise_fn(x, t)
        a_t = jnp.asarray(alphas, x.dtype)[t]
        ab_t = jnp.asarray(ab, x.dtype)[t]
        b_t = jnp.asarray(betas, x.dtype)[t]
        mean = (x - b_t / jnp.sqrt(1 - ab_t) * eps) / jnp.sqrt(a_t)
        noise = jax.random.normal(step_rng, x.shape)
        x = jnp.where(t > 0, mean + jnp.sqrt(b_t) * noise, mean)
        return (x, rng), (x if return_trajectory else None)

    (x, _), traj = jax.lax.scan(body, (x, rng), jnp.asarray(ts))
    return (x, traj) if return_trajectory else x


def ddim_sample(
    denoise_fn: Callable,
    schedule: DiffusionSchedule,
    shape: tuple,
    rng: jax.Array,
    num_steps: int = 50,
    eta: float = 0.0,
    return_trajectory: bool = False,
) -> jax.Array:
    """DDIM sampling as one lax.scan over a strided timestep ladder.
    ``return_trajectory`` additionally stacks every intermediate x."""
    n = schedule.num_steps
    ts = np.linspace(n - 1, 0, num_steps + 1).round().astype(np.int32)
    ab = np.concatenate([schedule.alphas_bar, [1.0]])  # ab[-1] for t=-1 ≈ 1

    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape)
    pairs = jnp.stack([jnp.asarray(ts[:-1]), jnp.asarray(ts[1:])], axis=1)

    def body(carry, tt):
        x, rng = carry
        t, t_prev = tt[0], tt[1]
        rng, step_rng = jax.random.split(rng)
        eps = denoise_fn(x, t)
        ab_t = jnp.asarray(ab, x.dtype)[t]
        ab_p = jnp.asarray(ab, x.dtype)[t_prev]
        x0 = (x - jnp.sqrt(1 - ab_t) * eps) / jnp.sqrt(ab_t)
        sigma = eta * jnp.sqrt((1 - ab_p) / (1 - ab_t) * (1 - ab_t / ab_p))
        dir_xt = jnp.sqrt(jnp.maximum(1 - ab_p - sigma**2, 0.0)) * eps
        noise = jax.random.normal(step_rng, x.shape)
        x = jnp.sqrt(ab_p) * x0 + dir_xt + sigma * noise
        return (x, rng), (x if return_trajectory else None)

    (x, _), traj = jax.lax.scan(body, (x, rng), pairs)
    return (x, traj) if return_trajectory else x


# ---------------------------------------------------------------------------
# Karras / EDM (consistency-model teacher; ref `karras_diffusion.py:59`)
# ---------------------------------------------------------------------------


def karras_sigmas(n: int, sigma_min=0.002, sigma_max=80.0, rho=7.0) -> np.ndarray:
    ramp = np.linspace(0, 1, n)
    min_r, max_r = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
    return (max_r + ramp * (min_r - max_r)) ** rho


def edm_denoiser_scalings(sigma: jax.Array, sigma_data: float = 0.5):
    """EDM preconditioning: c_skip, c_out, c_in."""
    c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)
    c_out = sigma * sigma_data / jnp.sqrt(sigma**2 + sigma_data**2)
    c_in = 1.0 / jnp.sqrt(sigma**2 + sigma_data**2)
    return c_skip, c_out, c_in


def heun_sample(
    denoised_fn: Callable,  # (x, sigma) -> x0 estimate
    shape: tuple,
    rng: jax.Array,
    num_steps: int = 40,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
) -> jax.Array:
    """Karras 2nd-order (Heun) deterministic sampler as one scan."""
    sigmas = np.append(karras_sigmas(num_steps, sigma_min, sigma_max), 0.0)
    x = jax.random.normal(rng, shape) * sigmas[0]
    pairs = jnp.stack(
        [jnp.asarray(sigmas[:-1], jnp.float32), jnp.asarray(sigmas[1:], jnp.float32)],
        axis=1,
    )

    def body(x, ss):
        s, s_next = ss[0], ss[1]
        d = (x - denoised_fn(x, s)) / s
        x_next = x + (s_next - s) * d
        # Heun correction (skipped at the final step where s_next == 0)
        def correct(x_next):
            d2 = (x_next - denoised_fn(x_next, s_next)) / s_next
            return x + (s_next - s) * 0.5 * (d + d2)

        x = jax.lax.cond(s_next > 0, correct, lambda xn: xn, x_next)
        return x, None

    x, _ = jax.lax.scan(body, x, pairs)
    return x


def consistency_sample(
    denoised_fn: Callable,  # (x, sigma) -> x0 estimate (consistency model)
    shape: tuple,
    rng: jax.Array,
    sigmas: tuple = (80.0,),
    sigma_min: float = 0.002,
) -> jax.Array:
    """One/few-step consistency-model sampling (ref `karras_diffusion.py`,
    used by DiffComoSVC single-step inference)."""
    rng, r = jax.random.split(rng)
    x = jax.random.normal(r, shape) * sigmas[0]
    x = denoised_fn(x, jnp.asarray(sigmas[0], jnp.float32))
    for s in sigmas[1:]:
        rng, r = jax.random.split(rng)
        x = x + jnp.sqrt(s**2 - sigma_min**2) * jax.random.normal(r, shape)
        x = denoised_fn(x, jnp.asarray(s, jnp.float32))
    return x


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 1e4) -> jax.Array:
    """Sinusoidal timestep embedding (shared by all denoisers)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb
