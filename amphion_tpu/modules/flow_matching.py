"""Conditional flow matching (OT-CFM): training loss + ODE samplers.

The reference's flow-matching transformers (reference:
`models/vc/flow_matching_transformer/fmt_model.py`, used by Vevo/Vevo1.5 with
32 Euler steps, `models/vc/vevo/vevo_utils.py:414`) train with the
optimal-transport CFM objective: x_t = (1-t) x0 + t x1 (x0 ~ N(0,I)),
target velocity v = x1 - x0. Samplers are `lax.scan` Euler / midpoint ODE
integrators with optional classifier-free guidance.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def cfm_pair(x1: jax.Array, t: jax.Array, noise: jax.Array, sigma_min: float = 1e-4):
    """OT-CFM interpolant: returns (x_t, target_velocity).

    x_t = (1 - (1-sigma_min) t) x0 + t x1 ; v* = x1 - (1-sigma_min) x0
    with x0 = noise and t broadcast over trailing dims.
    """
    shape = (-1,) + (1,) * (x1.ndim - 1)
    tt = t.reshape(shape)
    x_t = (1.0 - (1.0 - sigma_min) * tt) * noise + tt * x1
    v = x1 - (1.0 - sigma_min) * noise
    return x_t, v


def cfm_loss(
    v_pred: jax.Array, v_target: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    err = (v_pred - v_target) ** 2
    if mask is None:
        return jnp.mean(err)
    m = mask[..., None] if mask.ndim == err.ndim - 1 else mask
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * err.shape[-1] / max(m.shape[-1], 1), 1.0)


def euler_sample(
    velocity_fn: Callable,  # (x, t) -> v
    shape: tuple,
    rng: jax.Array,
    num_steps: int = 32,
    t_start: float = 0.0,
) -> jax.Array:
    """Euler ODE integration from noise (t=0) to data (t=1), one scan."""
    x = jax.random.normal(rng, shape)
    ts = np.linspace(t_start, 1.0, num_steps + 1).astype(np.float32)
    pairs = jnp.stack([jnp.asarray(ts[:-1]), jnp.asarray(ts[1:])], axis=1)

    def body(x, tt):
        t, t_next = tt[0], tt[1]
        v = velocity_fn(x, t)
        return x + (t_next - t) * v, None

    x, _ = jax.lax.scan(body, x, pairs)
    return x


def midpoint_sample(
    velocity_fn: Callable,
    shape: tuple,
    rng: jax.Array,
    num_steps: int = 16,
) -> jax.Array:
    """2nd-order midpoint ODE integration, one scan."""
    x = jax.random.normal(rng, shape)
    ts = np.linspace(0.0, 1.0, num_steps + 1).astype(np.float32)
    pairs = jnp.stack([jnp.asarray(ts[:-1]), jnp.asarray(ts[1:])], axis=1)

    def body(x, tt):
        t, t_next = tt[0], tt[1]
        h = t_next - t
        v1 = velocity_fn(x, t)
        v2 = velocity_fn(x + 0.5 * h * v1, t + 0.5 * h)
        return x + h * v2, None

    x, _ = jax.lax.scan(body, x, pairs)
    return x


def with_cfg(velocity_fn_cond: Callable, velocity_fn_uncond: Callable, scale: float):
    """Classifier-free guidance wrapper: v = v_u + scale (v_c - v_u)."""

    def fn(x, t):
        vc = velocity_fn_cond(x, t)
        vu = velocity_fn_uncond(x, t)
        return vu + scale * (vc - vu)

    return fn
