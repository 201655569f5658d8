"""Optimizers & LR schedules beyond stock optax.

Reference surface: `optimizer/optimizers.py` (NoamLR:13, Eve:36,
ScaledAdam:273 — k2/icefall) and `schedulers/scheduler.py` (NoamScheduler:17,
Eden:42). Implemented as optax transformations so they compose with the
functional TrainState.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def noam_schedule(model_size: int, factor: float = 1.0, warmup: int = 4000):
    """Noam LR: factor * d^-0.5 * min(step^-0.5, step * warmup^-1.5)."""

    def sched(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return factor * model_size**-0.5 * jnp.minimum(s**-0.5, s * warmup**-1.5)

    return sched


def eden_schedule(base_lr: float, lr_batches: float = 5000.0,
                  lr_epochs: float = 6.0, steps_per_epoch: int = 1000):
    """Eden schedule (k2/icefall): decay in both batch and epoch count."""

    def sched(step):
        s = step.astype(jnp.float32)
        epoch = s / steps_per_epoch
        return (
            base_lr
            * ((s**2 + lr_batches**2) / lr_batches**2) ** -0.25
            * ((epoch**2 + lr_epochs**2) / lr_epochs**2) ** -0.25
        )

    return sched


class EveState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def eve(
    lr: float | optax.Schedule = 3e-4,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    target_rms: float = 0.1,
    weight_decay: float = 1e-3,
) -> optax.GradientTransformation:
    """Eve (k2): AdamW whose weight decay pulls parameter RMS toward
    ``target_rms`` — decay strength scales with how far above target the
    parameter RMS is (ref `optimizers.py:36-170`)."""

    def init(params):
        return EveState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params):
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads
        )
        mu_hat = jax.tree_util.tree_map(lambda m: m / (1 - b1**count), mu)
        nu_hat = jax.tree_util.tree_map(lambda v: v / (1 - b2**count), nu)
        step_lr = lr(count) if callable(lr) else lr

        def upd(p, m, v):
            if p.ndim == 0:
                wd = 0.0
            else:
                rms = jnp.sqrt(jnp.mean(p**2) + 1e-12)
                wd = weight_decay * jnp.maximum(rms / target_rms - 1.0, 0.0)
            return -step_lr * (m / (jnp.sqrt(v) + eps) + wd * p)

        updates = jax.tree_util.tree_map(upd, params, mu_hat, nu_hat)
        return updates, EveState(count, mu, nu)

    return optax.GradientTransformation(init, update)


class ScaledAdamState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates
    param_rms: optax.Updates


def scaled_adam(
    lr: float | optax.Schedule = 3e-2,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    param_min_rms: float = 1e-5,
    param_max_rms: float = 3.0,
    clipping_scale: float = 2.0,
) -> optax.GradientTransformation:
    """ScaledAdam (k2/icefall, ref `optimizers.py:273-700`): Adam whose step
    size is proportional to each parameter tensor's RMS — scale-invariant
    learning without explicit LR tuning per layer."""

    def init(params):
        return ScaledAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
            param_rms=jax.tree_util.tree_map(
                lambda p: jnp.sqrt(jnp.mean(p**2) + 1e-12)
                if p.ndim > 0 else jnp.ones(()),
                params,
            ),
        )

    def update(grads, state, params):
        count = state.count + 1
        # global gradient clipping scaled by median-ish norm proxy
        gnorm = optax.global_norm(grads)
        clip = jnp.minimum(1.0, clipping_scale / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * clip, grads)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads
        )
        mu_hat = jax.tree_util.tree_map(lambda m: m / (1 - b1**count), mu)
        nu_hat = jax.tree_util.tree_map(lambda v: v / (1 - b2**count), nu)
        step_lr = lr(count) if callable(lr) else lr

        def upd(p, m, v):
            if p.ndim == 0:
                scale = 1.0
            else:
                rms = jnp.clip(
                    jnp.sqrt(jnp.mean(p**2) + 1e-12), param_min_rms, param_max_rms
                )
                scale = rms
            return -step_lr * scale * m / (jnp.sqrt(v) + eps)

        updates = jax.tree_util.tree_map(upd, params, mu_hat, nu_hat)
        new_rms = jax.tree_util.tree_map(
            lambda p: jnp.sqrt(jnp.mean(p**2) + 1e-12) if p.ndim > 0 else jnp.ones(()),
            params,
        )
        return updates, ScaledAdamState(count, mu, nu, new_rms)

    return optax.GradientTransformation(init, update)


def build_optimizer(name: str, cfg) -> optax.GradientTransformation:
    """Config-string optimizer factory (ref `new_trainer.py:550-673`)."""
    name = name.lower()
    if name == "adamw":
        return optax.adamw(cfg.get("lr", 2e-4), b1=cfg.get("adam_b1", 0.9),
                           b2=cfg.get("adam_b2", 0.999),
                           weight_decay=cfg.get("weight_decay", 1e-2))
    if name == "adam":
        return optax.adam(cfg.get("lr", 2e-4))
    if name == "sgd":
        return optax.sgd(cfg.get("lr", 1e-2), momentum=cfg.get("momentum", 0.9))
    if name == "eve":
        return eve(cfg.get("lr", 3e-4))
    if name == "scaledadam":
        return scaled_adam(cfg.get("lr", 3e-2))
    raise ValueError(f"unknown optimizer {name!r}")


def maybe_accumulate(tx: optax.GradientTransformation, train_cfg):
    """Wrap with optax.MultiSteps when train.gradient_accumulation_steps > 1
    (the TPU-native equivalent of the reference's `accelerator.accumulate`,
    `models/base/new_trainer.py:362`): gradients average across k micro-steps
    and the update applies on the k-th."""
    k = int(train_cfg.get("gradient_accumulation_steps", 1) or 1)
    if k <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=k)
