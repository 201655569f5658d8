"""Pallas TPU kernels.

First resident kernel: fused Snake activation with a custom VJP. Snake
(x + sin^2(a·x)/a) appears at every layer of the BigVGAN/codec stacks at
waveform rate — the forward AND backward are pure VPU elementwise chains, so
both are written as single Pallas kernels over VMEM tiles (the backward
recomputes sin/cos instead of storing activations: zero residual memory).

Falls back to pure jnp when Pallas is unavailable (CPU tests run with
interpret=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


_TILE_T = 256


def _snake_fwd_kernel(x_ref, alpha_ref, out_ref):
    x = x_ref[:]
    alpha = alpha_ref[:]  # (1, C) broadcast over time
    s = jnp.sin(alpha * x)
    out_ref[:] = x + s * s / (alpha + 1e-9)


def _snake_bwd_kernel(x_ref, alpha_ref, g_ref, dx_ref):
    x = x_ref[:]
    alpha = alpha_ref[:]
    g = g_ref[:]
    # d/dx [x + sin^2(ax)/a] = 1 + 2 sin(ax) cos(ax) = 1 + sin(2ax)
    dx_ref[:] = g * (1.0 + jnp.sin(2.0 * alpha * x))


def _pallas_elementwise(kernel, out_dtype, interpret, *inputs):
    """Run an elementwise kernel tiled over the time axis. inputs[0] is
    (B, T, C); alpha-like inputs are (1, C)."""
    x = inputs[0]
    b, t, c = x.shape
    grid = (b, pl.cdiv(t, _TILE_T))

    def x_map(i, j):
        return (i, j, 0)

    def alpha_map(i, j):
        return (0, 0)

    in_specs = [pl.BlockSpec((1, _TILE_T, c), x_map, memory_space=pltpu.VMEM)]
    for extra in inputs[1:]:
        if extra.shape == x.shape:
            in_specs.append(
                pl.BlockSpec((1, _TILE_T, c), x_map, memory_space=pltpu.VMEM)
            )
        else:
            in_specs.append(
                pl.BlockSpec((1, c), alpha_map, memory_space=pltpu.VMEM)
            )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, _TILE_T, c), x_map, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def snake_pallas(x: jax.Array, alpha: jax.Array, interpret: bool = False):
    """Fused Snake: x (B, T, C), alpha (C,) → (B, T, C)."""
    return _snake_fwd(x, alpha, interpret)[0]


def _snake_fwd(x, alpha, interpret):
    if not _HAS_PALLAS:
        s = jnp.sin(alpha[None, None, :] * x)
        return x + s * s / (alpha[None, None, :] + 1e-9), (x, alpha)
    a2 = alpha[None, :]
    out = _pallas_elementwise(_snake_fwd_kernel, x.dtype, interpret, x, a2)
    return out, (x, alpha)


def _snake_bwd(interpret, res, g):
    x, alpha = res
    if not _HAS_PALLAS:
        dx = g * (1.0 + jnp.sin(2.0 * alpha[None, None, :] * x))
    else:
        dx = _pallas_elementwise(
            _snake_bwd_kernel, x.dtype, interpret, x, alpha[None, :], g
        )
    # d/dalpha [x + sin^2(ax)/a] = x sin(2ax)/a - sin^2(ax)/a^2
    a = alpha[None, None, :]
    s = jnp.sin(a * x)
    dalpha = jnp.sum(
        g * (x * jnp.sin(2.0 * a * x) / (a + 1e-9) - s * s / ((a + 1e-9) ** 2)),
        axis=(0, 1),
    )
    return dx, dalpha


snake_pallas.defvjp(_snake_fwd, _snake_bwd)
