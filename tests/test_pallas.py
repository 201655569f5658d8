"""Pallas kernel tests — interpret mode on CPU, compiled on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.ops.pallas_kernels import snake_pallas


def _ref_snake(x, alpha):
    a = alpha[None, None, :]
    return x + jnp.sin(a * x) ** 2 / (a + 1e-9)


def test_snake_pallas_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((2, 256, 8)).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0.5, 2.0, 8).astype(np.float32))
    out = snake_pallas(x, alpha, True)  # interpret mode on CPU
    ref = _ref_snake(x, alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_snake_pallas_gradients(rng):
    x = jnp.asarray(rng.standard_normal((1, 256, 4)).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0.5, 2.0, 4).astype(np.float32))

    gx, galpha = jax.grad(
        lambda x, a: jnp.sum(snake_pallas(x, a, True) ** 2), argnums=(0, 1)
    )(x, alpha)
    gx_ref, galpha_ref = jax.grad(
        lambda x, a: jnp.sum(_ref_snake(x, a) ** 2), argnums=(0, 1)
    )(x, alpha)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(galpha), np.asarray(galpha_ref), rtol=1e-3, atol=1e-4
    )


def test_snake_pallas_ragged_time(rng):
    # time axis not a multiple of the tile size
    x = jnp.asarray(rng.standard_normal((1, 300, 8)).astype(np.float32))
    alpha = jnp.ones(8)
    out = snake_pallas(x, alpha, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref_snake(x, alpha)), atol=1e-5
    )
