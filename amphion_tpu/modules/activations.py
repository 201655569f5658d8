"""Periodic activations: Snake / SnakeBeta (BigVGAN family).

Reference: `modules/activation_functions/snake.py:11,64`. x + (1/a) sin^2(ax),
with per-channel learned frequency (and amplitude for SnakeBeta), optionally
parameterized in log scale.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class Snake(nn.Module):
    channels: int
    alpha_logscale: bool = False
    use_pallas: bool = False  # fused Pallas kernel (fwd + recompute-bwd)

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
        if self.use_pallas and x.ndim == 3:
            from amphion_tpu.ops.pallas_kernels import snake_pallas

            return snake_pallas(x, alpha)
        return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


class SnakeBeta(nn.Module):
    channels: int
    alpha_logscale: bool = True

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = self.param("beta", init, (self.channels,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        return x + (1.0 / (beta + 1e-9)) * jnp.sin(alpha * x) ** 2
