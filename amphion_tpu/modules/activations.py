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
    def __call__(self, x, fused_aa: bool = False):
        # fused_aa: apply the fused 2x-up → snake → 2x-down Pallas kernel
        # (BigVGAN AMP) instead of the plain activation
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
        if fused_aa and x.ndim == 3:
            from amphion_tpu.ops.pallas_kernels import aa_snake_pallas

            return aa_snake_pallas(x, alpha)
        if self.use_pallas and x.ndim == 3:
            from amphion_tpu.ops.pallas_kernels import snake_pallas

            return snake_pallas(x, alpha)
        return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


class SnakeBeta(nn.Module):
    channels: int
    alpha_logscale: bool = True

    @nn.compact
    def __call__(self, x, fused_aa: bool = False):
        # fused_aa: fused 2x-up → snakebeta → 2x-down Pallas kernel
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = self.param("beta", init, (self.channels,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        if fused_aa and x.ndim == 3:
            from amphion_tpu.ops.pallas_kernels import aa_snakebeta_pallas

            return aa_snakebeta_pallas(x, alpha, beta)
        return x + (1.0 / (beta + 1e-9)) * jnp.sin(alpha * x) ** 2
