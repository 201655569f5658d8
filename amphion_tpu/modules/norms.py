"""Conditioning norms: StyleAdaptiveLayerNorm and friends.

Reference: `modules/naturalpseech2/transformers.py:14-86` (NS2's
StyleAdaptiveLayerNorm), `modules/norms/` LayerNorm variants.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class StyleAdaptiveLayerNorm(nn.Module):
    """LayerNorm whose scale/shift come from a style vector."""

    @nn.compact
    def __call__(self, x, style):
        """x: (B, T, D); style: (B, S) or (B, T, S)."""
        normed = nn.LayerNorm(use_bias=False, use_scale=False)(x)
        mod = nn.Dense(2 * x.shape[-1], name="style_proj")(style)
        if mod.ndim == 2:
            mod = mod[:, None, :]
        gamma, beta = jnp.split(mod, 2, axis=-1)
        return (1.0 + gamma) * normed + beta


class ConvLayerNorm(nn.Module):
    """LayerNorm over channels for conv stacks (NLC layout: plain LN)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm()(x)
