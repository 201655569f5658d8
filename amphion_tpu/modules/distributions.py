"""Latent distributions (reference: `modules/distributions/distributions.py:29`
— DiagonalGaussianDistribution with KL `:80`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class DiagonalGaussian:
    """Diagonal Gaussian over VAE latents: sample / kl / nll / mode."""

    def __init__(self, mean: jax.Array, logvar: jax.Array,
                 deterministic: bool = False):
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        self.deterministic = deterministic

    def sample(self, rng: jax.Array) -> jax.Array:
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape)

    def kl(self, other: "DiagonalGaussian | None" = None) -> jax.Array:
        if self.deterministic:
            return jnp.zeros(())
        if other is None:
            return 0.5 * jnp.sum(
                self.mean**2 + self.var - 1.0 - self.logvar,
                axis=tuple(range(1, self.mean.ndim)),
            )
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        if self.deterministic:
            return jnp.zeros(())
        log2pi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            log2pi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=tuple(range(1, sample.ndim)),
        )

    def mode(self) -> jax.Array:
        return self.mean
