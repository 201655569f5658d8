"""Discretized mixture-of-logistics output distribution (WaveNet head).

Reference: `utils/distribution.py:22` (`discretized_mix_logistic_loss`)
and `:117` (`sample_from_discretized_mix_logistic`) — the PixelCNN++-style
8-bit discretized MoL used by the reference WaveNet when its output head
is `num_mixtures x 3 (pi, mu, log_scale)` (`wavenet.py:42-44`).

Layout here is (B, T, 3K) channel-last (the reference is (B, C, T));
semantics match element-for-element.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discretized_mix_logistic_loss(y_hat: jax.Array, y: jax.Array,
                                  num_classes: int = 256,
                                  log_scale_min: float = -7.0,
                                  reduce: str = "mean") -> jax.Array:
    """Negative log-likelihood of targets `y` (B, T) in [-1, 1] under the
    predicted mixture `y_hat` (B, T, 3K). `reduce`: "mean" | "sum" | "none"
    (reference reduce=True is "sum")."""
    k = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :k]
    means = y_hat[..., k:2 * k]
    log_scales = jnp.maximum(y_hat[..., 2 * k:3 * k], log_scale_min)
    yv = y[..., None]
    centered = yv - means
    inv_stdv = jnp.exp(-log_scales)
    half_bin = 1.0 / (num_classes - 1)
    plus_in = inv_stdv * (centered + half_bin)
    min_in = inv_stdv * (centered - half_bin)
    cdf_delta = jax.nn.sigmoid(plus_in) - jax.nn.sigmoid(min_in)
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)  # log sigmoid(plus)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)
    inner_inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - jnp.log((num_classes - 1) / 2.0))
    inner = jnp.where(yv > 0.999, log_one_minus_cdf_min, inner_inner)
    log_probs = jnp.where(yv < -0.999, log_cdf_plus, inner)
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    nll = -jax.nn.logsumexp(log_probs, axis=-1)  # (B, T)
    if reduce == "mean":
        return jnp.mean(nll)
    if reduce == "sum":
        return jnp.sum(nll)
    return nll


def sample_from_discretized_mix_logistic(rng: jax.Array, y_hat: jax.Array,
                                         log_scale_min: float = -7.0,
                                         clamp_log_scale: bool = False
                                         ) -> jax.Array:
    """Draw samples (B, T) in [-1, 1] from the mixture `y_hat` (B, T, 3K)
    (ref `sample_from_discretized_mix_logistic:117` — Gumbel-max mixture
    pick, then a logistic draw, no 8-bit rounding)."""
    k = y_hat.shape[-1] // 3
    r_pi, r_u = jax.random.split(rng)
    logit_probs = y_hat[..., :k]
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(r_pi, logit_probs.shape, minval=1e-5,
                           maxval=1.0 - 1e-5)))
    sel = jnp.argmax(logit_probs + gumbel, axis=-1)[..., None]  # (B, T, 1)
    means = jnp.take_along_axis(y_hat[..., k:2 * k], sel, axis=-1)[..., 0]
    log_scales = jnp.take_along_axis(y_hat[..., 2 * k:3 * k], sel,
                                     axis=-1)[..., 0]
    if clamp_log_scale:
        log_scales = jnp.maximum(log_scales, log_scale_min)
    u = jax.random.uniform(r_u, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1.0 - u))
    return jnp.clip(x, -1.0, 1.0)
