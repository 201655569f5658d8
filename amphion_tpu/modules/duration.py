"""Duration modeling: deterministic + stochastic predictors, length regulator.

Reference surface: `modules/duration_predictor/standard_duration_predictor.py:13`,
`stochastic_duration_predictor.py:14` (VITS flow-based), and FastSpeech2's
`LengthRegulator` (`models/tts/fastspeech2/fs2.py` / `modules/naturalpseech2
/transformers.py:480`). The TPU-native length regulator replaces the
reference's per-utterance python expansion loop with a static-shape
searchsorted gather, so it runs under jit with padded batches.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.flows import (
    ConvFlow,
    DDSConv,
    ElementwiseAffine,
    log_flow,
)


class DurationPredictor(nn.Module):
    """Conv-LN-dropout stack → scalar log-duration per frame (ref
    `standard_duration_predictor.py:13-50`)."""

    hidden_channels: int
    kernel_size: int = 3
    p_dropout: float = 0.5
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, deterministic=True):
        x = jax.lax.stop_gradient(x)
        if g is not None:
            x = x + nn.Dense(x.shape[-1], name="cond")(jax.lax.stop_gradient(g))
        # mask before each conv (ref standard_duration_predictor.py:36-48:
        # conv(x * x_mask)) so padding can't leak through the kernel
        m = 1.0 if x_mask is None else x_mask[..., None]
        x = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME")(x * m)
        x = jax.nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME")(x * m)
        x = jax.nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = nn.Dense(1)(x * m)
        return (x * m)[..., 0]  # (B, T) log-durations


class StochasticDurationPredictor(nn.Module):
    """VITS flow-based duration model (ref
    `stochastic_duration_predictor.py:14-120`).

    Training: returns the negative log-likelihood of the observed durations.
    Inference (reverse=True): samples log-durations from noise.
    """

    hidden_channels: int = 192
    kernel_size: int = 3
    p_dropout: float = 0.5
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask=None, w=None, g=None, reverse=False,
                 noise_scale=1.0, rng=None, deterministic=True):
        x = jax.lax.stop_gradient(x)
        x = nn.Conv(self.hidden_channels, (1,), name="pre")(x)
        if g is not None:
            x = x + nn.Conv(self.hidden_channels, (1,), name="cond")(
                jax.lax.stop_gradient(g)
            )
        x = DDSConv(self.hidden_channels, self.kernel_size, 3, self.p_dropout,
                    name="convs")(x, x_mask, deterministic=deterministic)
        x = nn.Conv(self.hidden_channels, (1,), name="proj")(x)
        if x_mask is not None:
            x = x * x_mask[..., None]

        flows = [ElementwiseAffine(2, name="flow_pre")] + [
            ConvFlow(2, self.hidden_channels, self.kernel_size, 3, name=f"flow_{i}")
            for i in range(self.n_flows)
        ]
        mask3 = 1.0 if x_mask is None else x_mask[..., None]

        if not reverse:
            assert w is not None and rng is not None
            b, t = w.shape[:2]
            w = w[..., None] if w.ndim == 2 else w  # (B, T, 1)
            # posterior encoder for u,v (variational dequantization)
            h_w = nn.Conv(self.hidden_channels, (1,), name="post_pre")(w)
            h_w = DDSConv(self.hidden_channels, self.kernel_size, 3,
                          self.p_dropout, name="post_convs")(
                h_w, x_mask, deterministic=deterministic)
            h_w = nn.Conv(self.hidden_channels, (1,), name="post_proj")(h_w)
            post_flows = [ElementwiseAffine(2, name="post_flow_pre")] + [
                ConvFlow(2, self.hidden_channels, self.kernel_size, 3,
                         name=f"post_flow_{i}")
                for i in range(4)
            ]
            e_q = jax.random.normal(rng, (b, t, 2)) * mask3
            z_q = e_q
            logdet_tot_q = 0.0
            # reference flow order (stochastic_duration_predictor.py:34-38,
            # 83-85): ElementwiseAffine, then (ConvFlow, Flip) pairs — NO
            # flip between the affine and the first ConvFlow
            z_q, ld = post_flows[0](z_q, x_mask)
            logdet_tot_q = logdet_tot_q + ld
            for f in post_flows[1:]:
                z_q, ld = f(z_q, x_mask, g=(x + h_w))
                logdet_tot_q = logdet_tot_q + ld
                z_q = jnp.flip(z_q, axis=-1)
            z_u, z1 = jnp.split(z_q, 2, axis=-1)
            u = jax.nn.sigmoid(z_u) * mask3
            z0 = (w - u) * mask3
            logdet_tot_q = logdet_tot_q + jnp.sum(
                (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * mask3,
                axis=(1, 2),
            )
            logq = (
                jnp.sum(-0.5 * (jnp.log(2 * jnp.pi) + e_q**2) * mask3, axis=(1, 2))
                - logdet_tot_q
            )

            logdet_tot = 0.0
            z0, ld = log_flow(z0, x_mask)
            logdet_tot += ld
            z = jnp.concatenate([z0, z1], axis=-1)
            z, ld = flows[0](z, x_mask)
            logdet_tot = logdet_tot + ld
            for f in flows[1:]:
                z, ld = f(z, x_mask, g=x)
                logdet_tot = logdet_tot + ld
                z = jnp.flip(z, axis=-1)
            nll = (
                jnp.sum(0.5 * (jnp.log(2 * jnp.pi) + z**2) * mask3, axis=(1, 2))
                - logdet_tot
            )
            return nll + logq  # (B,)

        assert rng is not None
        b, t = x.shape[:2]
        z = jax.random.normal(rng, (b, t, 2)) * noise_scale * mask3
        # reference reverse path (stochastic_duration_predictor.py:110-111)
        # drops the FIRST ConvFlow: Flip, CF_{n-1}, …, Flip, CF_1, Flip, EA
        for f in reversed(flows[2:]):
            z = jnp.flip(z, axis=-1)
            z = f(z, x_mask, g=x, reverse=True)
        z = jnp.flip(z, axis=-1)
        z = flows[0](z, x_mask, reverse=True)
        z0, _ = jnp.split(z, 2, axis=-1)
        return z0[..., 0]  # (B, T) log-durations


def length_regulate(
    x: jax.Array, durations: jax.Array, max_len: int
) -> tuple[jax.Array, jax.Array]:
    """Expand phone-level features by integer durations, static shapes.

    The reference expands with a python loop per utterance (dynamic output
    length); here output position t gathers the phone whose cumulative
    duration interval contains t — a vectorized searchsorted, jit-safe.

    Args:
        x: (B, L, D) phone features.
        durations: (B, L) non-negative ints.
        max_len: static output length (frames beyond total duration are
            masked out).
    Returns:
        (expanded (B, max_len, D), mask (B, max_len)).
    """
    cum = jnp.cumsum(durations, axis=1)  # (B, L): end frame of each phone
    t = jnp.arange(max_len)[None, :]
    # phone index for each output frame = #phones whose end <= t
    idx = jnp.sum(cum[:, None, :] <= t[:, :, None], axis=-1)
    idx = jnp.clip(idx, 0, x.shape[1] - 1)
    expanded = jnp.take_along_axis(x, idx[..., None], axis=1)
    mask = t < cum[:, -1:]
    return expanded * mask[..., None], mask
