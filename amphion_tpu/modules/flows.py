"""Normalizing-flow building blocks (VITS family).

Covers the reference's flow surface (reference: `modules/flow/modules.py` —
`WN:74` gated WaveNet conditioner, `ResidualCouplingLayer:343`,
`ConvFlow:400` spline coupling, `DDSConv`, `Log`/`ElementwiseAffine`/`Flip`
flows; spline math in `modules/transformer/transforms.py`). Written fresh for
TPU with NLC layouts and fully vectorized piecewise-rational-quadratic
transforms (no data-dependent control flow — bin lookup is a one-hot matmul).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


class WN(nn.Module):
    """Non-causal WaveNet: dilated convs with gated tanh units, skip
    connections, and optional global conditioning (ref `modules.py:74-160`)."""

    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    num_layers: int = 4
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, deterministic=True):
        """x: (B, T, H); g: (B, T, G) or (B, 1, G) global conditioning."""
        output = jnp.zeros_like(x)
        n_ch = self.hidden_channels
        if g is not None:
            g_all = nn.WeightNorm(nn.Dense(2 * n_ch * self.num_layers, name="cond"))(g)
        for i in range(self.num_layers):
            dilation = self.dilation_rate**i
            x_in = nn.WeightNorm(
                nn.Conv(2 * n_ch, (self.kernel_size,), kernel_dilation=(dilation,),
                        padding="SAME", name=f"in_{i}")
            )(x)
            if g is not None:
                x_in = x_in + g_all[..., i * 2 * n_ch : (i + 1) * 2 * n_ch]
            a, b = jnp.split(x_in, 2, axis=-1)
            acts = jnp.tanh(a) * jax.nn.sigmoid(b)
            # reference WN (modules.py:68-69) drops the gated acts, not x_in
            acts = nn.Dropout(self.p_dropout)(acts, deterministic=deterministic)
            out_ch = 2 * n_ch if i < self.num_layers - 1 else n_ch
            res_skip = nn.WeightNorm(nn.Conv(out_ch, (1,), name=f"res_skip_{i}"))(acts)
            if i < self.num_layers - 1:
                res, skip = jnp.split(res_skip, 2, axis=-1)
                x = x + res
                if x_mask is not None:
                    x = x * x_mask[..., None]
                output = output + skip
            else:
                output = output + res_skip
        if x_mask is not None:
            output = output * x_mask[..., None]
        return output


class ResidualCouplingLayer(nn.Module):
    """Affine (mean-only by default, as VITS uses) coupling with a WN
    conditioner (ref `modules.py:343-398`)."""

    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    num_layers: int = 4
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x0)
        if x_mask is not None:
            # ref modules.py:380 masks after `pre` so the WN dilated convs
            # never read padding-position activations
            h = h * x_mask[..., None]
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.num_layers, self.gin_channels, name="enc")(h, x_mask, g=g)
        stats = nn.Conv(
            half if self.mean_only else self.channels, (1,), name="post",
            kernel_init=nn.initializers.zeros,
        )(h)
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = jnp.split(stats, 2, axis=-1)
        mask = 1.0 if x_mask is None else x_mask[..., None]
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * mask
            logdet = jnp.sum(logs * mask, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    """Stack of coupling layers with flips (VITS flow, ref
    `models/tts/vits/vits.py:70-113`)."""

    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    num_layers: int = 4
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse: bool = False):
        layers = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.num_layers, self.gin_channels,
                name=f"flow_{i}",
            )
            for i in range(self.n_flows)
        ]
        if not reverse:
            total_logdet = 0.0
            for layer in layers:
                x, ld = layer(x, x_mask, g=g, reverse=False)
                total_logdet = total_logdet + ld
                x = jnp.flip(x, axis=-1)
            return x, total_logdet
        for layer in reversed(layers):
            x = jnp.flip(x, axis=-1)
            x = layer(x, x_mask, g=g, reverse=True)
        return x


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack (ref `modules.py:190-240`)."""

    channels: int
    kernel_size: int = 3
    num_layers: int = 3
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, deterministic=True):
        if g is not None:
            x = x + g
        m = 1.0 if x_mask is None else x_mask[..., None]
        for i in range(self.num_layers):
            dilation = self.kernel_size**i
            # mask before the dilated sep conv (ref modules.py:60) and use
            # torch's exact-erf gelu
            y = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(dilation,), padding="SAME",
                        feature_group_count=self.channels, name=f"sep_{i}")(x * m)
            y = nn.LayerNorm(epsilon=1e-5)(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Conv(self.channels, (1,), name=f"pw_{i}")(y)
            y = nn.LayerNorm(epsilon=1e-5)(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = x + y
        return x * m


# ---------------------------------------------------------------------------
# Piecewise rational-quadratic spline (Durkan et al., as used by VITS's
# ConvFlow / stochastic duration predictor; ref `transforms.py`).
# ---------------------------------------------------------------------------


def rational_quadratic_spline(
    x: jax.Array,
    widths: jax.Array,
    heights: jax.Array,
    derivs: jax.Array,
    inverse: bool = False,
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
):
    """Element-wise monotonic RQ spline with linear tails.

    x: (...,); widths/heights: (..., K) unnormalized; derivs: (..., K-1)
    unnormalized internal derivatives. Returns (y, logabsdet).
    """
    num_bins = widths.shape[-1]
    inside = (x >= -tail_bound) & (x <= tail_bound)

    w = jax.nn.softmax(widths, axis=-1)
    w = min_bin_width + (1 - min_bin_width * num_bins) * w
    cumw = jnp.cumsum(w, axis=-1)
    cumw = jnp.concatenate([jnp.zeros_like(cumw[..., :1]), cumw], axis=-1)
    cumw = cumw * 2 * tail_bound - tail_bound
    cumw = cumw.at[..., -1].set(tail_bound)
    w = cumw[..., 1:] - cumw[..., :-1]

    h = jax.nn.softmax(heights, axis=-1)
    h = min_bin_height + (1 - min_bin_height * num_bins) * h
    cumh = jnp.cumsum(h, axis=-1)
    cumh = jnp.concatenate([jnp.zeros_like(cumh[..., :1]), cumh], axis=-1)
    cumh = cumh * 2 * tail_bound - tail_bound
    cumh = cumh.at[..., -1].set(tail_bound)
    h = cumh[..., 1:] - cumh[..., :-1]

    d = min_derivative + jax.nn.softplus(derivs)
    # boundary derivatives = 1 (linear tails)
    ones = jnp.ones_like(d[..., :1])
    d = jnp.concatenate([ones, d, ones], axis=-1)  # (..., K+1)

    xc = jnp.clip(x, -tail_bound, tail_bound)
    # locate bin (one-hot; searchsorted-free)
    ref = cumh if inverse else cumw
    idx = jnp.sum((xc[..., None] >= ref[..., :-1]).astype(jnp.int32), axis=-1) - 1
    idx = jnp.clip(idx, 0, num_bins - 1)

    def take(a):
        return jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]

    in_w = take(w)
    in_cumw = take(cumw[..., :-1])
    in_h = take(h)
    in_cumh = take(cumh[..., :-1])
    delta = in_h / in_w
    d_k = take(d[..., :-1])
    d_k1 = take(d[..., 1:])

    if not inverse:
        theta = (xc - in_cumw) / in_w
        theta = jnp.clip(theta, 0.0, 1.0)
        num = in_h * (delta * theta**2 + d_k * theta * (1 - theta))
        den = delta + (d_k1 + d_k - 2 * delta) * theta * (1 - theta)
        y = in_cumh + num / den
        deriv_num = delta**2 * (
            d_k1 * theta**2 + 2 * delta * theta * (1 - theta) + d_k * (1 - theta) ** 2
        )
        logabsdet = jnp.log(deriv_num + 1e-12) - 2 * jnp.log(den + 1e-12)
    else:
        yq = xc
        a = (yq - in_cumh) * (d_k1 + d_k - 2 * delta) + in_h * (delta - d_k)
        b_ = in_h * d_k - (yq - in_cumh) * (d_k1 + d_k - 2 * delta)
        c_ = -delta * (yq - in_cumh)
        disc = b_**2 - 4 * a * c_
        disc = jnp.maximum(disc, 0.0)
        root = 2 * c_ / (-b_ - jnp.sqrt(disc) - 1e-12)
        root = jnp.clip(root, 0.0, 1.0)
        y = root * in_w + in_cumw
        den = delta + (d_k1 + d_k - 2 * delta) * root * (1 - root)
        deriv_num = delta**2 * (
            d_k1 * root**2 + 2 * delta * root * (1 - root) + d_k * (1 - root) ** 2
        )
        logabsdet = -(jnp.log(deriv_num + 1e-12) - 2 * jnp.log(den + 1e-12))

    y = jnp.where(inside, y, x)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return y, logabsdet


class ConvFlow(nn.Module):
    """Spline coupling with DDSConv conditioner (ref `modules.py:400-460`)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int = 3
    num_layers: int = 3
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse: bool = False):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x0)
        h = DDSConv(self.hidden_channels, self.kernel_size, self.num_layers,
                    name="convs")(h, x_mask, g=g)
        h = nn.Conv(half * (3 * self.num_bins - 1), (1,), name="proj",
                    kernel_init=nn.initializers.zeros)(h)
        b, t, _ = h.shape
        h = h.reshape(b, t, half, 3 * self.num_bins - 1)
        scale = 1.0 / jnp.sqrt(self.hidden_channels)
        widths = h[..., : self.num_bins] * scale
        heights = h[..., self.num_bins : 2 * self.num_bins] * scale
        derivs = h[..., 2 * self.num_bins :]
        y1, logabsdet = rational_quadratic_spline(
            x1, widths, heights, derivs, inverse=reverse, tail_bound=self.tail_bound
        )
        out = jnp.concatenate([x0, y1], axis=-1)
        mask = 1.0 if x_mask is None else x_mask[..., None]
        out = out * mask
        logdet = jnp.sum(logabsdet * (mask if x_mask is None else x_mask[..., None]),
                         axis=(1, 2))
        if reverse:
            return out
        return out, logdet


class ElementwiseAffine(nn.Module):
    """Learned per-channel affine flow (ref `modules.py:330-341`)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask=None, reverse: bool = False):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        mask = 1.0 if x_mask is None else x_mask[..., None]
        if not reverse:
            y = (m + jnp.exp(logs) * x) * mask
            logdet = jnp.sum(logs * jnp.ones_like(x) * mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * mask


def log_flow(x, x_mask=None, reverse: bool = False, eps: float = 1e-5):
    """Log transform flow (ref `modules.py:317-328`)."""
    mask = 1.0 if x_mask is None else x_mask[..., None]
    if not reverse:
        y = jnp.log(jnp.maximum(x, eps)) * mask
        logdet = jnp.sum(-y, axis=(1, 2))
        return y, logdet
    return jnp.exp(x) * mask
