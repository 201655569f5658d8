"""Anti-aliased resampling + activation (BigVGAN AMP blocks).

Reference: `modules/anti_aliasing/{filter,resample,act}.py` — Kaiser-windowed
sinc low-pass filters around nonlinearities: upsample 2x → activation →
downsample 2x, suppressing the aliasing the periodic Snake activation would
otherwise fold into the baseband. Filters are numpy compile-time constants;
the depthwise filtering folds channels into the batch dim (one single-channel
conv — XLA maps it to an efficient strided conv without group support).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc low-pass FIR (cutoff/half_width in cycles/sample)."""
    even = kernel_size % 2 == 0
    half = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half - 1) * np.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        t = np.arange(-half, half) + 0.5
    else:
        t = np.arange(kernel_size) - half
    f = 2 * cutoff * window * np.sinc(2 * cutoff * t)
    s = f.sum()
    if abs(s) > 1e-8:
        f = f / s
    return f.astype(np.float32)


def _to_single_channel(x):
    """(B, T, C) → (B*C, T, 1)."""
    b, t, c = x.shape
    return x.transpose(0, 2, 1).reshape(b * c, t, 1), (b, c)


def _from_single_channel(y, bc):
    b, c = bc
    t = y.shape[1]
    return y.reshape(b, c, t).transpose(0, 2, 1)


def upsample1d(x: jax.Array, ratio: int = 2, kernel_size: int | None = None) -> jax.Array:
    """Sinc-interpolated upsampling, (B, T, C) → (B, T*ratio, C)."""
    r = ratio
    k = kernel_size or int(6 * r // 2) * 2
    f = kaiser_sinc_filter1d(0.5 / r, 0.6 / r, k) * r
    pad = k // r - 1
    pad_left = pad * r + (k - r) // 2
    pad_right = pad * r + (k - r + 1) // 2
    t_in = x.shape[1]
    xs, bc = _to_single_channel(x)
    xs = jnp.pad(xs, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    kernel = jnp.asarray(f, dtype=x.dtype)[:, None, None]  # (k, 1, 1) HIO
    y = jax.lax.conv_transpose(
        xs, kernel, strides=(r,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    y = y[:, pad_left : pad_left + t_in * r]
    return _from_single_channel(y, bc)


def downsample1d(x: jax.Array, ratio: int = 2, kernel_size: int | None = None) -> jax.Array:
    """Anti-aliased decimation, (B, T, C) → (B, T//ratio, C)."""
    r = ratio
    k = kernel_size or int(6 * r // 2) * 2
    f = kaiser_sinc_filter1d(0.5 / r, 0.6 / r, k)
    pad_left = (k - r) // 2
    pad_right = k - r - pad_left
    xs, bc = _to_single_channel(x)
    xs = jnp.pad(xs, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    kernel = jnp.asarray(f, dtype=x.dtype)[:, None, None]
    y = jax.lax.conv_general_dilated(
        xs, kernel, window_strides=(r,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return _from_single_channel(y, bc)


class Activation1d(nn.Module):
    """up 2x → activation → down 2x (ref `act.py:14`).

    ``use_pallas`` routes Snake activations through the fused polyphase
    Pallas kernel (`amphion_tpu/ops/pallas_kernels.aa_snake_pallas`):
    one VMEM pass instead of three HBM passes, measured 1.33x on v5e and
    numerically tighter (full-f32 FIRs vs XLA's default-precision convs).
    """

    activation: nn.Module
    up_ratio: int = 2
    down_ratio: int = 2
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        from amphion_tpu.modules.activations import Snake, SnakeBeta

        if (self.use_pallas and self.up_ratio == 2 and self.down_ratio == 2
                and isinstance(self.activation, (Snake, SnakeBeta))):
            # the activation applies the fused up→snake→down Pallas kernel
            # itself — same submodule, identical param tree, so checkpoints
            # are interchangeable between the fused and eager paths
            return self.activation(x, fused_aa=True)
        x = upsample1d(x, self.up_ratio)
        x = self.activation(x)
        x = downsample1d(x, self.down_ratio)
        return x
