"""Dilated-conv WaveNet denoiser for diffusion over mel/latent frames.

Shared backbone behind three reference components: the DiffSVC bidilated-conv
denoiser (reference: `modules/diffusion/bidilconv/bidilated_conv.py:14`), the
NaturalSpeech2 WaveNet (`models/tts/naturalspeech2/wavenet.py`), and the
DiffWave vocoder residual stack (`models/vocoders/diffusion/diffwave/
diffwave.py:127`). Structure: input proj → N residual blocks of dilated conv
with gated tanh units + diffusion-step embedding + conditioner projection,
with skip accumulation → output proj.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.diffusion import timestep_embedding


@dataclass(frozen=True)
class WaveNetDenoiserConfig:
    in_dim: int = 80  # mel bins / latent dim
    hidden: int = 256
    num_layers: int = 20
    dilation_cycle: int = 4
    cond_dim: int = 384
    kernel_size: int = 3
    t_raw_dim: int = 128  # ref step_encoder.dim_raw_embedding
    t_mlp_hidden: int = 512  # ref step_encoder.dim_hidden_layer
    t_mlp_layers: int = 2  # ref step_encoder.num_layer


class WaveNetDenoiser(nn.Module):
    cfg: WaveNetDenoiserConfig

    @nn.compact
    def __call__(self, x, t, cond=None):
        """x: (B, T, in_dim) noisy features; t: (B,) diffusion step (int or
        continuous); cond: (B, T, cond_dim). Returns (B, T, in_dim)."""
        c = self.cfg
        h = nn.Conv(c.hidden, (1,), name="in_proj")(x)
        h = jax.nn.relu(h)

        # ref PositionEncoder (modules/encoder/position_encoder.py:9):
        # Linear(raw, mlp) SiLU [Linear(mlp, mlp) SiLU]x(n-1) Linear(mlp, h)
        temb = timestep_embedding(t, c.t_raw_dim)
        temb = nn.swish(nn.Dense(c.t_mlp_hidden, name="t_mlp_0")(temb))
        for k in range(1, c.t_mlp_layers):
            temb = nn.swish(nn.Dense(c.t_mlp_hidden, name=f"t_mlp_{k}")(temb))
        temb = nn.Dense(c.hidden, name="t_mlp_out")(temb)

        skip_total = jnp.zeros_like(h)
        for i in range(c.num_layers):
            dilation = 2 ** (i % c.dilation_cycle)
            y = h + temb[:, None, :]
            y = nn.Conv(
                2 * c.hidden, (c.kernel_size,), kernel_dilation=(dilation,),
                padding="SAME", name=f"dil_{i}",
            )(y)
            if cond is not None:
                y = y + nn.Conv(2 * c.hidden, (1,), name=f"cond_{i}")(cond)
            a, b = jnp.split(y, 2, axis=-1)
            y = jnp.tanh(a) * jax.nn.sigmoid(b)
            y = nn.Conv(2 * c.hidden, (1,), name=f"out_{i}")(y)
            res, skip = jnp.split(y, 2, axis=-1)
            h = (h + res) / jnp.sqrt(2.0)
            skip_total = skip_total + skip
        out = skip_total / jnp.sqrt(float(c.num_layers))
        out = jax.nn.relu(nn.Conv(c.hidden, (1,), name="post1")(out))
        return nn.Conv(c.in_dim, (1,), name="post2",
                       kernel_init=nn.initializers.zeros)(out)
