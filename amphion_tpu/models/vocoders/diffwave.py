"""DiffWave: diffusion vocoder, checkpoint-compatible with the reference
(`models/vocoders/diffusion/diffwave/diffwave.py:127`): lerp-able
geometric-frequency step-embedding table + two SiLU projections, a 2-D
transposed-conv spectrogram upsampler (leaky 0.4), gated dilated residual
blocks with per-block conditioner/diffusion projections
(sigmoid(gate)·tanh(filter), gate first), 1/sqrt(L) skip sum, zero-init
output projection.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.modules.diffusion import DiffusionSchedule, ddpm_sample


@dataclass(frozen=True)
class DiffWaveConfig:
    n_mel: int = 80
    hop_size: int = 256
    upsample_factors: tuple[int, ...] = (16, 16)  # product == hop_size
    residual_channels: int = 64
    num_layers: int = 30
    dilation_cycle: int = 10
    num_train_steps: int = 50
    noise_start: float = 1e-4
    noise_end: float = 0.05

    def __post_init__(self):
        f = 1
        for x in self.upsample_factors:
            f *= x
        if f != self.hop_size:  # derive a balanced 2-factor split of hop
            best = (1, self.hop_size)
            for a in range(2, int(self.hop_size**0.5) + 1):
                if self.hop_size % a == 0:
                    best = (a, self.hop_size // a)
            object.__setattr__(self, "upsample_factors", best)


class DiffusionEmbedding(nn.Module):
    """ref diffwave.py:33 — table[t] (sin|cos of t·10^(d·4/63)) → two
    SiLU-activated 512-d projections."""

    max_steps: int

    @nn.compact
    def __call__(self, t):
        steps = np.arange(self.max_steps)[:, None]
        dims = np.arange(64)[None, :]
        table = steps * 10.0 ** (dims * 4.0 / 63.0)
        table = np.concatenate([np.sin(table), np.cos(table)], axis=1)
        x = jnp.take(jnp.asarray(table, jnp.float32), t, axis=0)
        x = nn.silu(nn.Dense(512, name="projection1")(x))
        return nn.silu(nn.Dense(512, name="projection2")(x))


class SpectrogramUpsampler(nn.Module):
    """ref diffwave.py:68 — two ConvTranspose2d(1→1) over (n_mel, N),
    leaky 0.4."""

    upsample_factors: tuple[int, ...]

    @nn.compact
    def __call__(self, mel):
        """mel (B, n_mel, N) → (B, n_mel, N*prod(factors))."""
        h = mel[..., None]  # (B, n_mel, N, 1) NHWC
        for i, f in enumerate(self.upsample_factors):
            k = 2 * f
            p = f // 2
            h = nn.ConvTranspose(
                1, (3, k), strides=(1, f),
                padding=((1, 1), (k - 1 - p, k - 1 - (k - f - p))),
                name=f"conv{i + 1}")(h)
            h = nn.leaky_relu(h, 0.4)
        return h[..., 0]


class DiffWaveResBlock(nn.Module):
    """ref diffwave.py:96."""

    n_mel: int
    channels: int
    dilation: int

    @nn.compact
    def __call__(self, x, diff_emb, conditioner):
        """x (B, T, C); diff_emb (B, 512); conditioner (B, n_mel, T)."""
        ch = self.channels
        y = x + nn.Dense(ch, name="diffusion_projection")(diff_emb)[:, None, :]
        cond = nn.Conv(2 * ch, (1,), name="conditioner_projection")(
            jnp.transpose(conditioner, (0, 2, 1)))
        y = nn.Conv(2 * ch, (3,), kernel_dilation=(self.dilation,),
                    padding="SAME", name="dilated_conv")(y) + cond
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Conv(2 * ch, (1,), name="output_projection")(y)
        res, skip = jnp.split(y, 2, axis=-1)
        return (x + res) / np.sqrt(2.0), skip


class DiffWave(nn.Module):
    cfg: DiffWaveConfig

    @property
    def schedule(self) -> DiffusionSchedule:
        return DiffusionSchedule.create(
            self.cfg.num_train_steps, "linear", start=self.cfg.noise_start,
            end=self.cfg.noise_end,
        )

    @nn.compact
    def __call__(self, audio, t, mel):
        """audio (B, T); t (B,) int steps; mel (B, N, n_mel) → eps (B, T)."""
        c = self.cfg
        x = jax.nn.relu(
            nn.Conv(c.residual_channels, (1,), name="input_projection")(
                audio[..., None]))
        diff_emb = DiffusionEmbedding(c.num_train_steps,
                                      name="diffusion_embedding")(t)
        spec = SpectrogramUpsampler(c.upsample_factors,
                                    name="spectrogram_upsampler")(
            jnp.transpose(mel, (0, 2, 1)))  # (B, n_mel, N*hop)
        spec = spec[:, :, : x.shape[1]]
        skip_total = 0.0
        for i in range(c.num_layers):
            x, skip = DiffWaveResBlock(
                c.n_mel, c.residual_channels,
                2 ** (i % c.dilation_cycle),
                name=f"residual_layers_{i}")(x, diff_emb, spec)
            skip_total = skip_total + skip
        out = skip_total / np.sqrt(float(c.num_layers))
        out = jax.nn.relu(
            nn.Conv(c.residual_channels, (1,), name="skip_projection")(out))
        return nn.Conv(1, (1,), name="output_projection",
                       kernel_init=nn.initializers.zeros)(out)[..., 0]

    def loss(self, audio, mel, rng):
        sched = self.schedule
        r_t, r_n = jax.random.split(rng)
        b = audio.shape[0]
        t = jax.random.randint(r_t, (b,), 0, sched.num_steps)
        noise = jax.random.normal(r_n, audio.shape)
        x_t = sched.q_sample(audio, t, noise)
        eps = self(x_t, t, mel)
        return jnp.mean((eps - noise) ** 2)


@functools.lru_cache(maxsize=16)
def _diffwave_sample_jitted(model, b, n, num_steps, compute_dtype):
    sched = model.schedule
    shape = (b, n * model.cfg.hop_size)
    dt = jnp.dtype(compute_dtype)

    def core(params, mel, rng):
        params_dt = jax.tree_util.tree_map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
        mel_dt = mel.astype(dt)

        def eps_fn(x, t):
            return model.apply(
                {"params": params_dt}, x.astype(dt), jnp.full((b,), t),
                mel_dt).astype(jnp.float32)

        return ddpm_sample(eps_fn, sched, shape, rng, num_steps)

    return jax.jit(core)


def diffwave_sample(model: DiffWave, params, mel, rng, num_steps=None,
                    compute_dtype: str = "bfloat16"):
    """Memoized self-jitting DDPM sampling (one cached program per shape
    bucket; eager scans dispatch op-by-op through the TPU tunnel). The
    denoiser runs in ``compute_dtype``; DDPM coefficient math stays f32."""
    b, n, _ = mel.shape
    return _diffwave_sample_jitted(model, b, n, num_steps, compute_dtype)(
        params, mel, rng)
