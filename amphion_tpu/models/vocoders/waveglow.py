"""WaveGlow: flow-based vocoder (reference: `models/vocoders/flow/waveglow/
waveglow.py:146`).

Squeeze the waveform into ``n_group`` channels, alternate invertible 1x1
convolutions with WN-conditioned affine couplings, and emit
``n_early_size`` channels to the output every ``n_early_every`` flows
(multi-scale z). Training maximizes exact likelihood; inference runs the
flows in reverse from Gaussian noise (the reference ships the training
forward only — `waveglow.py:187-231` — the reverse here inverts it
exactly, re-injecting noise at each early output).

Layout notes (NLC):
* conditioning = learned ConvTranspose(n_mel, n_mel, 1024, stride 256)
  upsampler, trimmed to the audio length, then grouped **mel-major**
  (`waveglow.py:200-203`: unfold+permute puts the within-group time
  offset last, so channel ``mel_ch * n_group + offset``);
* audio groups put the within-group offset in channels
  (`waveglow.py:205`);
* coupling split: first half passes through the WN; the WN `end` conv
  output is ``[b | log_s]`` (`waveglow.py:222-225`).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class WaveGlowConfig:
    n_mel: int = 80  # cfg.VOCODER.INPUT_DIM
    hop_size: int = 256  # upsampler stride (kernel fixed 1024, ref :152-157)
    upsample_kernel: int = 1024
    n_group: int = 8
    n_flows: int = 12
    n_early_every: int = 4
    n_early_size: int = 2
    wn_layers: int = 8
    wn_channels: int = 256
    wn_kernel_size: int = 3


class Invertible1x1(nn.Module):
    """Invertible 1x1 conv over group channels (ref `waveglow.py:21-63`).
    Kernel layout matches a flax Dense (in, out) = torch ``W.T``."""

    channels: int

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        w = self.param("w", nn.initializers.orthogonal(),
                       (self.channels, self.channels))
        if reverse:
            return x @ jnp.linalg.inv(w)
        # ref :61 multiplies by batch*n_groups; we keep per-sample logdet
        logdet = x.shape[1] * jnp.linalg.slogdet(w)[1]
        return x @ w, logdet


class WaveGlowWN(nn.Module):
    """WaveNet-like coupling net (ref `waveglow.py:66-143`): non-causal
    dilated convs (dilation doubling, no reset), a single cond conv over
    the grouped mel producing per-layer slices, fused tanh·sigmoid gates,
    res+skip 1x1s (last layer skip-only), zero-init `end`."""

    n_half: int
    n_layers: int
    n_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, audio, spect):
        nc = self.n_channels
        x = nn.WeightNorm(nn.Conv(nc, (1,), name="start"))(audio)
        cond = nn.WeightNorm(
            nn.Conv(2 * nc * self.n_layers, (1,), name="cond"))(spect)
        out = jnp.zeros_like(x)
        for i in range(self.n_layers):
            d = 2 ** i
            pad = (self.kernel_size * d - d) // 2
            a = nn.WeightNorm(nn.Conv(
                2 * nc, (self.kernel_size,), kernel_dilation=(d,),
                padding=((pad, pad),), name=f"in_{i}"))(x)
            a = a + cond[..., i * 2 * nc:(i + 1) * 2 * nc]
            acts = jnp.tanh(a[..., :nc]) * jax.nn.sigmoid(a[..., nc:])
            last = i == self.n_layers - 1
            rs = nn.WeightNorm(nn.Conv(
                nc if last else 2 * nc, (1,), name=f"res_skip_{i}"))(acts)
            if last:
                out = out + rs
            else:
                x = x + rs[..., :nc]
                out = out + rs[..., nc:]
        return nn.Conv(2 * self.n_half, (1,),
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name="end")(out)


class WaveGlow(nn.Module):
    cfg: WaveGlowConfig

    def setup(self):
        c = self.cfg
        # torch ConvTranspose1d(padding=0) → out (N-1)*s + k; flax custom
        # padding (a, b) gives (N-1)*s + a + b - k + 2, so a = b = k - 1
        self.upsample = nn.ConvTranspose(
            c.n_mel, (c.upsample_kernel,), strides=(c.hop_size,),
            padding=((c.upsample_kernel - 1, c.upsample_kernel - 1),),
            name="upsample")
        convs, wns = [], []
        n_half = c.n_group // 2
        n_remaining = c.n_group
        for k in range(c.n_flows):
            if k % c.n_early_every == 0 and k > 0:
                n_half -= c.n_early_size // 2
                n_remaining -= c.n_early_size
            convs.append(Invertible1x1(n_remaining, name=f"inv_{k}"))
            wns.append(WaveGlowWN(
                n_half, c.wn_layers, c.wn_channels, c.wn_kernel_size,
                name=f"wn_{k}"))
        self.convs = convs
        self.wns = wns
        self.n_remaining_channels = n_remaining

    def _cond(self, mel, t: int):
        """mel (B, N, n_mel) → grouped cond (B, T/g, n_mel*g), mel-major
        channel order (ref `waveglow.py:195-203`)."""
        c = self.cfg
        spect = self.upsample(mel)[:, :t]  # (B, T, n_mel)
        b, _, m = spect.shape
        tg = t // c.n_group
        g = spect[:, : tg * c.n_group].reshape(b, tg, c.n_group, m)
        return g.transpose(0, 1, 3, 2).reshape(b, tg, m * c.n_group)

    def forward(self, audio, mel):
        """audio (B, T), mel (B, N, n_mel) → (z (B, T/g, g), per-sample
        logdet). T must not exceed the upsampled mel length."""
        c = self.cfg
        b, t = audio.shape
        tg = t // c.n_group
        x = audio[:, : tg * c.n_group].reshape(b, tg, c.n_group)
        cond = self._cond(mel, t)
        outputs = []
        logdet_total = 0.0
        for k in range(c.n_flows):
            if k % c.n_early_every == 0 and k > 0:
                outputs.append(x[..., : c.n_early_size])
                x = x[..., c.n_early_size:]
            x, ld = self.convs[k](x)
            logdet_total = logdet_total + ld
            n_half = x.shape[-1] // 2
            xa, xb = x[..., :n_half], x[..., n_half:]
            stats = self.wns[k](xa, cond)
            bias, log_s = stats[..., :n_half], stats[..., n_half:]
            xb = jnp.exp(log_s) * xb + bias
            logdet_total = logdet_total + jnp.sum(log_s, axis=(1, 2))
            x = jnp.concatenate([xa, xb], axis=-1)
        outputs.append(x)
        return jnp.concatenate(outputs, axis=-1), logdet_total

    def loss(self, audio, mel, sigma: float = 1.0):
        z, logdet = self.forward(audio, mel)
        ll = -jnp.sum(z ** 2, axis=(1, 2)) / (2 * sigma ** 2) + logdet
        return -jnp.mean(ll) / (z.shape[1] * z.shape[2])

    def infer(self, mel, rng, sigma: float = 0.8):
        """mel (B, N, n_mel) → waveform (B, T). Exact inverse of
        ``forward``; early-output channels are re-drawn as fresh noise
        when their flow is reached in reverse."""
        c = self.cfg
        b, n, _ = mel.shape
        t = ((n - 1) * c.hop_size + c.upsample_kernel) // c.n_group * c.n_group
        tg = t // c.n_group
        cond = self._cond(mel, t)
        rngs = jax.random.split(rng, c.n_flows)
        x = jax.random.normal(rngs[0], (b, tg, self.n_remaining_channels))
        x = x * sigma
        for k in reversed(range(c.n_flows)):
            n_half = x.shape[-1] // 2
            xa, xb = x[..., :n_half], x[..., n_half:]
            stats = self.wns[k](xa, cond)
            bias, log_s = stats[..., :n_half], stats[..., n_half:]
            xb = (xb - bias) * jnp.exp(-log_s)
            x = jnp.concatenate([xa, xb], axis=-1)
            x = self.convs[k](x, reverse=True)
            if k % c.n_early_every == 0 and k > 0:
                z = jax.random.normal(rngs[k], (b, tg, c.n_early_size)) * sigma
                x = jnp.concatenate([z, x], axis=-1)
        return x.reshape(b, -1)
