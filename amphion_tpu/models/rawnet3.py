"""Native RawNet3 speaker embedder (raw-waveform Res2Net + attentive
stat pooling).

Reference capability: `evaluation/metrics/similarity/models/RawNetModel.py`
+ `RawNetBasicBlock.py` (the reference's primary speaker-similarity model,
checkpoint `pretrained/rawnet3/model.pt`). The front end there is
`asteroid_filterbanks.Encoder(ParamSincFB(C//4, 251, stride=10))` — a
learnable analytic sinc filterbank (cos/sin bandpass pairs parameterized
by low-cutoff + bandwidth, SincNet-style); re-implemented here from the
published formulation so converted checkpoints (`low_hz_`, `band_hz_`)
reproduce the same filters.

TPU notes: NLC layout throughout; the sinc kernel is materialized from
the two (C/8, 1) parameter vectors inside the jitted forward (a 251x256
tensor — free next to the conv itself) so the filterbank stays trainable
and checkpoint-loadable without a host-side bake step; the Res2Net
hierarchical convs are small dense convs that XLA fuses; all pooling is
static-shape. Inference entry point `embed_segments` batches the
reference's 10 crops of 3 s into ONE device program.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class RawNet3Config:
    """Defaults = the reference similarity call
    (`speaker_similarity.py:63-76`: C=1024, scale 8, ECA, nOut 256,
    sinc stride 10, log_sinc, norm_sinc='mean', out_bn=False)."""

    channels: int = 1024          # C
    model_scale: int = 8
    embed_dim: int = 256          # nOut
    sinc_kernel: int = 251
    sinc_stride: int = 10
    sample_rate: float = 16000.0
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    log_sinc: bool = True
    norm_sinc: str = "mean"       # "mean" | "mean_std" | "none"
    context: bool = True
    summed: bool = True
    out_bn: bool = False
    preemph: float = 0.97


def sinc_fb_init(cutoff: int, sample_rate: float, min_low_hz: float,
                 min_band_hz: float) -> tuple[np.ndarray, np.ndarray]:
    """Mel-spaced init of (low_hz_, band_hz_), each (cutoff, 1) — the
    asteroid ParamSincFB initialization (30 Hz .. sr/2 - 100 Hz)."""
    to_mel = lambda hz: 2595.0 * np.log10(1.0 + hz / 700.0)
    to_hz = lambda mel: 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    low = 30.0
    high = sample_rate / 2.0 - (min_low_hz + min_band_hz)
    hz = to_hz(np.linspace(to_mel(low), to_mel(high), cutoff + 1))
    return (hz[:-1].reshape(-1, 1).astype(np.float32),
            np.diff(hz).reshape(-1, 1).astype(np.float32))


def sinc_filters(low_hz_: jax.Array, band_hz_: jax.Array, kernel_size: int,
                 sample_rate: float, min_low_hz: float,
                 min_band_hz: float) -> jax.Array:
    """Materialize the analytic sinc filterbank, (2*cutoff, kernel_size):
    first `cutoff` cos (in-phase bandpass) rows then `cutoff` sin
    (quadrature) rows, each normalized by twice its bandwidth."""
    half = kernel_size // 2
    low = min_low_hz + jnp.abs(low_hz_)                       # (F, 1)
    high = jnp.clip(low + min_band_hz + jnp.abs(band_hz_),
                    min_low_hz, sample_rate / 2.0)
    band = (high - low)[:, 0]                                 # (F,)
    # 2*pi*n/sr for the strictly-left half of the (odd) kernel
    n = (2.0 * math.pi
         * jnp.arange(-half, 0.0, dtype=jnp.float32)[None, :] / sample_rate)
    window = jnp.asarray(np.hamming(kernel_size)[:half].astype(np.float32))
    ft_low = low @ n                                          # (F, half)
    ft_high = high @ n

    cos_left = ((jnp.sin(ft_high) - jnp.sin(ft_low)) / (n / 2.0)) * window
    cos_center = 2.0 * band[:, None]
    cos_bp = jnp.concatenate(
        [cos_left, cos_center, jnp.flip(cos_left, axis=1)], axis=1)

    sin_left = ((jnp.cos(ft_low) - jnp.cos(ft_high)) / (n / 2.0)) * window
    sin_center = jnp.zeros_like(band[:, None])
    sin_bp = jnp.concatenate(
        [sin_left, sin_center, -jnp.flip(sin_left, axis=1)], axis=1)

    scale = 2.0 * band[:, None]
    return jnp.concatenate([cos_bp / scale, sin_bp / scale], axis=0)


class SincEncoder(nn.Module):
    """Learnable analytic sinc filterbank conv (stride-10 frontend)."""

    cfg: RawNet3Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        cutoff = (c.channels // 4) // 2
        init = sinc_fb_init(cutoff, c.sample_rate, c.min_low_hz,
                            c.min_band_hz)
        low_hz_ = self.param("low_hz_", lambda k: jnp.asarray(init[0]))
        band_hz_ = self.param("band_hz_", lambda k: jnp.asarray(init[1]))
        filters = sinc_filters(low_hz_, band_hz_, c.sinc_kernel,
                               c.sample_rate, c.min_low_hz, c.min_band_hz)
        out = jax.lax.conv_general_dilated(
            x[:, None, :], filters[:, None, :],
            window_strides=(c.sinc_stride,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGHEST)
        return jnp.transpose(out, (0, 2, 1))                  # (B, T', 2F)


class AFMS(nn.Module):
    """Alpha feature-map scaling (ref RawNetBasicBlock.py:34-55):
    gate from the time-mean, then (x + alpha) * gate."""

    dim: int

    @nn.compact
    def __call__(self, x):                                     # (B, T, C)
        gate = jax.nn.sigmoid(
            nn.Dense(self.dim, name="fc")(jnp.mean(x, axis=1)))
        alpha = self.param("alpha", nn.initializers.ones, (self.dim,))
        return (x + alpha) * gate[:, None, :]


def _max_pool1d(x, k: int):
    """torch MaxPool1d(k): kernel=stride=k, floor (VALID) — NLC."""
    return nn.max_pool(x, window_shape=(k,), strides=(k,), padding="VALID")


class Bottle2neck(nn.Module):
    """Res2Net bottleneck with dilated hierarchical convs + AFMS
    (ref RawNetBasicBlock.py:58-146). Keeps the reference's
    conv -> relu -> BN ordering quirk."""

    in_dim: int
    planes: int
    kernel_size: int
    dilation: int
    scale: int
    pool: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):               # (B, T, C)
        width = self.planes // self.scale
        nums = self.scale - 1
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, name=name)
        if self.in_dim != self.planes:
            residual = nn.Conv(self.planes, (1,), use_bias=False,
                               name="residual")(x)
        else:
            residual = x

        out = nn.Conv(width * self.scale, (1,), name="conv1")(x)
        out = bn("bn1")(jax.nn.relu(out))
        spx = jnp.split(out, self.scale, axis=-1)
        pad = (self.kernel_size // 2) * self.dilation
        pieces = []
        sp = None
        for i in range(nums):
            sp = spx[i] if i == 0 else sp + spx[i]
            sp = nn.Conv(width, (self.kernel_size,),
                         kernel_dilation=(self.dilation,),
                         padding=[(pad, pad)], name=f"conv_{i}")(sp)
            sp = bn(f"bn_{i}")(jax.nn.relu(sp))
            pieces.append(sp)
        pieces.append(spx[nums])
        out = jnp.concatenate(pieces, axis=-1)
        out = nn.Conv(self.planes, (1,), name="conv3")(out)
        out = bn("bn3")(jax.nn.relu(out))
        out = out + residual
        if self.pool:
            out = _max_pool1d(out, self.pool)
        return AFMS(self.planes, name="afms")(out)


class RawNet3(nn.Module):
    """ref RawNetModel.py:15-135 — returns (B, embed_dim) embeddings."""

    cfg: RawNet3Config = RawNet3Config()

    @nn.compact
    def __call__(self, audio, train: bool = False):
        """audio: (B, T) float32 waveform at 16 kHz."""
        c = self.cfg
        # PreEmphasis with left reflect pad: y[0] = x[0] - coef*x[1]
        x = audio - c.preemph * jnp.concatenate(
            [audio[:, 1:2], audio[:, :-1]], axis=1)
        # InstanceNorm1d(1, eps=1e-4, affine): per-utterance over time
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-4)
        in_w = self.param("in_scale", nn.initializers.ones, (1,))
        in_b = self.param("in_bias", nn.initializers.zeros, (1,))
        x = x * in_w + in_b

        x = jnp.abs(SincEncoder(c, name="sinc")(x))            # (B, T', C/4)
        if c.log_sinc:
            x = jnp.log(x + 1e-6)
        if c.norm_sinc == "mean":
            x = x - jnp.mean(x, axis=1, keepdims=True)
        elif c.norm_sinc == "mean_std":
            m = jnp.mean(x, axis=1, keepdims=True)
            s = jnp.maximum(jnp.std(x, axis=1, keepdims=True), 1e-3)
            x = (x - m) / s

        C, sc = c.channels, c.model_scale
        x1 = Bottle2neck(C // 4, C, 3, 2, sc, pool=5, name="layer1")(
            x, train)
        x2 = Bottle2neck(C, C, 3, 3, sc, pool=3, name="layer2")(x1, train)
        if c.summed:
            x3 = Bottle2neck(C, C, 3, 4, sc, name="layer3")(
                _max_pool1d(x1, 3) + x2, train)
        else:
            x3 = Bottle2neck(C, C, 3, 4, sc, name="layer3")(x2, train)

        x = nn.Conv(1536, (1,), name="layer4")(
            jnp.concatenate([_max_pool1d(x1, 3), x2, x3], axis=-1))
        x = jax.nn.relu(x)                                     # (B, T, 1536)

        if c.context:
            t = x.shape[1]
            mu = jnp.mean(x, axis=1, keepdims=True)
            # torch.var default: unbiased (N-1)
            var = jnp.sum((x - mu) ** 2, axis=1, keepdims=True) / max(
                t - 1, 1)
            sg = jnp.sqrt(jnp.clip(var, 1e-4, 1e4))
            glob = jnp.concatenate(
                [x, jnp.broadcast_to(mu, x.shape),
                 jnp.broadcast_to(sg, x.shape)], axis=-1)
        else:
            glob = x
        w = nn.Conv(128, (1,), name="att_conv1")(glob)
        w = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="att_bn")(jax.nn.relu(w))
        w = nn.Conv(1536, (1,), name="att_conv2")(w)           # ECA head
        w = jax.nn.softmax(w, axis=1)                          # over time

        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum(x * x * w, axis=1) - mu ** 2,
                               1e-4, 1e4))
        x = jnp.concatenate([mu, sg], axis=-1)                 # (B, 3072)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn5")(x)
        x = nn.Dense(c.embed_dim, name="fc6")(x)
        if c.out_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name="bn6")(x)
        return x


def segment_starts(n_samples: int, n_crop: int, n_segments: int = 10):
    """The reference's linspace crop grid
    (`speaker_similarity.py:38`): int starts of `n_segments` windows."""
    return [int(s) for s in np.linspace(0, n_samples - n_crop,
                                        num=n_segments)]


def embed_utterance(apply_fn, audio: np.ndarray, n_crop: int = 48000,
                    n_segments: int = 10) -> np.ndarray:
    """Reference protocol (`speaker_similarity.py:22-48`): wrap-pad to
    >= n_crop, take `n_segments` evenly-spaced crops, ONE batched device
    call, mean over crops."""
    audio = np.asarray(audio, np.float32)
    if audio.ndim != 1:
        raise ValueError("RawNet3 supports mono input only")
    if len(audio) < n_crop:
        audio = np.pad(audio, (0, n_crop - len(audio) + 1), "wrap")
    crops = np.stack([audio[s:s + n_crop]
                      for s in segment_starts(len(audio), n_crop,
                                              n_segments)])
    return np.asarray(apply_fn(jnp.asarray(crops))).mean(0)
