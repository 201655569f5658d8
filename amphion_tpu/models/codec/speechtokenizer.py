"""SpeechTokenizer: semantic-distilled RVQ codec, checkpoint-compatible
with the reference vendored stack (`models/codec/speechtokenizer/`):

- EnCodec SEANet encoder/decoder (`modules/seanet.py`): weight-normed convs
  with the EnCodec asymmetric "same" padding (reflect, extra right padding
  to the ideal frame count), ResnetBlocks with dim//2 hidden, [k, 1]
  kernels, dilation_base**j dilations and a CONV shortcut
  (true_skip=False), stacked (bi)LSTM context (`modules/lstm.py` SLSTM:
  torch semantics — bidirectional concat + duplicated-input skip),
  stride-2r transposed convs with (pad_total//2 right) trimming;
- EnCodec residual vector quantizer (`modules/quantization/core_vq.py`):
  plain euclidean EMA codebooks (dim == latent dim, no projections);
- RVQ-1 output projected to the SSL feature dim for distillation
  (`model.py:40-43 transform`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.models.codec.amphion_codec import CodecConfig


@dataclass(frozen=True)
class SpeechTokenizerConfig:
    codec: CodecConfig = field(default_factory=lambda: CodecConfig(
        strides=(2, 4, 5, 8)))
    n_q: int = 8
    codebook_size: int = 1024
    codebook_dim: int = 8  # unused (EnCodec RVQ: codebook dim == latent dim)
    semantic_dimension: int = 768  # HuBERT-base feature dim
    lstm_layers: int = 2
    bidirectional: bool = True
    n_residual_layers: int = 1
    dilation_base: int = 2
    residual_kernel_size: int = 3
    activation: str = "ELU"  # or "Snake"
    # EnCodec-24k streaming variant (ref utils/tokenizer.py:29 —
    # encodec_model_24khz has use_causal_conv=True): convs pad entirely
    # left, transposed convs trim entirely right (trim_right_ratio=1.0)
    causal: bool = False

    @property
    def hop(self) -> int:
        return self.codec.hop


def _act(x, kind, alpha=None):
    if kind == "Snake":
        return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2
    return nn.elu(x)


class _SnakeAct(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.channels,))
        return _act(x, "Snake", alpha)


def _pad_same(x, k, stride, dilation=1, causal=False):
    """EnCodec padding (conv.py:70-120): pad_total = (k-1)*d - (s-1).
    Non-causal: left = ceil, right = floor + extra to the ideal frame
    count. Causal: ALL pad_total left, extra right. Reflect mode."""
    length = x.shape[1]
    eff_k = (k - 1) * dilation + 1
    pad_total = eff_k - stride
    n_frames = (length - eff_k + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (eff_k - pad_total)
    extra = max(ideal - length, 0)
    if causal:
        left, right = pad_total, 0
    else:
        right = pad_total // 2
        left = pad_total - right
    right += extra
    # torch-exact reflect (encodec conv.py pad1d / HF _pad1d): when the
    # input is too short to reflect, zero-extend right by (max_pad-L+1)
    # first, reflect THROUGH the zeros, then drop the extension — this
    # also makes length-masked ragged decode equal the solo decode.
    max_pad = max(left, right)
    if length > max_pad:
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    ext = max_pad - length + 1
    y = jnp.pad(jnp.pad(x, ((0, 0), (0, ext), (0, 0))),
                ((0, 0), (left, right), (0, 0)), mode="reflect")
    return y[:, : y.shape[1] - ext]


def _wn_conv(feats, k, name, strides=1, dilation=1):
    return nn.WeightNorm(nn.Conv(
        feats, (k,), strides=(strides,), kernel_dilation=(dilation,),
        padding="VALID", name=name))


class SEANetConvTr(nn.Module):
    """Weight-normed ConvTranspose with EnCodec trimming (conv.py:286-330:
    non-causal unpads pad_total//2 right + rest left; causal unpads ALL
    pad_total right — trim_right_ratio=1.0)."""

    channels: int
    kernel: int
    stride: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.WeightNorm(nn.ConvTranspose(
            self.channels, (self.kernel,), strides=(self.stride,),
            padding=((self.kernel - 1, self.kernel - 1),), name="convtr"))(x)
        # flax full-padding output = (T-1)*s + k; trim to torch unpadded
        pad_total = self.kernel - self.stride
        if self.causal:
            left, right = 0, pad_total
        else:
            right = pad_total // 2
            left = pad_total - right
        return y[:, left: y.shape[1] - right]


class SEANetResnetBlock(nn.Module):
    """ref seanet.py:42: [act, conv k3 dil, act, conv k1] with dim//2
    hidden and a 1x1 conv shortcut (true_skip=False)."""

    dim: int
    dilation: int
    activation: str = "ELU"
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = self.dim // 2
        y = x
        if self.activation == "Snake":
            y = _SnakeAct(self.dim, name="act_0")(y)
        else:
            y = nn.elu(y)
        y = _pad_same(y, 3, 1, self.dilation, self.causal)
        y = _wn_conv(hidden, 3, "conv_0", dilation=self.dilation)(y)
        if self.activation == "Snake":
            y = _SnakeAct(hidden, name="act_1")(y)
        else:
            y = nn.elu(y)
        y = _wn_conv(self.dim, 1, "conv_1")(y)
        sc = _wn_conv(self.dim, 1, "shortcut")(x)
        return sc + y


class SLSTM(nn.Module):
    """ref lstm.py:18 — stacked torch LSTM; bidirectional concatenates
    [fwd, bwd] and the skip duplicates the input features."""

    dim: int
    num_layers: int = 2
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.dim),
                         name=f"l{i}_fwd")(h)
            if self.bidirectional:
                bwd = nn.RNN(nn.OptimizedLSTMCell(self.dim), reverse=True,
                             keep_order=True, name=f"l{i}_bwd")(h)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd
        if self.bidirectional:
            x = jnp.concatenate([x, x], axis=-1)
        return h + x


class SEANetEncoder(nn.Module):
    cfg: SpeechTokenizerConfig

    @nn.compact
    def __call__(self, x):
        """(B, T) waveform → (B, T/hop, dimension)."""
        c = self.cfg
        nf = c.codec.encoder_dim
        if x.ndim == 2:
            x = x[..., None]
        h = _wn_conv(nf, 7, "conv_in")(_pad_same(x, 7, 1, causal=c.causal))
        mult = 1
        ratios = tuple(reversed(c.codec.strides))
        for i, r in enumerate(ratios):
            for j in range(c.n_residual_layers):
                h = SEANetResnetBlock(
                    mult * nf, c.dilation_base**j, c.activation, c.causal,
                    name=f"block_{i}_{j}")(h)
            if c.activation == "Snake":
                h = _SnakeAct(mult * nf, name=f"down_act_{i}")(h)
            else:
                h = nn.elu(h)
            h = _wn_conv(mult * nf * 2, 2 * r, f"down_{i}", strides=r)(
                _pad_same(h, 2 * r, r, causal=c.causal))
            mult *= 2
        h = SLSTM(mult * nf, c.lstm_layers, c.bidirectional, name="lstm")(h)
        if c.bidirectional:
            mult *= 2
        if c.activation == "Snake":
            h = _SnakeAct(mult * nf, name="final_act")(h)
        else:
            h = nn.elu(h)
        return _wn_conv(c.codec.latent_dim, 7, "conv_out")(
            _pad_same(h, 7, 1, causal=c.causal))


class SEANetDecoder(nn.Module):
    cfg: SpeechTokenizerConfig

    @nn.compact
    def __call__(self, z):
        """(B, N, dimension) → (B, N*hop) waveform."""
        c = self.cfg
        nf = c.codec.encoder_dim
        mult = 2 ** len(c.codec.strides)
        h = _wn_conv(mult * nf, 7, "conv_in")(
            _pad_same(z, 7, 1, causal=c.causal))
        h = SLSTM(mult * nf, c.lstm_layers, False, name="lstm")(h)
        for i, r in enumerate(c.codec.strides):
            if c.activation == "Snake":
                h = _SnakeAct(mult * nf, name=f"up_act_{i}")(h)
            else:
                h = nn.elu(h)
            h = SEANetConvTr(mult * nf // 2, 2 * r, r, c.causal,
                             name=f"up_{i}")(h)
            for j in range(c.n_residual_layers):
                h = SEANetResnetBlock(
                    mult * nf // 2, c.dilation_base**j, c.activation,
                    c.causal, name=f"block_{i}_{j}")(h)
            mult //= 2
        if c.activation == "Snake":
            h = _SnakeAct(nf, name="final_act")(h)
        else:
            h = nn.elu(h)
        h = _wn_conv(1, 7, "conv_out")(_pad_same(h, 7, 1, causal=c.causal))
        return h[..., 0]


class EncodecRVQ(nn.Module):
    """EnCodec residual VQ (core_vq.py:331): plain euclidean EMA codebooks,
    dim == latent dim, straight-through."""

    n_q: int
    codebook_size: int
    dim: int
    commitment: float = 1.0

    def setup(self):
        self.codebooks = [
            self.param(f"codebook_{i}", nn.initializers.normal(1.0),
                       (self.codebook_size, self.dim))
            for i in range(self.n_q)
        ]

    def _nearest(self, x, cb):
        d = (jnp.sum(x**2, -1, keepdims=True)
             - 2 * x @ cb.T + jnp.sum(cb**2, -1)[None, None])
        return jnp.argmin(d, axis=-1)

    def __call__(self, z, n_q=None):
        n_q = n_q or self.n_q
        residual = z
        total = jnp.zeros_like(z)
        codes, zq_layers = [], []
        commit = 0.0
        for i in range(n_q):
            cb = self.codebooks[i]
            idx = self._nearest(jax.lax.stop_gradient(residual), cb)
            zq = jnp.take(cb, idx, axis=0)
            commit = commit + jnp.mean(
                (residual - jax.lax.stop_gradient(zq)) ** 2)
            zq = residual + jax.lax.stop_gradient(zq - residual)  # ST
            residual = residual - zq
            total = total + zq
            codes.append(idx)
            zq_layers.append(zq)
        return total, jnp.stack(codes), commit * self.commitment, zq_layers

    def encode(self, z, n_q=None, st=0):
        n_q = n_q or self.n_q
        residual = z
        codes = []
        for i in range(n_q):
            cb = self.codebooks[i]
            idx = self._nearest(residual, cb)
            zq = jnp.take(cb, idx, axis=0)
            residual = residual - zq
            if i >= st:
                codes.append(idx)
        return jnp.stack(codes)

    def decode(self, codes, st=0):
        total = None
        for k in range(codes.shape[0]):
            dec = jnp.take(self.codebooks[st + k], codes[k], axis=0)
            total = dec if total is None else total + dec
        return total


class SpeechTokenizer(nn.Module):
    cfg: SpeechTokenizerConfig

    def setup(self):
        c = self.cfg
        self.encoder = SEANetEncoder(c)
        self.quantizer = EncodecRVQ(c.n_q, c.codebook_size,
                                    c.codec.latent_dim, name="quantizer")
        self.decoder = SEANetDecoder(c)
        self.semantic_proj = nn.Dense(c.semantic_dimension, name="semantic")

    def __call__(self, audio, n_q=None):
        """audio (B, T) → (recon, codes (Q, B, N), semantic, losses).

        ``semantic`` is the RVQ-1 output projected to the SSL feature dim —
        train it toward frozen HuBERT/w2v-bert features (distillation,
        ref model.py:128 ``feature``)."""
        z = self.encoder(audio)
        total, codes, commit, zq_layers = self.quantizer(z, n_q=n_q)
        semantic = self.semantic_proj(zq_layers[0])
        recon = self.decoder(total)
        return recon, codes, semantic, {"vq_commit": commit}

    def encode(self, audio, n_q: int | None = None, st: int = 0):
        """audio → codes (n_q-st, B, N), starting at RVQ layer ``st``."""
        return self.quantizer.encode(self.encoder(audio), n_q=n_q, st=st)

    def decode(self, codes, st: int = 0):
        """codes (K, B, N) (layers st..st+K-1) → waveform (B, N*hop)."""
        return self.decoder(self.quantizer.decode(codes, st=st))
