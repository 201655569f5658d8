"""VevoRepCodec: the Vevo content / content-style VQ-VAE tokenizer,
checkpoint-compatible with the reference
(`models/codec/vevo/vevo_repcodec.py:526` — trained on HuBERT features,
FVQ-32 / FVQ-8192 recipes `egs/codec/vevo/fvq{32,8192}.sh`):

ELU conv encoder (ResidualUnits with bias-free convs + strided
EncoderBlock convs), k3 projector, EMA VectorQuantize residual stack
(codebook stored transposed (dim, n_embed); plain euclidean), decoder with
transposed-conv DecoderBlocks (torch p=ceil(s/2), out_pad=s%2) and a
bias-free output conv.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VevoRepCodecConfig:
    input_channels: int = 768
    output_channels: int = 768
    encode_channels: int = 768
    decode_channels: int = 768
    code_dim: int = 768
    codebook_num: int = 1
    codebook_size: int = 1024
    enc_ratios: tuple[float, ...] = (1.0, 1.0)
    dec_ratios: tuple[float, ...] = (1.0, 1.0)
    enc_strides: tuple[int, ...] = (1, 1)
    dec_strides: tuple[int, ...] = (1, 1)
    kernel_size: int = 3
    block_dilations: tuple[int, ...] = (1, 1)
    unit_kernel_size: int = 3


def _conv(feats, k, name, strides=1, dilation=1, bias=True):
    pad = (k - 1) // 2 * dilation
    return nn.Conv(feats, (k,), strides=(strides,), kernel_dilation=(dilation,),
                   padding=[(pad, pad)], use_bias=bias, name=name)


class VevoResidualUnit(nn.Module):
    """ref vevo_repcodec.py:292 — ELU→conv k3 dil→ELU→1x1, bias-free."""

    channels: int
    dilation: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        y = _conv(self.channels, self.kernel_size, "conv1",
                  dilation=self.dilation, bias=False)(nn.elu(x))
        y = _conv(self.channels, 1, "conv2", bias=False)(nn.elu(y))
        return x + y


class _VevoEncoder(nn.Module):
    cfg: VevoRepCodecConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = _conv(c.encode_channels, c.kernel_size, "enc_conv",
                  bias=False)(x)
        in_ch = c.encode_channels
        for i, (r, s) in enumerate(zip(c.enc_ratios, c.enc_strides)):
            for j, d in enumerate(c.block_dilations):
                h = VevoResidualUnit(in_ch, d, c.unit_kernel_size,
                                     name=f"enc_{i}_res_{j}")(h)
            out_ch = int(c.encode_channels * r)
            k = 3 if s == 1 else 2 * s
            h = nn.Conv(out_ch, (k,), strides=(s,),
                        padding=[((k - 1) // 2, (k - 1) // 2)],
                        name=f"enc_{i}_down")(h)
            in_ch = out_ch
        return _conv(c.code_dim, 3, "projector", bias=False)(h)


class _VevoDecoder(nn.Module):
    cfg: VevoRepCodecConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        h = _conv(int(c.decode_channels * c.dec_ratios[0]), c.kernel_size,
                  "dec_conv1", bias=False)(z)
        n = len(c.dec_strides)
        for i, s in enumerate(c.dec_strides):
            out_ch = (int(c.decode_channels * c.dec_ratios[i + 1])
                      if i < n - 1 else c.decode_channels)
            if s == 1:
                h = _conv(out_ch, 3, f"dec_{i}_up")(h)
            else:
                k = 2 * s
                p = (s + 1) // 2  # torch default; out_pad = s % 2
                h = nn.ConvTranspose(
                    out_ch, (k,), strides=(s,),
                    padding=((k - 1 - p, k - 1 - s // 2),),
                    name=f"dec_{i}_up")(h)
            for j, d in enumerate(c.block_dilations):
                h = VevoResidualUnit(out_ch, d, c.unit_kernel_size,
                                     name=f"dec_{i}_res_{j}")(h)
        return _conv(c.output_channels, c.kernel_size, "dec_conv2",
                     bias=False)(h)


class VevoRepCodec(nn.Module):
    cfg: VevoRepCodecConfig

    def setup(self):
        c = self.cfg
        self.codebooks = [
            self.param(f"codebook_{i}", nn.initializers.normal(1.0),
                       (c.codebook_size, c.code_dim))
            for i in range(c.codebook_num)
        ]
        self.enc = _VevoEncoder(c, name="enc")
        self.dec = _VevoDecoder(c, name="dec")

    def _encoder_project(self, x):
        return self.enc(x)

    def _decoder(self, z):
        return self.dec(z)

    def _rvq(self, z, with_st=True):
        residual = z
        total = jnp.zeros_like(z)
        idxs = []
        for cb in self.codebooks:
            d = (jnp.sum(residual**2, -1, keepdims=True)
                 - 2 * residual @ cb.T + jnp.sum(cb**2, -1)[None, None])
            idx = jnp.argmin(d, axis=-1)
            q = jnp.take(cb, idx, axis=0)
            if with_st:
                q = residual + jax.lax.stop_gradient(q - residual)
            residual = residual - q
            total = total + q
            idxs.append(idx)
        return total, jnp.stack(idxs)

    def __call__(self, feats):
        """feats (B, T, input_channels) → (recon, tokens (Q, B, T'),
        losses)."""
        z = self._encoder_project(feats)
        zq, idxs = self._rvq(z)
        commit = jnp.mean((jax.lax.stop_gradient(zq) - z) ** 2)
        recon = self._decoder(zq)
        return recon, idxs, {"vq_commit": commit}

    def encode(self, feats):
        """feats → tokens (B, T') for a single-codebook config."""
        _, idxs = self._rvq(self._encoder_project(feats), with_st=False)
        return idxs[0] if idxs.shape[0] == 1 else idxs

    def decode_tokens(self, tokens):
        """(B, T') or (Q, B, T') codes → quantized latents (B, T', D)."""
        if tokens.ndim == 2:
            tokens = tokens[None]
        total = None
        for qi in range(tokens.shape[0]):
            dec = jnp.take(self.codebooks[qi], tokens[qi], axis=0)
            total = dec if total is None else total + dec
        return total

    def decode_to_feats(self, tokens):
        return self._decoder(self.decode_tokens(tokens))
