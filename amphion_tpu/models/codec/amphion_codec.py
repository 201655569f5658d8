"""AmphionCodec: SEANet-style convolutional audio codec with residual VQ.

Same capability surface as the reference codec (reference:
`models/codec/amphion_codec/codec.py:100` `CodecEncoder`, `:168`
`CodecDecoder` with pluggable VQ/FVQ/RVQ/LFQ quantizers from
`models/codec/amphion_codec/quantize/`; this is MaskGCT's acoustic codec),
re-designed for TPU: NLC layouts, snake activations, weight-norm convs, and
the quantizer family from `amphion_tpu/modules/quantize.py`.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.activations import Snake
from amphion_tpu.modules.quantize import ResidualVQ


@dataclass(frozen=True)
class CodecConfig:
    sample_rate: int = 24000
    encoder_dim: int = 32
    latent_dim: int = 256
    decoder_dim: int = 32
    strides: tuple[int, ...] = (2, 4, 5, 6)  # hop = 240 @24k -> 100 Hz
    num_quantizers: int = 8
    codebook_size: int = 1024
    codebook_dim: int = 8
    quantizer_type: str = "fvq"
    # Vocos-style decoder (ref codec.py:372 `use_vocos`: ConvNeXt backbone +
    # ISTFT head instead of the transposed-conv stack — the published
    # MaskGCT acoustic codec uses this with dim 512 / 30 layers / n_fft 1920
    # / hop 480, ref models/tts/maskgct/config/maskgct.json)
    use_vocos_decoder: bool = False
    vocos_dim: int = 512
    vocos_intermediate_dim: int = 4096
    vocos_num_layers: int = 30
    vocos_n_fft: int = 1920
    vocos_hop: int = 480

    @property
    def hop(self) -> int:
        if self.use_vocos_decoder:
            return self.vocos_hop
        h = 1
        for s in self.strides:
            h *= s
        return h


class ResidualUnit(nn.Module):
    channels: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, mask=None):
        # mask (B, T, 1): zero pad positions before the dilated conv so a
        # ragged batch matches an unpadded decode (the 1x1 conv is
        # positionwise — no further masking needed inside the unit).
        if mask is not None:
            x = x * mask
        y = Snake(self.channels, name="act1")(x)
        y = nn.WeightNorm(nn.Conv(self.channels, (7,), kernel_dilation=(self.dilation,),
                                  padding="SAME"))(y)
        y = Snake(self.channels, name="act2")(y)
        y = nn.WeightNorm(nn.Conv(self.channels, (1,)))(y)
        return x + y


class CodecEncoder(nn.Module):
    """(B, T) waveform → (B, T/hop, latent_dim)."""

    cfg: CodecConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.WeightNorm(nn.Conv(c.encoder_dim, (7,), padding="SAME"))(x[..., None])
        ch = c.encoder_dim
        for i, s in enumerate(c.strides):
            for d in (1, 3, 9):
                h = ResidualUnit(ch, d, name=f"res_{i}_{d}")(h)
            ch = ch * 2
            h = Snake(h.shape[-1], name=f"down_act_{i}")(h)
            h = nn.WeightNorm(
                nn.Conv(ch, (2 * s,), strides=(s,), padding=[(s // 2 + s % 2, s // 2)])
            )(h)
        h = Snake(ch, name="final_act")(h)
        return nn.WeightNorm(nn.Conv(c.latent_dim, (3,), padding="SAME"))(h)


class CodecDecoder(nn.Module):
    """(B, N, latent_dim) → (B, N*hop) waveform."""

    cfg: CodecConfig

    @nn.compact
    def __call__(self, z, frame_lengths=None):
        """``frame_lengths`` (B,): length-masked ragged decode — every
        spatial conv sees zeros beyond the row's valid extent (scaled by
        the upsample stride as it grows), so ``out[i, :len_i * hop]``
        equals an unpadded solo decode of row ``i``."""
        c = self.cfg

        def _mask(length, t):
            if length is None:
                return None
            return (jnp.arange(t)[None, :]
                    < length[:, None]).astype(z.dtype)[:, :, None]

        flen = frame_lengths
        mask = _mask(flen, z.shape[1])
        if mask is not None:
            z = z * mask
        ch = c.decoder_dim * (2 ** len(c.strides))
        h = nn.WeightNorm(nn.Conv(ch, (7,), padding="SAME"))(z)
        for i, s in enumerate(reversed(c.strides)):
            ch = ch // 2
            if mask is not None:
                h = h * mask
            h = Snake(h.shape[-1], name=f"up_act_{i}")(h)
            k = 2 * s
            # ref codec.py:147 DecoderBlock: torch padding = ceil(s/2),
            # output_padding = s % 2 → flax (k-1-ceil(s/2), k-1-s//2);
            # symmetric for even strides, right-extended for odd
            h = nn.WeightNorm(
                nn.ConvTranspose(ch, (k,), strides=(s,),
                                 padding=((k - 1 - (s // 2 + s % 2),
                                           k - 1 - s // 2),))
            )(h)
            if flen is not None:
                flen = flen * s
                mask = _mask(flen, h.shape[1])
            for d in (1, 3, 9):
                h = ResidualUnit(ch, d, name=f"res_{i}_{d}")(h, mask)
        if mask is not None:
            h = h * mask
        h = Snake(ch, name="final_act")(h)
        h = nn.WeightNorm(nn.Conv(1, (7,), padding="SAME"))(h)
        return jnp.tanh(h)[..., 0]


class AmphionCodec(nn.Module):
    """Full codec: encode → RVQ → decode, with encode/decode token APIs."""

    cfg: CodecConfig

    def setup(self):
        c = self.cfg
        self.encoder = CodecEncoder(c)
        if c.use_vocos_decoder:
            from amphion_tpu.models.vocoders.vocos import (
                VocosConfig,
                VocosGenerator,
            )

            self.decoder = VocosGenerator(VocosConfig(
                n_mel=c.latent_dim, dim=c.vocos_dim,
                intermediate_dim=c.vocos_intermediate_dim,
                num_layers=c.vocos_num_layers, n_fft=c.vocos_n_fft,
                hop_size=c.vocos_hop))
        else:
            self.decoder = CodecDecoder(c)
        self.quantizer = ResidualVQ(
            num_quantizers=c.num_quantizers,
            codebook_size=c.codebook_size,
            codebook_dim=c.codebook_dim,
            input_dim=c.latent_dim,
            quantizer_type=c.quantizer_type,
        )

    def __call__(self, audio, train: bool = False, rng=None):
        """audio (B, T) → (recon (B, T), codes (Q, B, N), vq_losses)."""
        z = self.encoder(audio)
        zq, codes, vq_losses = self.quantizer(z, train=train, rng=rng)
        recon = self.decoder(zq)
        return recon, codes, vq_losses

    def encode(self, audio):
        """audio → codes (Q, B, N)."""
        z = self.encoder(audio)
        _, codes, _ = self.quantizer(z)
        return codes

    def decode_codes(self, codes, frame_lengths=None):
        """codes (Q, B, N) → waveform.

        ``frame_lengths`` (B,) runs a length-masked ragged decode (see
        `CodecDecoder` / `VocosGenerator`): row ``i``'s first
        ``frame_lengths[i] * hop`` samples equal an unpadded decode of
        that row alone — no pad bleed through the conv/iSTFT receptive
        field when serving mixed-length batches."""
        zq = self.quantizer.decode(codes)
        return self.decoder(zq, frame_lengths)
