"""EnCodec 24 kHz — the reference VALL-E's audio tokenizer
(`/root/reference/utils/tokenizer.py:18-77`: `EncodecModel.
encodec_model_24khz()` at 6 kbps → 8 RVQ streams, 75 Hz frame rate).

TPU-native rebuild of the facebook/encodec_24khz architecture: CAUSAL
SEANet encoder/decoder (all conv padding left, transposed-conv trimming
right — `speechtokenizer.py`'s blocks with ``causal=True``), stacked
unidirectional 2-layer LSTM context, and the plain euclidean-EMA
residual VQ (codebook dim == latent dim 128). Weight-compatible with
the published checkpoint via `utils/convert.hf_encodec_to_flax`
(transformers `EncodecModel` state-dict names), token-exactness asserted
in tests/test_encodec.py.

Defaults are exactly encodec_24khz: n_filters 32, ratios (8, 5, 4, 2)
→ hop 320, latent 128, codebooks 1024, normalize=False (no per-chunk
scales), whole-signal encode (chunk_length None at 24 kHz).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax.numpy as jnp

from amphion_tpu.models.codec.amphion_codec import CodecConfig
from amphion_tpu.models.codec.speechtokenizer import (
    EncodecRVQ,
    SEANetDecoder,
    SEANetEncoder,
    SpeechTokenizerConfig,
)


def _encodec_seanet_cfg(n_filters: int, latent_dim: int,
                        ratios: tuple[int, ...], lstm_layers: int) -> (
        SpeechTokenizerConfig):
    # SEANet strides are given decoder-order; the encoder reverses them
    # internally (seanet.py semantics) → downsample 2,4,5,8 for (8,5,4,2).
    return SpeechTokenizerConfig(
        codec=CodecConfig(strides=tuple(ratios), encoder_dim=n_filters,
                          latent_dim=latent_dim),
        lstm_layers=lstm_layers, bidirectional=False,
        n_residual_layers=1, dilation_base=2, activation="ELU",
        causal=True)


@dataclass(frozen=True)
class EncodecConfig:
    n_filters: int = 32
    latent_dim: int = 128
    ratios: tuple[int, ...] = (8, 5, 4, 2)  # decoder (upsample) order
    n_q: int = 8            # 6 kbps: 8 × 10 bit × 75 Hz
    codebook_size: int = 1024
    lstm_layers: int = 2
    sample_rate: int = 24000

    @property
    def hop(self) -> int:
        h = 1
        for r in self.ratios:
            h *= r
        return h

    @property
    def seanet(self) -> SpeechTokenizerConfig:
        return _encodec_seanet_cfg(self.n_filters, self.latent_dim,
                                   self.ratios, self.lstm_layers)


class EncodecModel(nn.Module):
    """Causal SEANet + residual VQ; the `AudioTokenizer` backend that
    reproduces the reference VALL-E's token space."""

    cfg: EncodecConfig = field(default_factory=EncodecConfig)

    def setup(self):
        c = self.cfg
        self.encoder = SEANetEncoder(c.seanet)
        self.quantizer = EncodecRVQ(c.n_q, c.codebook_size, c.latent_dim,
                                    name="quantizer")
        self.decoder = SEANetDecoder(c.seanet)

    def __call__(self, audio, n_q: int | None = None):
        """audio (B, T) → (recon (B, T'), codes (Q, B, N), losses)."""
        z = self.encoder(audio)
        total, codes, commit, _ = self.quantizer(z, n_q=n_q)
        recon = self.decoder(total)
        return recon, codes, {"vq_commit": commit}

    def encode(self, audio, n_q: int | None = None):
        """audio (B, T) → codes (Q, B, N) at 75 Hz."""
        return self.quantizer.encode(self.encoder(audio), n_q=n_q)

    def decode_codes(self, codes, frame_lengths=None):
        """codes (Q, B, N) → waveform (B, N*hop).

        ``frame_lengths`` (B,): per-row valid frame counts for a padded
        batch — codes and latents beyond a row's length are zero-masked
        before the decoder and the waveform tail is zeroed (length-masked
        ragged decode, same contract as the other codecs)."""
        z = self.quantizer.decode(codes)
        if frame_lengths is not None:
            n = z.shape[1]
            mask = (jnp.arange(n)[None, :] < frame_lengths[:, None])
            z = z * mask[..., None]
        wav = self.decoder(z)
        if frame_lengths is not None:
            hop = self.cfg.hop
            t = wav.shape[1]
            wmask = (jnp.arange(t)[None, :]
                     < (frame_lengths[:, None] * hop))
            wav = wav * wmask
        return wav
