"""DualCodec: dual-stream low-frame-rate codec with semantic distillation,
checkpoint-compatible with the reference
(`models/codec/dualcodec/dualcodec/model_codec/dualcodec_model.py:30`):

- a DAC acoustic codec (`dac_model.py:172` — Snake/weight-norm conv
  encoder, factorized L2-lookup RVQ `dac_quantize.py:23`, mirror decoder)
  shared with our AmphionCodec blocks (the reference amphion_codec is the
  same DAC lineage, so `CodecEncoder`/`CodecDecoder` are reused);
- a semantic stream: w2v-bert features → WN 1x1 conv + ConvNeXt blocks
  (`cnn.py:12`, no layer-scale, exact GELU) → single FVQ-16384 →
  ConvNeXt decoder + WN 1x1 conv back to the feature dim;
- the decoded semantic latent is SUBTRACTED from the DAC latent before
  the acoustic RVQ and added back before decoding
  (`dac_model.py:300-313`), so acoustic codes carry only the residual;
- training distills the decoded semantic toward the w2v-bert features
  (`trainer.py:223` MSE) — returned here as `losses["distill"]`.

The reference relies on `semantic_dim == latent_dim` (1024 both). When a
config breaks that tie (e.g. the mel-proxy trainer), an extra Dense
bridge maps the decoded semantic into the latent space — an extension,
never populated when converting reference checkpoints.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.codec.amphion_codec import (
    CodecConfig,
    CodecDecoder,
    CodecEncoder,
)
from amphion_tpu.modules.quantize import FactorizedVectorQuantize, ResidualVQ


@dataclass(frozen=True)
class DualCodecConfig:
    codec: CodecConfig = field(
        default_factory=lambda: CodecConfig(
            sample_rate=24000, encoder_dim=64, strides=(2, 4, 8, 8),
            latent_dim=1024, decoder_dim=96,  # DAC decoder_dim 1536 / 2^4
            num_quantizers=9, codebook_size=1024, codebook_dim=8,
        )
    )
    semantic_dim: int = 1024  # w2v-bert feature dim (== latent_dim in ref)
    semantic_codebook_size: int = 16384
    semantic_codebook_dim: int = 8
    convnext_dim: int = 768
    convnext_layers: int = 4
    distill_weight: float = 1.0


class DualConvNeXtBlock(nn.Module):
    """ref `cnn.py:12` ConvNeXtBlock: depthwise k7 conv, LN(1e-6),
    pointwise MLP with exact GELU, residual; no layer scale."""

    dim: int
    intermediate_dim: int = 2048

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7,), padding="SAME",
                    feature_group_count=self.dim, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(y)
        y = nn.Dense(self.intermediate_dim, name="pwconv1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="pwconv2")(y)
        return x + y


class DualCodec(nn.Module):
    cfg: DualCodecConfig

    def setup(self):
        c = self.cfg
        self.encoder = CodecEncoder(c.codec, name="encoder")
        self.decoder = CodecDecoder(c.codec, name="decoder")
        self.quantizer = ResidualVQ(
            num_quantizers=c.codec.num_quantizers,
            codebook_size=c.codec.codebook_size,
            codebook_dim=c.codec.codebook_dim,
            input_dim=c.codec.latent_dim, name="quantizer",
        )
        self.semantic_in = nn.Dense(c.convnext_dim, name="semantic_in")
        self.sem_enc_blocks = [
            DualConvNeXtBlock(c.convnext_dim, name=f"sem_enc_{i}")
            for i in range(c.convnext_layers)
        ]
        self.semantic_vq = FactorizedVectorQuantize(
            c.semantic_codebook_size, c.semantic_codebook_dim,
            c.convnext_dim, name="semantic_vq",
        )
        self.sem_dec_blocks = [
            DualConvNeXtBlock(c.convnext_dim, name=f"sem_dec_{i}")
            for i in range(c.convnext_layers)
        ]
        self.semantic_out = nn.Dense(c.semantic_dim, name="semantic_out")
        self.semantic_bridge = (
            nn.Dense(c.codec.latent_dim, name="semantic_bridge")
            if c.semantic_dim != c.codec.latent_dim else None
        )

    # -- semantic stream (ref dualcodec_model.py:107-118, 153-159) ----------

    def _semantic_encode(self, semantic_repr):
        h = self.semantic_in(semantic_repr)
        for blk in self.sem_enc_blocks:
            h = blk(h)
        return h

    def _semantic_decode(self, zq):
        for blk in self.sem_dec_blocks:
            zq = blk(zq)
        return self.semantic_out(zq)

    def _to_latent(self, sem_decoded):
        return (self.semantic_bridge(sem_decoded)
                if self.semantic_bridge is not None else sem_decoded)

    def semantic_quantize(self, semantic_repr):
        """w2v-bert features (B, N, D) → semantic codes (B, N)."""
        _, codes, _ = self.semantic_vq(self._semantic_encode(semantic_repr))
        return codes

    # -- full model ----------------------------------------------------------

    def __call__(self, audio, semantic_feats, rng=None, train=False):
        """audio (B, T), semantic_feats (B, N, semantic_dim) frame-aligned
        with the codec rate. Returns (recon (B, T), (sem_codes (B, N'),
        ac_codes (Q, B, N')), losses) — ref `forward:162` with the eval
        bypass_quantize=False path."""
        c = self.cfg
        zq_sem, sem_codes, l_sem = self.semantic_vq(
            self._semantic_encode(semantic_feats))
        sem_decoded = self._semantic_decode(zq_sem)
        sem_lat = self._to_latent(sem_decoded)

        z = self.encoder(audio)
        n = min(z.shape[1], sem_lat.shape[1])
        z = z[:, :n] - sem_lat[:, :n]
        zq_ac, ac_codes, l_ac = self.quantizer(z, train=train, rng=rng)
        recon = self.decoder(zq_ac + sem_lat[:, :n])
        t = audio.shape[-1]
        if recon.shape[-1] >= t:
            recon = recon[..., :t]
        else:
            recon = jnp.pad(recon, ((0, 0), (0, t - recon.shape[-1])))

        losses = {f"sem_{k}": v for k, v in l_sem.items()}
        losses.update({f"ac_{k}": v for k, v in l_ac.items()})
        losses["distill"] = c.distill_weight * jnp.mean(
            (sem_decoded[:, :n] - semantic_feats[:, :n]) ** 2)
        return recon, (sem_codes[:, :n], ac_codes[..., :n]), losses

    def encode(self, audio, semantic_feats=None):
        """→ (sem_codes (B, N) | None, ac_codes (Q, B, N)) — ref
        `encode:121`. Without semantic features the acoustic RVQ encodes
        the raw latent (extension for generic tokenizer use)."""
        z = self.encoder(audio)
        sem_codes = None
        if semantic_feats is not None:
            zq_sem, sem_codes, _ = self.semantic_vq(
                self._semantic_encode(semantic_feats))
            sem_lat = self._to_latent(self._semantic_decode(zq_sem))
            n = min(z.shape[1], sem_lat.shape[1])
            z = z[:, :n] - sem_lat[:, :n]
            sem_codes = sem_codes[:, :n]
        _, ac_codes, _ = self.quantizer(z)
        return sem_codes, ac_codes

    def decode_tokens(self, sem_codes, ac_codes=None):
        """codes → waveform — ref `decode_from_codes:153`."""
        zq_sem = self.semantic_vq.decode(sem_codes)
        z = self._to_latent(self._semantic_decode(zq_sem))
        if ac_codes is not None:
            z = z + self.quantizer.decode(ac_codes)
        return self.decoder(z)
