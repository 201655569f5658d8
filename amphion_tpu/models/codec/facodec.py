"""FACodec: factorized codec disentangling content / prosody / detail / timbre.

Same capability as the reference (reference: `models/codec/ns3_codec/
facodec.py:157` `FACodecEncoder`, `:242` `FACodecDecoder` with timbre
extractor + gradient reversal `gradient_reversal.py`, `:602`
`FACodecRedecoder` for zero-shot VC; trainable copy `models/codec/facodec/`):

- shared conv encoder → three quantized branches (prosody: 1 RVQ layer over
  a low-frequency projection; content: 2 layers; acoustic detail: 3 layers);
- a global timbre vector (mean-pooled) removed from the branches via a
  gradient-reversed speaker classifier on the content branch;
- decoder sums branch latents, re-injects timbre through style-adaptive
  conditioning; swapping the timbre vector gives zero-shot VC (redecode).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.codec.amphion_codec import CodecConfig, CodecDecoder, CodecEncoder
from amphion_tpu.modules.norms import StyleAdaptiveLayerNorm
from amphion_tpu.modules.quantize import ResidualVQ


@jax.custom_vjp
def gradient_reversal(x, scale=1.0):
    return x


def _grl_fwd(x, scale):
    return x, scale


def _grl_bwd(scale, g):
    return (-scale * g, None)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)


@dataclass(frozen=True)
class FACodecConfig:
    codec: CodecConfig = CodecConfig()
    prosody_layers: int = 1
    content_layers: int = 2
    detail_layers: int = 3
    codebook_size: int = 1024
    codebook_dim: int = 8
    timbre_dim: int = 256
    num_speakers: int = 512
    grl_scale: float = 1.0


class TimbreExtractor(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, h):
        """Frame latents (B, N, D) → global timbre vector (B, dim)."""
        x = nn.Conv(self.dim, (5,), strides=(2,), padding="SAME")(h)
        x = nn.gelu(x)
        x = nn.Conv(self.dim, (5,), strides=(2,), padding="SAME")(x)
        x = nn.gelu(x)
        return jnp.mean(x, axis=1)


class FACodec(nn.Module):
    cfg: FACodecConfig

    def setup(self):
        c = self.cfg
        self.encoder = CodecEncoder(c.codec)
        d = c.codec.latent_dim
        self.timbre = TimbreExtractor(c.timbre_dim)
        self.prosody_proj = nn.Dense(d)
        mk = lambda n, layers: ResidualVQ(
            num_quantizers=layers, codebook_size=c.codebook_size,
            codebook_dim=c.codebook_dim, input_dim=d, name=n,
        )
        self.q_prosody = mk("q_prosody", c.prosody_layers)
        self.q_content = mk("q_content", c.content_layers)
        self.q_detail = mk("q_detail", c.detail_layers)
        self.spk_classifier = nn.Dense(c.num_speakers)
        self.style_norm = StyleAdaptiveLayerNorm()
        self.decoder = CodecDecoder(c.codec)

    def encode_branches(self, audio, rng=None, train=False):
        h = self.encoder(audio)  # (B, N, D)
        timbre = self.timbre(h)
        # remove global timbre statistics from frames (instance norm style)
        h_norm = (h - jnp.mean(h, axis=1, keepdims=True)) / (
            jnp.std(h, axis=1, keepdims=True) + 1e-5
        )
        # prosody = low-frequency trajectory (smoothed latents)
        window = 7
        kernel = jnp.ones((window,)) / window
        h_smooth = jax.vmap(
            lambda hb: jax.vmap(
                lambda col: jnp.convolve(col, kernel, mode="same"), 1, 1
            )(hb)
        )(h_norm)
        zp, cp, lp = self.q_prosody(self.prosody_proj(h_smooth), train=train, rng=rng)
        zc, cc, lc = self.q_content(h_norm - jax.lax.stop_gradient(zp), train=train, rng=rng)
        zr, cr, lr = self.q_detail(
            h_norm - jax.lax.stop_gradient(zp + zc), train=train, rng=rng
        )
        return h_norm, timbre, (zp, zc, zr), (cp, cc, cr), (lp, lc, lr)

    def decode(self, zp, zc, zr, timbre):
        z = zp + zc + zr
        z = self.style_norm(z, timbre)
        return self.decoder(z)

    def __call__(self, audio, speaker_id=None, rng=None, train=False):
        _, timbre, (zp, zc, zr), codes, (lp, lc, lr) = self.encode_branches(
            audio, rng, train
        )
        recon = self.decode(zp, zc, zr, timbre)
        losses = {}
        for tag, ld in (("prosody", lp), ("content", lc), ("detail", lr)):
            for k, v in ld.items():
                losses[f"{tag}_{k}"] = v
        if speaker_id is not None:
            # adversarial speaker removal from the content branch
            logits = self.spk_classifier(
                jnp.mean(gradient_reversal(zc, self.cfg.grl_scale), axis=1)
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            losses["spk_adv"] = -jnp.mean(
                jnp.take_along_axis(logp, speaker_id[:, None], axis=-1)
            )
        return recon, codes, timbre, losses

    def voice_conversion(self, audio_src, audio_ref):
        """Redecode source content/prosody/detail with reference timbre
        (ref `FACodecRedecoder`, facodec.py:602)."""
        _, _, (zp, zc, zr), _, _ = self.encode_branches(audio_src)
        _, timbre_ref, _, _, _ = self.encode_branches(audio_ref)
        return self.decode(zp, zc, zr, timbre_ref)
