"""VITS: end-to-end VAE + flow + adversarial TTS.

Same model family as the reference (reference: `models/tts/vits/vits.py` —
`TextEncoder:28`, `PosteriorEncoder:115`, `ResidualCouplingBlock:70`, MAS at
`:284`, `StochasticDurationPredictor`, HiFi-GAN decoder, and the voice
conversion path at `:371`), re-built on the TPU module library:

- MAS runs fully on device (`amphion_tpu/ops/mas.py`) — the reference round
  trips tensors through a Cython/numpy kernel every training step;
- training forward slices a fixed-size segment for the waveform decoder with
  `dynamic_slice` (static shapes under jit);
- all masks are additive-bias/static-shape friendly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig, HiFiGANGenerator
from amphion_tpu.modules.duration import (
    DurationPredictor,
    StochasticDurationPredictor,
    length_regulate,
)
from amphion_tpu.modules.flows import WN, ResidualCouplingBlock
from amphion_tpu.modules.transformer import TransformerEncoder
from amphion_tpu.ops.mas import maximum_path


@dataclass(frozen=True)
class VITSConfig:
    num_phones: int = 512
    spec_channels: int = 513  # n_fft//2 + 1
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    n_speakers: int = 0
    gin_channels: int = 256
    use_sdp: bool = True
    segment_size: int = 32  # latent frames fed to the waveform decoder
    decoder: HiFiGANConfig = field(
        default_factory=lambda: HiFiGANConfig(
            resblock="1",
            upsample_rates=(5, 4, 3, 2),
            upsample_kernel_sizes=(10, 8, 6, 4),
            upsample_initial_channel=512,
            n_mel=192,
        )
    )


class TextEncoder(nn.Module):
    cfg: VITSConfig

    @nn.compact
    def __call__(self, phones, phone_mask):
        c = self.cfg
        x = nn.Embed(c.num_phones, c.hidden_channels, name="emb")(phones)
        x = x * math.sqrt(c.hidden_channels)
        x = TransformerEncoder(
            c.hidden_channels, c.n_heads, c.n_layers, c.filter_channels,
            c.kernel_size, window_size=4, name="encoder",
        )(x, phone_mask)
        stats = nn.Dense(2 * c.inter_channels, name="proj")(x)
        m, logs = jnp.split(stats, 2, axis=-1)
        return x, m, logs


class PosteriorEncoder(nn.Module):
    cfg: VITSConfig

    @nn.compact
    def __call__(self, spec, spec_mask, g=None, rng=None):
        c = self.cfg
        x = nn.Conv(c.hidden_channels, (1,), name="pre")(spec)
        x = x * spec_mask[..., None]
        x = WN(c.hidden_channels, 5, 1, 16, gin_channels=c.gin_channels,
               name="enc")(x, spec_mask, g=g)
        stats = nn.Dense(2 * c.inter_channels, name="proj")(x)
        m, logs = jnp.split(stats, 2, axis=-1)
        noise = jax.random.normal(rng, m.shape) if rng is not None else 0.0
        z = (m + noise * jnp.exp(logs)) * spec_mask[..., None]
        return z, m, logs


class VITS(nn.Module):
    """Holds all submodules; call via the `train_forward`, `infer`, and
    `voice_conversion` methods (flax method dispatch)."""

    cfg: VITSConfig

    def setup(self):
        c = self.cfg
        self.text_encoder = TextEncoder(c)
        self.posterior = PosteriorEncoder(c)
        self.flow = ResidualCouplingBlock(
            c.inter_channels, c.hidden_channels, 5, 1, 4,
            gin_channels=c.gin_channels,
        )
        self.decoder = HiFiGANGenerator(c.decoder)
        if c.use_sdp:
            # ref vits.py:240 passes filter_channels=192 but the SDP ctor
            # overrides it with in_channels (stochastic_duration_predictor
            # .py:25: `filter_channels = in_channels`)
            self.duration_predictor = StochasticDurationPredictor(
                c.hidden_channels, 3, 0.5, 4, c.gin_channels
            )
        else:
            self.duration_predictor = DurationPredictor(256, 3, 0.5, c.gin_channels)
        if c.n_speakers > 1:
            self.speaker_embed = nn.Embed(c.n_speakers, c.gin_channels)

    def _speaker(self, sid):
        if self.cfg.n_speakers > 1 and sid is not None:
            return self.speaker_embed(sid)[:, None, :]  # (B, 1, G)
        return None

    def train_forward(self, phones, phone_mask, spec, spec_mask, rng, sid=None):
        """Training path: returns dict with segment waveform + loss pieces."""
        c = self.cfg
        rng_post, rng_dur, rng_seg = jax.random.split(rng, 3)
        g = self._speaker(sid)
        x, m_p, logs_p = self.text_encoder(phones, phone_mask)
        z, m_q, logs_q = self.posterior(spec, spec_mask, g=g, rng=rng_post)
        z_p, _ = self.flow(z, spec_mask, g=g)

        # ---- MAS over the Gaussian likelihood lattice (ref vits.py:270-296)
        s_p_sq_r = jnp.exp(-2.0 * logs_p)  # (B, L, C)
        neg_cent1 = jnp.sum(-0.5 * math.log(2 * math.pi) - logs_p, axis=-1)  # (B, L)
        neg_cent2 = jnp.einsum("btc,blc->blt", -0.5 * z_p**2, s_p_sq_r)
        neg_cent3 = jnp.einsum("btc,blc->blt", z_p, m_p * s_p_sq_r)
        neg_cent4 = jnp.sum(-0.5 * m_p**2 * s_p_sq_r, axis=-1)  # (B, L)
        neg_cent = neg_cent1[:, :, None] + neg_cent2 + neg_cent3 + neg_cent4[:, :, None]
        attn_mask = phone_mask[:, :, None] * spec_mask[:, None, :]
        attn = jax.lax.stop_gradient(maximum_path(neg_cent, attn_mask))

        w = jnp.sum(attn, axis=-1)  # (B, L) durations
        if c.use_sdp:
            l_length = self.duration_predictor(
                x, phone_mask, w=w, g=g, rng=rng_dur
            ) / jnp.maximum(jnp.sum(phone_mask, axis=-1), 1.0)
        else:
            logw_hat = self.duration_predictor(x, phone_mask, g=g)
            logw = jnp.log(w + 1e-6) * phone_mask
            l_length = jnp.sum((logw_hat - logw) ** 2, axis=-1) / jnp.maximum(
                jnp.sum(phone_mask, axis=-1), 1.0
            )

        # expand text stats to frame rate through the alignment
        m_p_f = jnp.einsum("blt,blc->btc", attn, m_p)
        logs_p_f = jnp.einsum("blt,blc->btc", attn, logs_p)

        # ---- random segment for the waveform decoder (static shape)
        spec_len = jnp.sum(spec_mask, axis=-1).astype(jnp.int32)
        max_start = jnp.maximum(spec_len - c.segment_size, 0)
        start = (
            jax.random.uniform(rng_seg, (z.shape[0],)) * (max_start + 1).astype(jnp.float32)
        ).astype(jnp.int32)
        z_seg = _slice_segments(z, start, c.segment_size)
        wav_seg = self.decoder(z_seg, g=g)

        return {
            "wav_segment": wav_seg,
            "segment_start": start,
            "z_p": z_p,
            "m_p": m_p_f,
            "logs_p": logs_p_f,
            "m_q": m_q,
            "logs_q": logs_q,
            "attn": attn,
            "l_length": l_length,
        }

    def infer(self, phones, phone_mask, rng, sid=None, noise_scale=0.667,
              length_scale=1.0, noise_scale_w=0.8, max_frames: int = 1000):
        c = self.cfg
        rng_dur, rng_z = jax.random.split(rng)
        g = self._speaker(sid)
        x, m_p, logs_p = self.text_encoder(phones, phone_mask)
        if c.use_sdp:
            logw = self.duration_predictor(
                x, phone_mask, g=g, reverse=True, noise_scale=noise_scale_w,
                rng=rng_dur,
            )
        else:
            logw = self.duration_predictor(x, phone_mask, g=g)
        w = jnp.exp(logw) * phone_mask * length_scale
        w_ceil = jnp.ceil(w).astype(jnp.int32)
        stats = jnp.concatenate([m_p, logs_p], axis=-1)
        stats_f, frame_mask = length_regulate(stats, w_ceil, max_frames)
        m_p_f, logs_p_f = jnp.split(stats_f, 2, axis=-1)
        z_p = m_p_f + jax.random.normal(rng_z, m_p_f.shape) * jnp.exp(logs_p_f) * noise_scale
        z = self.flow(z_p, frame_mask.astype(jnp.float32), g=g, reverse=True)
        wav = self.decoder(z * frame_mask[..., None], g=g)
        return wav, frame_mask, w_ceil

    def voice_conversion(self, spec, spec_mask, sid_src, sid_tgt, rng=None):
        """(ref vits.py:371-383): posterior of source → flow fwd with source
        speaker → flow reverse with target speaker → decode. ``rng=None``
        uses the posterior mean (deterministic conversion)."""
        g_src = self._speaker(sid_src)
        g_tgt = self._speaker(sid_tgt)
        z, _, _ = self.posterior(spec, spec_mask, g=g_src, rng=rng)
        z_p, _ = self.flow(z, spec_mask, g=g_src)
        z_hat = self.flow(z_p, spec_mask, g=g_tgt, reverse=True)
        return self.decoder(z_hat * spec_mask[..., None], g=g_tgt)


def _slice_segments(x: jax.Array, start: jax.Array, size: int) -> jax.Array:
    """Batched dynamic segment slice: x (B, T, C), start (B,) → (B, size, C)."""

    def one(xb, sb):
        return jax.lax.dynamic_slice(xb, (sb, 0), (size, xb.shape[-1]))

    return jax.vmap(one)(x, start)


def slice_audio_segments(audio: jax.Array, start_frames: jax.Array, size_frames: int,
                         hop: int) -> jax.Array:
    """Slice the waveform segments matching `_slice_segments` latent crops."""

    def one(ab, sb):
        return jax.lax.dynamic_slice(ab, (sb * hop,), (size_frames * hop,))

    return jax.vmap(one)(audio, start_frames)


def vits_kl_loss(z_p, logs_q, m_p, logs_p, mask):
    """KL(q||p) over aligned frames (ref `models/tts/vits/vits_trainer.py`)."""
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * (jnp.exp(2.0 * logs_q) + (z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * mask[..., None])
    return kl / jnp.maximum(jnp.sum(mask) * z_p.shape[-1], 1.0)
