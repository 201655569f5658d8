"""VITS-SVC: VITS with content features replacing text (so-VITS style).

Reference: `models/svc/vits/` (`vits_trainer.py`, whisper/contentvec content
features + F0 through the condition encoder into a VITS posterior/flow/
decoder). Reuses the framework's VITS components with a ConditionEncoder
front end; no MAS/duration model is needed because content features are
already frame-aligned.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.tts.vits.vits import PosteriorEncoder, VITSConfig, _slice_segments
from amphion_tpu.models.vocoders.hifigan import HiFiGANGenerator
from amphion_tpu.modules.condition_encoder import (
    ConditionEncoder,
    ConditionEncoderConfig,
)
from amphion_tpu.modules.flows import ResidualCouplingBlock
from amphion_tpu.modules.transformer import TransformerEncoder


@dataclass(frozen=True)
class VitsSVCConfig:
    vits: VITSConfig = field(default_factory=VITSConfig)
    condition: ConditionEncoderConfig = field(
        default_factory=lambda: ConditionEncoderConfig(output_dim=192)
    )


class VitsSVC(nn.Module):
    cfg: VitsSVCConfig

    def setup(self):
        v = self.cfg.vits
        self.condition_encoder = ConditionEncoder(self.cfg.condition)
        self.content_encoder = TransformerEncoder(
            v.hidden_channels, v.n_heads, v.n_layers, v.filter_channels,
            v.kernel_size, window_size=4,
        )
        self.content_proj = nn.Dense(2 * v.inter_channels)
        self.posterior = PosteriorEncoder(v)
        self.flow = ResidualCouplingBlock(
            v.inter_channels, v.hidden_channels, 5, 1, 4,
            gin_channels=v.gin_channels,
        )
        self.decoder = HiFiGANGenerator(v.decoder)
        if v.n_speakers > 1:
            self.speaker_embed = nn.Embed(v.n_speakers, v.gin_channels)

    def _speaker(self, sid):
        if self.cfg.vits.n_speakers > 1 and sid is not None:
            return self.speaker_embed(sid)[:, None, :]
        return None

    def _prior(self, features: dict, frame_mask):
        h = self.condition_encoder(features)
        h = self.content_encoder(h, frame_mask)
        m, logs = jnp.split(self.content_proj(h), 2, axis=-1)
        return m, logs

    def train_forward(self, features: dict, spec, frame_mask, rng, sid=None):
        v = self.cfg.vits
        rng_post, rng_seg = jax.random.split(rng)
        g = self._speaker(sid)
        m_p, logs_p = self._prior(features, frame_mask)
        z, m_q, logs_q = self.posterior(spec, frame_mask, g=g, rng=rng_post)
        z_p, _ = self.flow(z, frame_mask, g=g)

        spec_len = jnp.sum(frame_mask, axis=-1).astype(jnp.int32)
        max_start = jnp.maximum(spec_len - v.segment_size, 0)
        start = (
            jax.random.uniform(rng_seg, (z.shape[0],))
            * (max_start + 1).astype(jnp.float32)
        ).astype(jnp.int32)
        z_seg = _slice_segments(z, start, v.segment_size)
        # the reference conditions posterior/flow on the speaker but NOT
        # the waveform decoder (ref svc vits.py:214-221)
        wav_seg = self.decoder(z_seg)
        return {
            "wav_segment": wav_seg,
            "segment_start": start,
            "z_p": z_p,
            "m_p": m_p,
            "logs_p": logs_p,
            "m_q": m_q,
            "logs_q": logs_q,
        }

    def infer(self, features: dict, frame_mask, rng, sid=None, noise_scale=0.35):
        g = self._speaker(sid)
        m_p, logs_p = self._prior(features, frame_mask)
        z_p = m_p + jax.random.normal(rng, m_p.shape) * jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p, frame_mask, g=g, reverse=True)
        return self.decoder(z * frame_mask[..., None])
