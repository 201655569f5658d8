"""PicoAudio: temporally-controllable text-to-audio.

Reference: `models/tta/picoaudio/` (18k LoC vendored research stack — an
AudioLDM-family latent diffusion whose text conditioning is augmented with
per-event onset/offset timestamps). The TPU build expresses the capability
as a conditioning adapter over the shared AudioLDM UNet: event timestamps
render into a frame-aligned "timing roll" that is projected and concatenated
with the text-embedding context.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.models.tta.audioldm import AudioLDM, AudioLDMConfig, audioldm_sample


def events_to_timing_roll(
    events: list[list[tuple[float, float]]],  # per item: [(onset_s, offset_s)]
    num_event_types: int,
    latent_frames: int,
    total_seconds: float,
) -> np.ndarray:
    """Render (onset, offset) spans into a (B, latent_frames, E) 0/1 roll.

    Each item's k-th event tuple activates event-type k (the reference's
    'one caption per event with timestamps' becomes one channel per event).
    """
    b = len(events)
    roll = np.zeros((b, latent_frames, num_event_types), np.float32)
    fps = latent_frames / total_seconds
    for i, spans in enumerate(events):
        for k, (on, off) in enumerate(spans[:num_event_types]):
            a = int(np.clip(on * fps, 0, latent_frames - 1))
            z = int(np.clip(off * fps, a + 1, latent_frames))
            roll[i, a:z, k] = 1.0
    return roll


@dataclass(frozen=True)
class PicoAudioConfig:
    ldm: AudioLDMConfig = field(default_factory=AudioLDMConfig)
    num_event_types: int = 8


class PicoAudio(nn.Module):
    """AudioLDM with timestamp conditioning appended to the text context."""

    cfg: PicoAudioConfig

    def setup(self):
        self.ldm = AudioLDM(self.cfg.ldm)
        self.timing_proj = nn.Dense(self.cfg.ldm.text_dim)

    def _context(self, text_emb, timing_roll):
        timing_ctx = self.timing_proj(timing_roll)  # (B, T', text_dim)
        return jnp.concatenate([text_emb, timing_ctx], axis=1)

    def __call__(self, z_t, t, text_emb, timing_roll):
        return self.ldm(z_t, t, self._context(text_emb, timing_roll))

    def loss(self, z0, text_emb, timing_roll, rng):
        return self.ldm.loss(z0, self._context(text_emb, timing_roll), rng)


@functools.lru_cache(maxsize=16)
def _picoaudio_sample_jitted(model, shape, num_steps, guidance_scale,
                             compute_dtype):
    from amphion_tpu.modules.diffusion import DiffusionSchedule, ddim_sample

    b = shape[0]
    dt = jnp.dtype(compute_dtype)
    sched = DiffusionSchedule.create(model.cfg.ldm.num_train_steps)

    def core(params, text_emb, timing_roll, rng):
        params = jax.tree_util.tree_map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
        text_emb = text_emb.astype(dt)
        timing_roll = timing_roll.astype(dt)

        def eps_fn(x, t):
            tt = jnp.full((2 * b,), t)
            # one batched fwd for [cond; uncond] halves the step count
            e2 = model.apply(
                {"params": params}, jnp.concatenate([x, x]).astype(dt), tt,
                jnp.concatenate([text_emb, jnp.zeros_like(text_emb)]),
                jnp.concatenate([timing_roll, jnp.zeros_like(timing_roll)]),
            ).astype(jnp.float32)
            e_c, e_u = e2[:b], e2[b:]
            return e_u + guidance_scale * (e_c - e_u)

        return ddim_sample(eps_fn, sched, shape, rng, num_steps)

    return jax.jit(core)


def picoaudio_sample(model: PicoAudio, params, text_emb, timing_roll, shape,
                     rng, num_steps: int = 50, guidance_scale: float = 3.0,
                     compute_dtype: str = "bfloat16"):
    """DDIM sampling with CFG over the combined (text + timing) context.
    Memoized self-jitting; UNet in ``compute_dtype``, CFG/DDIM math f32."""
    return _picoaudio_sample_jitted(
        model, tuple(shape), num_steps, float(guidance_scale),
        compute_dtype)(params, text_emb, timing_roll, rng)
