"""PicoAudio: temporally-controllable text-to-audio.

Reference: `models/tta/picoaudio/` (18k LoC vendored research stack;
core model `picoaudio/models/controllable_diffusion.py:139`
``Text_Onset_2_Audio_Diffusion``). Mechanism:

* a **timestamp (onset) matrix** (32 event classes × 256 latent frames,
  `controllable_dataset.py:36-48`: row = class id, 1 during each
  onset→offset span) is folded into 2 extra UNet *input channels*
  aligned with the latent's (time, freq) grid (`encode_channel`,
  `controllable_diffusion.py:154-157`: (B,32,256)→(B,2,256,16)) and
  concatenated with the noisy latents — temporal control is carried by
  input channels, NOT cross-attention;
* the cross-attn context is a single **event-class embedding** token
  (``class_emb`` Embedding(24, 1024), `controllable_diffusion.py:150`;
  the ClapText variant swaps in a CLAP text embedding);
* optional **min-SNR-γ loss weighting** and v-prediction
  (`controllable_diffusion.py:219-236`);
* CFG zeroes only the class context — onset channels ride both branches
  (`inference`, `controllable_diffusion.py:268-340`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.models.tta.audioldm import AudioLDM, AudioLDMConfig
from amphion_tpu.modules.diffusion import DiffusionSchedule, ddim_sample


def events_to_onset_matrix(
    events: list[list[tuple[int, float, float]]],  # per item: (class, on, off)s
    num_classes: int = 32,
    frames: int = 256,
    total_seconds: float = 10.0,
) -> np.ndarray:
    """Render per-event (class_id, onset_s, offset_s) spans into the
    reference's (B, num_classes, frames) 0/1 timestamp matrix
    (`controllable_dataset.py:31-50`)."""
    b = len(events)
    roll = np.zeros((b, num_classes, frames), np.float32)
    fps = frames / total_seconds
    for i, spans in enumerate(events):
        for cls, on, off in spans:
            a = int(np.clip(on * fps, 0, frames - 1))
            z = int(np.clip(off * fps, a + 1, frames))
            roll[i, int(cls) % num_classes, a:z] = 1.0
    return roll


def decode_onset_str(
    onset_str: str,
    class2id: dict[str, int],
    num_classes: int = 32,
    frames: int = 256,
    grid_frames: int = 250,
    total_seconds: float = 10.0,
) -> tuple[np.ndarray, str, int]:
    """Parse the reference's onset-string grammar into (onset matrix,
    ``event1 and event2 ...`` string, first event's class id).

    Grammar (`controllable_dataset.py:31-50`):
    ``event1__on1-off1_on2-off2--event2__on1-off1`` — events split on
    ``--``, event/instances on ``__``, spans on ``_``, seconds on ``-``.
    Seconds map to frames at ``grid_frames/total_seconds`` (25 fps: a 10 s
    clip fills 250 of the 256 matrix columns); a span whose offset frame
    exceeds ``frames-1`` stops that event's remaining spans (ref ``break``).
    """
    roll = np.zeros((num_classes, frames), np.float32)
    events = []
    for event_onset in onset_str.split("--"):
        event, instance = event_onset.split("__")
        events.append(event)
        for start_end in instance.split("_"):
            start_s, end_s = start_end.split("-")
            start = int(float(start_s) * grid_frames / total_seconds)
            end = int(float(end_s) * grid_frames / total_seconds)
            if end > frames - 1:
                break
            roll[class2id[event], start:end] = 1.0
    first_id = class2id[onset_str.split("__")[0]]
    return roll, " and ".join(events), first_id


@dataclass(frozen=True)
class PicoAudioConfig:
    # reference latents are (B, 8, 256, 16); UNet in_channels = 8 + 2 onset
    ldm: AudioLDMConfig = field(
        default_factory=lambda: AudioLDMConfig(latent_channels=8))
    onset_classes: int = 32  # timestamp-matrix rows (folds into 2×W channels)
    event_classes: int = 24  # class_emb vocabulary
    snr_gamma: float | None = None  # min-SNR-γ weighting (None = plain MSE)
    prediction_type: str = "epsilon"  # | "v"
    uncond_prob: float = 0.1  # context dropout (ref `uncondition` branch)


class PicoAudio(nn.Module):
    """Onset-channel-conditioned AudioLDM UNet + event-class context."""

    cfg: PicoAudioConfig

    def setup(self):
        self.unet = AudioLDM(self.cfg.ldm)
        self.class_emb = nn.Embed(self.cfg.event_classes,
                                  self.cfg.ldm.text_dim)

    def encode_onset(self, onset):
        """(B, classes, F) → (B, F, W, 2) NHWC onset channels
        (ref `encode_channel`: reshape(B,2,W,F).transpose(2,3) in NCHW)."""
        b, cls, f = onset.shape
        w = cls // 2
        return onset.reshape(b, 2, w, f).transpose(0, 3, 2, 1)

    def _context(self, event_id, text_emb=None):
        """Class-embedding token (B, 1, D); the ClapText variant passes a
        precomputed text embedding instead (`controllable_diffusion.py:349`)."""
        if text_emb is not None:
            return text_emb
        return self.class_emb(event_id.astype(jnp.int32))[:, None, :]

    def __call__(self, z_t, t, onset, event_id, text_emb=None):
        x = jnp.concatenate(
            [self.encode_onset(onset).astype(z_t.dtype), z_t], axis=-1)
        return self.unet(x, t, self._context(event_id, text_emb))

    def loss(self, z0, onset, event_id, rng, text_emb=None):
        c = self.cfg
        sched = self.unet.schedule
        r_t, r_n, r_d = jax.random.split(rng, 3)
        b = z0.shape[0]
        t = jax.random.randint(r_t, (b,), 0, sched.num_steps)
        noise = jax.random.normal(r_n, z0.shape)
        z_t = sched.q_sample(z0, t, noise)
        ctx = self._context(event_id, text_emb)
        drop = jax.random.bernoulli(r_d, c.uncond_prob, (b,))
        ctx = ctx * (1.0 - drop[:, None, None].astype(ctx.dtype))
        x = jnp.concatenate(
            [self.encode_onset(onset).astype(z_t.dtype), z_t], axis=-1)
        pred = self.unet(x, t, ctx)
        target = sched.training_target(z0, noise, t, c.prediction_type)
        se = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        if c.snr_gamma is None:
            loss = jnp.mean(se)
        else:
            # min-SNR-γ (ref compute_snr + §3.4 of arXiv:2303.09556)
            ab = jnp.asarray(sched.alphas_bar, jnp.float32)[t]
            snr = ab / jnp.maximum(1.0 - ab, 1e-8)
            w = jnp.minimum(snr, c.snr_gamma) / snr
            loss = jnp.mean(jnp.mean(se, axis=tuple(range(1, se.ndim))) * w)
        return loss, {"pico_loss": loss}


@functools.lru_cache(maxsize=16)
def _picoaudio_sample_jitted(model, shape, num_steps, guidance_scale,
                             compute_dtype):
    b = shape[0]
    dt = jnp.dtype(compute_dtype)
    sched = DiffusionSchedule.create(model.cfg.ldm.num_train_steps)

    def core(params, onset, event_id, rng, text_emb):
        params = jax.tree_util.tree_map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
        onset = onset.astype(dt)

        def eps_fn(x, t):
            tt = jnp.full((2 * b,), t)
            # one batched fwd for [cond; uncond]; CFG zeroes only the class
            # context — onset channels condition both branches (ref
            # encode_text_classifier_free + inference loop)
            ctx = model.apply({"params": params}, event_id, text_emb,
                              method=PicoAudio._context).astype(dt)
            e2 = model.apply(
                {"params": params}, jnp.concatenate([x, x]).astype(dt), tt,
                jnp.concatenate([onset, onset]), event_id,
                text_emb=jnp.concatenate([ctx, jnp.zeros_like(ctx)]),
            ).astype(jnp.float32)
            e_c, e_u = e2[:b], e2[b:]
            return e_u + guidance_scale * (e_c - e_u)

        return ddim_sample(eps_fn, sched, shape, rng, num_steps)

    return jax.jit(core)


def picoaudio_sample(model: PicoAudio, params, onset, event_id, shape, rng,
                     num_steps: int = 20, guidance_scale: float = 3.0,
                     text_emb=None, compute_dtype: str = "bfloat16"):
    """DDIM sampling with CFG over the class/text context only (ref
    `inference` defaults: 20 steps, scale 3). Memoized self-jitting;
    UNet in ``compute_dtype``, CFG/DDIM math f32. ``shape`` is the NHWC
    latent shape, e.g. (B, 256, 16, 8)."""
    return _picoaudio_sample_jitted(
        model, tuple(shape), num_steps, float(guidance_scale),
        compute_dtype)(params, onset,
                       jnp.asarray(event_id, jnp.int32), rng, text_emb)
