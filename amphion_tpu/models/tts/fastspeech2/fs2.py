"""FastSpeech2: non-autoregressive mel TTS with variance adaptation.

Same architecture family as the reference (reference:
`models/tts/fastspeech2/fs2.py` — `FastSpeech2:372` FFT encoder/decoder,
`VarianceAdaptor:53` duration/pitch/energy predictors + LengthRegulator,
postnet), rebuilt on the TPU module library with the static-shape length
regulator so the whole train/infer forward jit-compiles.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.duration import length_regulate
from amphion_tpu.modules.transformer import FFTBlock, sinusoidal_positions


@dataclass(frozen=True)
class FastSpeech2Config:
    num_phones: int = 512
    hidden: int = 256
    n_enc_layers: int = 4
    n_dec_layers: int = 6
    n_heads: int = 2
    ffn_hidden: int = 1024
    kernel_size: int = 9
    n_mel: int = 80
    max_frames: int = 1000
    pitch_bins: int = 256
    energy_bins: int = 256
    pitch_min: float = -4.0  # normalized log-f0 range (dataset statistics)
    pitch_max: float = 4.0
    energy_min: float = -4.0
    energy_max: float = 4.0
    n_speakers: int = 0
    variance_hidden: int = 256
    dropout: float = 0.2


class VariancePredictor(nn.Module):
    """Conv-ReLU-LN-dropout x2 + linear (ref `fs2.py` duration/pitch/energy)."""

    hidden: int
    kernel_size: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        for i in range(2):
            x = nn.Conv(self.hidden, (self.kernel_size,), padding="SAME")(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm()(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        out = nn.Dense(1)(x)[..., 0]
        if mask is not None:
            out = out * mask
        return out


class VarianceAdaptor(nn.Module):
    """Duration/pitch/energy prediction + quantized-embedding addition +
    length regulation (ref `fs2.py:53-220`)."""

    cfg: FastSpeech2Config

    @nn.compact
    def __call__(self, x, phone_mask, durations=None, pitch=None, energy=None,
                 d_control=1.0, deterministic=True):
        c = self.cfg
        log_d_pred = VariancePredictor(c.variance_hidden, name="duration")(
            x, phone_mask, deterministic
        )
        if durations is None:
            durations = jnp.round(
                (jnp.exp(log_d_pred) - 1.0) * d_control
            ).astype(jnp.int32)
            durations = jnp.maximum(durations * phone_mask.astype(jnp.int32), 0)
        x, frame_mask = length_regulate(x, durations, c.max_frames)
        fmask = frame_mask.astype(jnp.float32)

        pitch_pred = VariancePredictor(c.variance_hidden, name="pitch")(
            x, fmask, deterministic
        )
        p = pitch if pitch is not None else pitch_pred
        p_bins = jnp.clip(
            ((p - c.pitch_min) / (c.pitch_max - c.pitch_min) * (c.pitch_bins - 1)),
            0, c.pitch_bins - 1,
        ).astype(jnp.int32)
        x = x + nn.Embed(c.pitch_bins, x.shape[-1], name="pitch_embed")(p_bins)

        energy_pred = VariancePredictor(c.variance_hidden, name="energy")(
            x, fmask, deterministic
        )
        e = energy if energy is not None else energy_pred
        e_bins = jnp.clip(
            ((e - c.energy_min) / (c.energy_max - c.energy_min) * (c.energy_bins - 1)),
            0, c.energy_bins - 1,
        ).astype(jnp.int32)
        x = x + nn.Embed(c.energy_bins, x.shape[-1], name="energy_embed")(e_bins)

        return x, fmask, {
            "log_duration_pred": log_d_pred,
            "pitch_pred": pitch_pred,
            "energy_pred": energy_pred,
        }


class Postnet(nn.Module):
    """5-layer conv postnet producing a residual mel refinement."""

    n_mel: int
    hidden: int = 256

    @nn.compact
    def __call__(self, mel, deterministic=True):
        x = mel
        for i in range(4):
            x = nn.Conv(self.hidden, (5,), padding="SAME")(x)
            x = jnp.tanh(nn.LayerNorm()(x))
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
        x = nn.Conv(self.n_mel, (5,), padding="SAME",
                    kernel_init=nn.initializers.zeros)(x)
        return mel + x


class FastSpeech2(nn.Module):
    cfg: FastSpeech2Config

    @nn.compact
    def __call__(self, phones, phone_mask, durations=None, pitch=None,
                 energy=None, sid=None, d_control=1.0, deterministic=True):
        c = self.cfg
        x = nn.Embed(c.num_phones, c.hidden, name="phone_embed")(phones)
        pos = jnp.asarray(sinusoidal_positions(phones.shape[1], c.hidden))
        x = x + pos[None]
        for i in range(c.n_enc_layers):
            x = FFTBlock(c.hidden, c.n_heads, c.ffn_hidden, c.kernel_size,
                         c.dropout, name=f"enc_{i}")(x, phone_mask, deterministic)
        if c.n_speakers > 1 and sid is not None:
            x = x + nn.Embed(c.n_speakers, c.hidden, name="spk")(sid)[:, None, :]

        x, fmask, var = VarianceAdaptor(c, name="variance")(
            x, phone_mask, durations, pitch, energy, d_control, deterministic
        )
        pos_d = jnp.asarray(sinusoidal_positions(c.max_frames, c.hidden))
        x = x + pos_d[None]
        for i in range(c.n_dec_layers):
            x = FFTBlock(c.hidden, c.n_heads, c.ffn_hidden, c.kernel_size,
                         c.dropout, name=f"dec_{i}")(x, fmask, deterministic)
        mel = nn.Dense(c.n_mel, name="mel_out")(x)
        mel_post = Postnet(c.n_mel, name="postnet")(mel, deterministic)
        return {
            "mel": mel,
            "mel_postnet": mel_post,
            "frame_mask": fmask,
            **var,
        }


def fastspeech2_loss(out: dict, batch: dict) -> tuple[jax.Array, dict]:
    """L1 mel (+postnet) + MSE log-duration/pitch/energy (masked)."""
    fmask = out["frame_mask"][..., None]
    pmask = batch["phone_mask"]
    denom_f = jnp.maximum(jnp.sum(fmask), 1.0)
    mel_l = jnp.sum(jnp.abs(out["mel"] - batch["mel"]) * fmask) / (
        denom_f * batch["mel"].shape[-1]
    )
    post_l = jnp.sum(jnp.abs(out["mel_postnet"] - batch["mel"]) * fmask) / (
        denom_f * batch["mel"].shape[-1]
    )
    log_d_tgt = jnp.log(batch["durations"].astype(jnp.float32) + 1.0)
    dur_l = jnp.sum(((out["log_duration_pred"] - log_d_tgt) ** 2) * pmask) / jnp.maximum(
        jnp.sum(pmask), 1.0
    )
    fm = out["frame_mask"]
    pitch_l = jnp.sum(((out["pitch_pred"] - batch["pitch"]) ** 2) * fm) / denom_f
    energy_l = jnp.sum(((out["energy_pred"] - batch["energy"]) ** 2) * fm) / denom_f
    total = mel_l + post_l + dur_l + pitch_l + energy_l
    return total, {
        "mel": mel_l, "mel_post": post_l, "dur": dur_l,
        "pitch": pitch_l, "energy": energy_l,
    }
