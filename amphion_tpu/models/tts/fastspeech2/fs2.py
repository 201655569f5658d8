"""FastSpeech2, checkpoint-compatible with the reference
(`models/tts/fastspeech2/fs2.py:372`, the ming024 lineage):

- legacy FFT encoder/decoder (`modules/transformer/Models.py:47,114`,
  `SubLayers.py:13,64`): post-LN attention (residual + LN inside the MHA),
  conv FFN with the (k, 1) kernel pair, sinusoid position table added to
  the embeddings, masked fill after each block;
- `VarianceAdaptor` (`fs2.py:53`): duration/pitch/energy VariancePredictors
  (conv-ReLU-LN-dropout ×2 + linear, output masked), bucketize on stored
  bin boundaries (linear or log quantization), phoneme- or frame-level
  pitch/energy embeddings, length regulation;
- PostNet (`modules/transformer/Layers.py:68`): 5 k5 convs with tanh; the
  reference's BatchNorm1d is represented as a per-channel affine
  (eval-time equivalent; converters fold the running statistics).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.modules.duration import length_regulate
from amphion_tpu.modules.transformer import sinusoidal_positions


@dataclass(frozen=True)
class FastSpeech2Config:
    num_phones: int = 512
    hidden: int = 256
    n_enc_layers: int = 4
    n_dec_layers: int = 6
    n_heads: int = 2
    ffn_hidden: int = 1024
    kernel_size: int = 9  # FFN conv_1 kernel; conv_2 is k=1 (ref [9, 1])
    n_mel: int = 80
    max_frames: int = 1000
    pitch_bins: int = 256
    energy_bins: int = 256
    pitch_min: float = -4.0  # normalized range (dataset statistics.json)
    pitch_max: float = 4.0
    energy_min: float = -4.0
    energy_max: float = 4.0
    pitch_quantization: str = "linear"  # or "log"
    energy_quantization: str = "linear"
    pitch_level: str = "frame"  # "frame" | "phoneme" (ref use_frame_pitch)
    energy_level: str = "frame"
    n_speakers: int = 0
    variance_hidden: int = 256
    variance_kernel: int = 3
    dropout: float = 0.2


class LegacyMHA(nn.Module):
    """ref SubLayers.py:13 — separate q/k/v heads, scale 1/sqrt(d_k),
    post-LN with the residual inside."""

    channels: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        b, t, d = x.shape
        nh, dk = self.num_heads, self.channels // self.num_heads
        q = nn.Dense(nh * dk, name="w_qs")(x).reshape(b, t, nh, dk)
        k = nn.Dense(nh * dk, name="w_ks")(x).reshape(b, t, nh, dk)
        v = nn.Dense(nh * dk, name="w_vs")(x).reshape(b, t, nh, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dk)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :] > 0, scores,
                               jnp.finfo(scores.dtype).min)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        out = nn.Dense(d, name="fc")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(out + x)


class LegacyFFTBlock(nn.Module):
    """ref Layers.py:12 FFTBlock: LegacyMHA then conv-(k,1) FFN (post-LN),
    masked fill after each sublayer."""

    channels: int
    num_heads: int
    ffn_hidden: int
    kernel_size: int = 9
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        x = LegacyMHA(self.channels, self.num_heads, self.dropout,
                      name="slf_attn")(x, mask, deterministic)
        if mask is not None:
            x = x * mask[..., None]
        res = x
        h = nn.Conv(self.ffn_hidden, (self.kernel_size,), padding="SAME",
                    name="w_1")(x)
        h = nn.Conv(self.channels, (1,), name="w_2")(jax.nn.relu(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="ffn_ln")(h + res)
        if mask is not None:
            x = x * mask[..., None]
        return x


class VariancePredictor(nn.Module):
    """ref fs2.py:270 — conv-ReLU-LN-dropout ×2 + linear, output masked."""

    hidden: int
    kernel_size: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        x = nn.Conv(self.hidden, (self.kernel_size,), padding="SAME",
                    name="conv1d_1")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm_1")(jax.nn.relu(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        # ref hardcodes conv1d_2 padding=1 (== SAME only for k=3)
        x = nn.Conv(self.hidden, (self.kernel_size,), padding=[(1, 1)],
                    name="conv1d_2")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm_2")(jax.nn.relu(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        out = nn.Dense(1, name="linear_layer")(x)[..., 0]
        if mask is not None:
            out = out * mask
        return out


def _default_bins(lo, hi, n, quantization):
    if quantization == "log":
        return np.exp(np.linspace(np.log(max(lo, 1e-5)), np.log(hi), n - 1))
    return np.linspace(lo, hi, n - 1)


class VarianceAdaptor(nn.Module):
    """ref fs2.py:53 — duration/pitch/energy predictors, bucketize on
    stored bin boundaries, phoneme-/frame-level embedding addition,
    length regulation."""

    cfg: FastSpeech2Config

    @nn.compact
    def __call__(self, x, phone_mask, durations=None, pitch=None, energy=None,
                 d_control=1.0, p_control=1.0, e_control=1.0,
                 deterministic=True):
        c = self.cfg
        vp = lambda name: VariancePredictor(
            c.variance_hidden, c.variance_kernel, name=name)
        pitch_bins = self.param(
            "pitch_bins",
            lambda k: jnp.asarray(_default_bins(
                c.pitch_min, c.pitch_max, c.pitch_bins,
                c.pitch_quantization), jnp.float32))
        energy_bins = self.param(
            "energy_bins",
            lambda k: jnp.asarray(_default_bins(
                c.energy_min, c.energy_max, c.energy_bins,
                c.energy_quantization), jnp.float32))
        p_emb = nn.Embed(c.pitch_bins, c.hidden, name="pitch_embedding")
        e_emb = nn.Embed(c.energy_bins, c.hidden, name="energy_embedding")

        log_d_pred = vp("duration_predictor")(x, phone_mask, deterministic)

        def add_pitch(h, mask):
            pred = vp("pitch_predictor")(h, mask, deterministic)
            tgt = pitch if pitch is not None else pred * p_control
            return pred, h + p_emb(jnp.searchsorted(pitch_bins, tgt))

        def add_energy(h, mask):
            pred = vp("energy_predictor")(h, mask, deterministic)
            tgt = energy if energy is not None else pred * e_control
            return pred, h + e_emb(jnp.searchsorted(energy_bins, tgt))

        pitch_pred = energy_pred = None
        if c.pitch_level == "phoneme":
            pitch_pred, x = add_pitch(x, phone_mask)
        if c.energy_level == "phoneme":
            energy_pred, x = add_energy(x, phone_mask)

        if durations is None:
            durations = jnp.maximum(jnp.round(
                (jnp.exp(log_d_pred) - 1.0) * d_control), 0.0).astype(jnp.int32)
            durations = durations * phone_mask.astype(jnp.int32)
        x, frame_mask = length_regulate(x, durations, c.max_frames)
        fmask = frame_mask.astype(jnp.float32)

        if c.pitch_level == "frame":
            pitch_pred, x = add_pitch(x, fmask)
        if c.energy_level == "frame":
            energy_pred, x = add_energy(x, fmask)

        return x, fmask, {
            "log_duration_pred": log_d_pred,
            "pitch_pred": pitch_pred,
            "energy_pred": energy_pred,
        }


class Postnet(nn.Module):
    """ref Layers.py:68 PostNet: five k5 convs; BatchNorm1d represented as
    per-channel affine (eval-equivalent; converters fold running stats)."""

    n_mel: int
    hidden: int = 512

    @nn.compact
    def __call__(self, mel, deterministic=True):
        def bn(name, h):
            scale = self.param(f"{name}_scale", nn.initializers.ones,
                               (h.shape[-1],))
            bias = self.param(f"{name}_bias", nn.initializers.zeros,
                              (h.shape[-1],))
            return h * scale + bias

        x = mel
        for i in range(4):
            x = nn.Conv(self.hidden, (5,), padding="SAME", use_bias=False,
                        name=f"conv_{i}")(x)
            x = jnp.tanh(bn(f"bn_{i}", x))
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
        x = nn.Conv(self.n_mel, (5,), padding="SAME", use_bias=False,
                    name="conv_4")(x)
        x = bn("bn_4", x)
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
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
            x = LegacyFFTBlock(c.hidden, c.n_heads, c.ffn_hidden,
                               c.kernel_size, c.dropout,
                               name=f"enc_{i}")(x, phone_mask, deterministic)
        if c.n_speakers > 1 and sid is not None:
            x = x + nn.Embed(c.n_speakers, c.hidden, name="spk")(sid)[:, None, :]

        x, fmask, var = VarianceAdaptor(c, name="variance")(
            x, phone_mask, durations, pitch, energy, d_control,
            deterministic=deterministic
        )
        pos_d = jnp.asarray(sinusoidal_positions(x.shape[1], c.hidden))
        x = x + pos_d[None]
        for i in range(c.n_dec_layers):
            x = LegacyFFTBlock(c.hidden, c.n_heads, c.ffn_hidden,
                               c.kernel_size, c.dropout,
                               name=f"dec_{i}")(x, fmask, deterministic)
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
