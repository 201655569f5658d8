"""JETS: jointly-trained FastSpeech2 + HiFi-GAN with internal alignment.

Same capability as the reference (reference: `models/tts/jets/jets.py:391`
— FS2 text encoder + `VarianceAdaptor` `jets.py:63`, internal alignment
module `alignments.py` (learned soft alignment + MAS hard alignment +
forward-sum loss), HiFi-GAN decoder with JETS-specific MPD/MSD
`mpd.py:273/msd.py:91`, GAN losses `jets_loss.py`): end-to-end text→wave
without external MFA durations.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.tts.fastspeech2.fs2 import VarianceAdaptor, FastSpeech2Config
from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig, HiFiGANGenerator
from amphion_tpu.modules.transformer import FFTBlock, sinusoidal_positions
from amphion_tpu.ops.mas import maximum_path


@dataclass(frozen=True)
class JetsConfig:
    fs2: FastSpeech2Config = field(default_factory=FastSpeech2Config)
    decoder: HiFiGANConfig = field(
        default_factory=lambda: HiFiGANConfig(n_mel=256)
    )
    align_temperature: float = 0.0005


class AlignmentModule(nn.Module):
    """Learned text–mel alignment (ref `alignments.py`): project both
    streams, Gaussian log-likelihood lattice, MAS hard path."""

    dim: int = 256

    @nn.compact
    def __call__(self, h_text, text_mask, mel, mel_mask, temperature):
        q = nn.Dense(self.dim, name="text_proj")(h_text)  # (B, L, D)
        k = nn.Dense(self.dim, name="mel_proj")(mel)  # (B, T, D)
        # negative squared distance log-lattice
        dist = (
            jnp.sum(q**2, -1)[:, :, None]
            - 2.0 * jnp.einsum("bld,btd->blt", q, k)
            + jnp.sum(k**2, -1)[:, None, :]
        )
        log_p = -temperature * dist  # (B, L, T)
        attn_mask = text_mask[:, :, None] * mel_mask[:, None, :]
        hard = jax.lax.stop_gradient(maximum_path(log_p, attn_mask))
        # forward-sum style soft loss: maximize log_p along the hard path
        denom = jnp.maximum(jnp.sum(attn_mask), 1.0)
        align_loss = -jnp.sum(jax.nn.log_softmax(log_p, axis=1) * hard) / denom
        durations = jnp.sum(hard, axis=-1)  # (B, L)
        return durations.astype(jnp.int32), align_loss


class Jets(nn.Module):
    cfg: JetsConfig

    def setup(self):
        c = self.cfg.fs2
        self.aligner = AlignmentModule(c.hidden)
        self.variance = VarianceAdaptor(c)
        self.decoder = HiFiGANGenerator(self.cfg.decoder)
        self.phone_embed = nn.Embed(c.num_phones, c.hidden)
        self.enc_blocks = [
            FFTBlock(c.hidden, c.n_heads, c.ffn_hidden, c.kernel_size,
                     c.dropout, name=f"enc_{i}")
            for i in range(c.n_enc_layers)
        ]
        self.dec_blocks = [
            FFTBlock(c.hidden, c.n_heads, c.ffn_hidden, c.kernel_size,
                     c.dropout, name=f"dec_{i}")
            for i in range(c.n_dec_layers)
        ]

    def encode_text(self, phones, phone_mask, deterministic=True):
        c = self.cfg.fs2
        x = self.phone_embed(phones)
        x = x + jnp.asarray(sinusoidal_positions(phones.shape[1], c.hidden))[None]
        for blk in self.enc_blocks:
            x = blk(x, phone_mask, deterministic)
        return x

    def train_forward(self, phones, phone_mask, mel, mel_mask, pitch, energy,
                      deterministic=True):
        """Returns waveform over all frames + auxiliary losses dict."""
        c = self.cfg.fs2
        h = self.encode_text(phones, phone_mask, deterministic)
        durations, align_loss = self.aligner(
            h, phone_mask, mel, mel_mask, self.cfg.align_temperature
        )
        x, fmask, var = self.variance(
            h, phone_mask, durations, pitch, energy,
            deterministic=deterministic,
        )
        x = x + jnp.asarray(sinusoidal_positions(c.max_frames, c.hidden))[None]
        for blk in self.dec_blocks:
            x = blk(x, fmask, deterministic)
        wav = self.decoder(x)
        log_d_tgt = jnp.log(durations.astype(jnp.float32) + 1.0)
        dur_loss = jnp.sum(
            ((var["log_duration_pred"] - log_d_tgt) ** 2) * phone_mask
        ) / jnp.maximum(jnp.sum(phone_mask), 1.0)
        return wav, fmask, {
            "align_loss": align_loss,
            "dur_loss": dur_loss,
            "pitch_pred": var["pitch_pred"],
            "energy_pred": var["energy_pred"],
            "durations": durations,
        }

    def infer(self, phones, phone_mask, deterministic=True):
        c = self.cfg.fs2
        h = self.encode_text(phones, phone_mask, deterministic)
        x, fmask, _ = self.variance(h, phone_mask, None, None, None,
                                    deterministic=deterministic)
        x = x + jnp.asarray(sinusoidal_positions(c.max_frames, c.hidden))[None]
        for blk in self.dec_blocks:
            x = blk(x, fmask, deterministic)
        return self.decoder(x), fmask
