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
from amphion_tpu.models.tts.jets.alignments import (
    AlignmentModule,
    average_by_duration,
    forward_sum_loss,
    viterbi_decode,
)
from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig, HiFiGANGenerator
from amphion_tpu.modules.transformer import FFTBlock, sinusoidal_positions


@dataclass(frozen=True)
class JetsConfig:
    fs2: FastSpeech2Config = field(default_factory=FastSpeech2Config)
    decoder: HiFiGANConfig = field(
        default_factory=lambda: HiFiGANConfig(n_mel=256)
    )


class Jets(nn.Module):
    cfg: JetsConfig

    def setup(self):
        c = self.cfg.fs2
        self.alignment_module = AlignmentModule(
            adim=c.hidden, odim=c.n_mel, name="alignment_module")
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
        """Returns waveform over all frames + auxiliary losses dict.

        Alignment learning per the reference (`jets.py:508-517`): soft
        log_p_attn → Viterbi hard durations + binarization loss +
        forward-sum loss; frame-level pitch/energy targets are averaged
        per token (`average_by_duration`) before the variance adaptor.
        """
        c = self.cfg.fs2
        h = self.encode_text(phones, phone_mask, deterministic)
        log_p_attn = self.alignment_module(h, mel, phone_mask, mel_mask)
        durations, bin_loss = viterbi_decode(log_p_attn, phone_mask, mel_mask)
        fsum_loss = forward_sum_loss(log_p_attn, phone_mask, mel_mask)
        t_mel = mel.shape[1]
        pitch_tok = average_by_duration(durations, pitch[:, :t_mel],
                                        phone_mask, mel_mask)
        energy_tok = average_by_duration(durations, energy[:, :t_mel],
                                         phone_mask, mel_mask)
        x, fmask, var = self.variance(
            h, phone_mask, durations, pitch_tok, energy_tok,
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
            "align_loss": fsum_loss + bin_loss,
            "forwardsum_loss": fsum_loss,
            "bin_loss": bin_loss,
            "dur_loss": dur_loss,
            "pitch_pred": var["pitch_pred"],
            "energy_pred": var["energy_pred"],
            "pitch_tgt": pitch_tok,
            "energy_tgt": energy_tok,
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
