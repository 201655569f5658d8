"""JETS: jointly-trained FastSpeech2 + HiFi-GAN with internal alignment.

Faithful to the reference (`models/tts/jets/jets.py:391`): legacy FFT
Encoder/Decoder (`modules/transformer/Models.py` — the same blocks as our
FastSpeech2, oracle-verified), internal `AlignmentModule`
(`alignments.py`: learned soft alignment + Viterbi hard durations +
forward-sum/bin losses), per-token averaged pitch/energy, HiFi-GAN
generator over the 256-d decoder features, JETS-specific MPD/MSD
adversaries (`mpd.py:273/msd.py:91`).

Reference quirks preserved:
* the training forward passes the duration-averaged RAW pitch/energy
  scalars as the adaptor's "embeddings" (`jets.py:522-544`: ps/es →
  ``x = x + pitch_embedding``), broadcasting a scalar per token — the
  conv `pitch_embed`/`energy_embed` modules are only used at inference
  (`jets.py:603-606`), and the bucketized embedding tables are never
  used;
* pitch/energy are predicted from the conditioned sequence
  (`VarianceAdaptor.forward`, `jets.py:185-207`), duration from the
  unconditioned encoder output;
* inference applies no p/e control and embeds raw predictions through
  the conv embeds (`jets.py:592-615`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.tts.fastspeech2.fs2 import (
    FastSpeech2Config,
    LegacyFFTBlock,
    VariancePredictor,
)
from amphion_tpu.models.tts.jets.alignments import (
    AlignmentModule,
    average_by_duration,
    forward_sum_loss,
    viterbi_decode,
)
from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig, HiFiGANGenerator
from amphion_tpu.modules.duration import length_regulate
from amphion_tpu.modules.transformer import sinusoidal_positions


@dataclass(frozen=True)
class JetsConfig:
    fs2: FastSpeech2Config = field(default_factory=FastSpeech2Config)
    decoder: HiFiGANConfig = field(
        default_factory=lambda: HiFiGANConfig(n_mel=256)
    )
    embed_kernel: int = 9  # pitch/energy conv embeds (ref jets.py:424-448)
    embed_dropout: float = 0.5


class Jets(nn.Module):
    cfg: JetsConfig

    def setup(self):
        c = self.cfg.fs2
        self.alignment_module = AlignmentModule(
            adim=c.hidden, odim=c.n_mel, name="alignment_module")
        self.decoder = HiFiGANGenerator(self.cfg.decoder)
        self.phone_embed = nn.Embed(c.num_phones, c.hidden)
        self.enc_blocks = [
            LegacyFFTBlock(c.hidden, c.n_heads, c.ffn_hidden, c.kernel_size,
                           c.dropout, name=f"enc_{i}")
            for i in range(c.n_enc_layers)
        ]
        self.dec_blocks = [
            LegacyFFTBlock(c.hidden, c.n_heads, c.ffn_hidden, c.kernel_size,
                           c.dropout, name=f"dec_{i}")
            for i in range(c.n_dec_layers)
        ]
        self.duration_predictor = VariancePredictor(
            c.variance_hidden, c.variance_kernel, name="duration_predictor")
        self.pitch_predictor = VariancePredictor(
            c.variance_hidden, c.variance_kernel, name="pitch_predictor")
        self.energy_predictor = VariancePredictor(
            c.variance_hidden, c.variance_kernel, name="energy_predictor")
        k = self.cfg.embed_kernel
        self.pitch_embed = nn.Conv(
            c.hidden, (k,), padding=(((k - 1) // 2, (k - 1) // 2),),
            name="pitch_embed")
        self.energy_embed = nn.Conv(
            c.hidden, (k,), padding=(((k - 1) // 2, (k - 1) // 2),),
            name="energy_embed")
        if c.n_speakers > 1:
            self.speaker_emb = nn.Embed(c.n_speakers, c.hidden, name="spk")

    def encode_text(self, phones, phone_mask, sid=None, deterministic=True):
        c = self.cfg.fs2
        x = self.phone_embed(phones)
        x = x + jnp.asarray(sinusoidal_positions(phones.shape[1], c.hidden))[None]
        for blk in self.enc_blocks:
            x = blk(x, phone_mask, deterministic)
        if c.n_speakers > 1 and sid is not None:
            x = x + self.speaker_emb(sid)[:, None, :]
        return x

    def _decode(self, x, fmask, deterministic):
        c = self.cfg.fs2
        x = x + jnp.asarray(sinusoidal_positions(x.shape[1], c.hidden))[None]
        for blk in self.dec_blocks:
            x = blk(x, fmask, deterministic)
        return self.decoder(x), fmask

    def train_forward(self, phones, phone_mask, mel, mel_mask, pitch, energy,
                      sid=None, deterministic=True):
        """Returns waveform over all frames + auxiliary losses dict.

        Alignment learning per the reference (`jets.py:508-517`): soft
        log_p_attn → Viterbi hard durations + binarization loss +
        forward-sum loss; frame-level pitch/energy targets are averaged
        per token (`average_by_duration`), then added as raw scalars
        (the reference's pitch_embedding=ps quirk, jets.py:522-544).
        """
        c = self.cfg.fs2
        h = self.encode_text(phones, phone_mask, sid, deterministic)
        log_p_attn = self.alignment_module(h, mel, phone_mask, mel_mask)
        durations, bin_loss = viterbi_decode(log_p_attn, phone_mask, mel_mask)
        fsum_loss = forward_sum_loss(log_p_attn, phone_mask, mel_mask)
        t_mel = mel.shape[1]
        pitch_tok = average_by_duration(durations, pitch[:, :t_mel],
                                        phone_mask, mel_mask)
        energy_tok = average_by_duration(durations, energy[:, :t_mel],
                                         phone_mask, mel_mask)
        # the reference computes (and discards) the conv embeds at train
        # (jets.py:518-519) — kept so the params exist for inference
        _ = self.pitch_embed(pitch_tok[..., None])
        _ = self.energy_embed(energy_tok[..., None])
        # duration predicted from the unconditioned encoder output
        # (ref VarianceAdaptor.forward, jets.py:198)
        log_d_pred = self.duration_predictor(h, phone_mask,
                                             deterministic=deterministic)
        x = h + pitch_tok[..., None] + energy_tok[..., None]
        pitch_pred = self.pitch_predictor(x, phone_mask,
                                          deterministic=deterministic)
        energy_pred = self.energy_predictor(x, phone_mask,
                                            deterministic=deterministic)
        x, fmask = length_regulate(x, durations, c.max_frames)
        wav, fmask = self._decode(x, fmask, deterministic)
        log_d_tgt = jnp.log(durations.astype(jnp.float32) + 1.0)
        dur_loss = jnp.sum(
            ((log_d_pred - log_d_tgt) ** 2) * phone_mask
        ) / jnp.maximum(jnp.sum(phone_mask), 1.0)
        return wav, fmask, {
            "align_loss": fsum_loss + bin_loss,
            "forwardsum_loss": fsum_loss,
            "bin_loss": bin_loss,
            "dur_loss": dur_loss,
            "pitch_pred": pitch_pred,
            "energy_pred": energy_pred,
            "pitch_tgt": pitch_tok,
            "energy_tgt": energy_tok,
            "durations": durations,
        }

    def infer(self, phones, phone_mask, sid=None, d_control=1.0,
              deterministic=True):
        """ref `Jets.inference` (jets.py:573-620): predict p/e/d from the
        encoder output, embed raw p/e predictions through the conv
        embeds, length-regulate with exp(d)-1 rounding, decode."""
        c = self.cfg.fs2
        h = self.encode_text(phones, phone_mask, sid, deterministic)
        p_outs = self.pitch_predictor(h, phone_mask,
                                      deterministic=deterministic)
        e_outs = self.energy_predictor(h, phone_mask,
                                       deterministic=deterministic)
        d_outs = self.duration_predictor(h, phone_mask,
                                         deterministic=deterministic)
        h = h + self.energy_embed(e_outs[..., None]) + self.pitch_embed(
            p_outs[..., None])
        d = jnp.maximum(jnp.round(jnp.exp(d_outs) - 1.0) * d_control, 0.0)
        d = (d * phone_mask).astype(jnp.int32)
        x, fmask = length_regulate(h, d, c.max_frames)
        return self._decode(x, fmask, deterministic)
