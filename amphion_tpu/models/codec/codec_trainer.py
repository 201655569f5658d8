"""Codec training: reconstruction + VQ + adversarial criteria, fused G/D step.

Mirrors the reference codec trainers' behavior (reference:
`models/codec/facodec/facodec_trainer.py`, `models/codec/coco/
rep_coco_trainer.py` — generator + discriminator dict with joint optimizers,
multi-scale mel + waveform reconstruction, commitment losses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from amphion_tpu.models.codec.amphion_codec import AmphionCodec
from amphion_tpu.models.vocoders.gan_trainer import GANTrainConfig, make_optimizer
from amphion_tpu.models.vocoders.losses import (
    discriminator_loss,
    feature_loss,
    generator_adv_loss,
)
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.runtime.train_state import TrainState, create_train_state


def multiscale_mel_loss(real, fake, sample_rate: int, n_ffts=(512, 1024, 2048)):
    """L1 over log-mels at several resolutions (Encodec/DAC-style)."""
    loss = 0.0
    n_ffts = [n for n in n_ffts if n <= real.shape[-1]] or [
        max(32, 2 ** (real.shape[-1].bit_length() - 2))
    ]
    for n_fft in n_ffts:
        cfg = MelConfig(
            sample_rate=sample_rate, n_fft=n_fft, win_size=n_fft,
            hop_size=n_fft // 4, n_mel=64, fmax=sample_rate / 2,
        )
        t = real.shape[-1] // cfg.hop_size * cfg.hop_size
        loss = loss + jnp.mean(
            jnp.abs(mel_spectrogram(real[..., :t], cfg) - mel_spectrogram(fake[..., :t], cfg))
        )
    return loss / len(n_ffts)


def create_codec_states(
    codec: AmphionCodec, discriminator, rng, example_audio,
    train_cfg: GANTrainConfig = GANTrainConfig(lr=1e-4),
):
    g_rng, d_rng, q_rng = jax.random.split(rng, 3)
    tx = make_optimizer(train_cfg)
    variables = codec.init(g_rng, example_audio, train=True, rng=q_rng)
    gstate = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        rng=q_rng,
        apply_fn=codec.apply,
        tx=tx,
    )
    dstate = create_train_state(discriminator, d_rng, example_audio, tx)
    return gstate, dstate


def make_codec_train_step(
    codec: AmphionCodec,
    train_cfg: GANTrainConfig = GANTrainConfig(lr=1e-4),
    mel_weight: float = 15.0,
    wav_weight: float = 1.0,
    adv_weight: float = 1.0,
):
    sr = codec.cfg.sample_rate

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(gstate: TrainState, dstate: TrainState, batch):
        audio = batch["audio"]
        rng, q_rng = jax.random.split(gstate.rng)

        recon0, _, _ = codec.apply({"params": gstate.params}, audio, True, q_rng)
        fake0 = jax.lax.stop_gradient(recon0)

        def d_loss_fn(d_params):
            lr_, _ = dstate.apply_fn({"params": d_params}, audio)
            lf_, _ = dstate.apply_fn({"params": d_params}, fake0)
            loss, _, _ = discriminator_loss(lr_, lf_)
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dstate.params)
        dstate = dstate.apply_gradients(d_grads)

        def g_loss_fn(g_params):
            recon, codes, vq_losses = codec.apply(
                {"params": g_params}, audio, True, q_rng
            )
            lr_, fr_ = dstate.apply_fn({"params": dstate.params}, audio)
            lf_, ff_ = dstate.apply_fn({"params": dstate.params}, recon)
            adv = adv_weight * generator_adv_loss(lf_)
            fm = feature_loss(fr_, ff_)
            ml = mel_weight * multiscale_mel_loss(audio, recon, sr)
            wl = wav_weight * jnp.mean(jnp.abs(audio - recon))
            vq = sum(vq_losses.values())
            total = adv + fm + ml + wl + vq
            return total, {"g_adv": adv, "g_fm": fm, "g_mel": ml, "g_wav": wl,
                           "g_vq": vq}

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            gstate.params
        )
        gstate = gstate.apply_gradients(g_grads).replace(rng=rng)
        return gstate, dstate, {"d_loss": d_loss, "g_loss": g_loss, **aux}

    return train_step
