"""VITS training: fused G/D step with VAE + flow + adversarial criteria.

Mirrors the reference trainer behavior (reference:
`models/tts/vits/vits_trainer.py` — G and D optimizers, mel L1 * 45, KL,
duration, adversarial + feature-matching losses) as one jitted program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from amphion_tpu.models.tts.vits.vits import (
    VITS,
    slice_audio_segments,
    vits_kl_loss,
)
from amphion_tpu.models.vocoders.gan_trainer import GANTrainConfig, make_optimizer
from amphion_tpu.models.vocoders.losses import (
    discriminator_loss,
    feature_loss,
    generator_adv_loss,
    mel_loss,
)
from amphion_tpu.ops.mel import MelConfig
from amphion_tpu.runtime.train_state import TrainState, create_train_state


def create_vits_states(
    model: VITS,
    discriminator,
    rng: jax.Array,
    example_batch: dict,
    train_cfg: GANTrainConfig = GANTrainConfig(),
):
    g_rng, d_rng, f_rng = jax.random.split(rng, 3)
    g_params = model.init(
        g_rng,
        example_batch["phones"],
        example_batch["phone_mask"],
        example_batch["spec"],
        example_batch["spec_mask"],
        f_rng,
        example_batch.get("sid"),
        method=VITS.train_forward,
    )["params"]
    gstate = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=g_params,
        opt_state=make_optimizer(train_cfg).init(g_params),
        rng=f_rng,
        apply_fn=model.apply,
        tx=make_optimizer(train_cfg),
    )
    hop = model.cfg.decoder.hop_size
    seg_audio = example_batch["audio"][:, : model.cfg.segment_size * hop]
    dstate = create_train_state(
        discriminator, d_rng, seg_audio, make_optimizer(train_cfg)
    )
    return gstate, dstate


def make_vits_train_step(
    model: VITS,
    mel_cfg: MelConfig,
    train_cfg: GANTrainConfig = GANTrainConfig(),
    kl_weight: float = 1.0,
    dur_weight: float = 1.0,
):
    hop = model.cfg.decoder.hop_size
    seg = model.cfg.segment_size

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(gstate: TrainState, dstate: TrainState, batch):
        rng, step_rng = jax.random.split(gstate.rng)

        def forward(params):
            return model.apply(
                {"params": params},
                batch["phones"], batch["phone_mask"],
                batch["spec"], batch["spec_mask"],
                step_rng, batch.get("sid"),
                method=VITS.train_forward,
            )

        out0 = forward(gstate.params)
        real_seg = slice_audio_segments(batch["audio"], out0["segment_start"], seg, hop)
        fake_seg0 = jax.lax.stop_gradient(out0["wav_segment"])

        def d_loss_fn(d_params):
            lr, _ = dstate.apply_fn({"params": d_params}, real_seg)
            lf, _ = dstate.apply_fn({"params": d_params}, fake_seg0)
            loss, _, _ = discriminator_loss(lr, lf)
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dstate.params)
        dstate = dstate.apply_gradients(d_grads)

        def g_loss_fn(g_params):
            out = forward(g_params)
            fake_seg = out["wav_segment"]
            lr, fr = dstate.apply_fn({"params": dstate.params}, real_seg)
            lf, ff = dstate.apply_fn({"params": dstate.params}, fake_seg)
            adv = generator_adv_loss(lf)
            fm = feature_loss(fr, ff)
            ml = mel_loss(real_seg, fake_seg, mel_cfg, train_cfg.mel_loss_weight)
            kl = kl_weight * vits_kl_loss(
                out["z_p"], out["logs_q"], out["m_p"], out["logs_p"],
                batch["spec_mask"],
            )
            dur = dur_weight * jnp.mean(out["l_length"])
            total = adv + fm + ml + kl + dur
            return total, {"g_adv": adv, "g_fm": fm, "g_mel": ml, "g_kl": kl,
                           "g_dur": dur}

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            gstate.params
        )
        gstate = gstate.apply_gradients(g_grads).replace(rng=rng)
        return gstate, dstate, {"d_loss": d_loss, "g_loss": g_loss, **aux}

    return train_step
