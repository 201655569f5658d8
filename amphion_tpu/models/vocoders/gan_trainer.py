"""GAN vocoder training: combined discriminator + jitted D/G alternating step.

Mirrors the reference's training behavior (reference:
`models/vocoders/gan/gan_vocoder_trainer.py:76-530` — joint G/D optimizers,
discriminator step then generator step, feature/mel/adversarial criteria) as a
single pure `train_step(gstate, dstate, batch) -> (gstate, dstate, metrics)`
function: both updates trace into ONE XLA program, so the whole optimization
step — two forwards, two backwards, two optimizer updates, LSGAN + feature +
mel losses — runs fused on the TPU with grad sync as implicit psum over the
'data' mesh axis when the batch is sharded.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from amphion_tpu.models.vocoders.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    MultiScaleDiscriminator,
)
from amphion_tpu.models.vocoders.losses import (
    discriminator_loss,
    feature_loss,
    generator_adv_loss,
    mel_loss,
)
from amphion_tpu.ops.mel import MelConfig
from amphion_tpu.runtime.train_state import TrainState, create_train_state


class CombinedDiscriminator(nn.Module):
    """Runs the configured discriminator set, concatenating logits/fmaps.

    The reference keeps a dict of separate discriminators with one shared
    optimizer (`gan_vocoder_trainer.py:150-185`); here they are one module so
    a single params tree / optimizer state flows through the jitted step.
    """

    use: tuple[str, ...] = ("mpd", "msd")
    mpd_periods: tuple[int, ...] = (2, 3, 5, 7, 11)
    msd_scales: int = 3
    channel_mult: float = 1.0
    mrd_resolutions: tuple[tuple[int, int, int], ...] = (
        (1024, 120, 600),
        (2048, 240, 1200),
        (512, 50, 240),
    )
    sample_rate: int = 24000  # mssbcqt scales

    @nn.compact
    def __call__(self, x: jax.Array):
        logits, fmaps = [], []
        if "mpd" in self.use:
            lo, fm = MultiPeriodDiscriminator(self.mpd_periods, self.channel_mult)(x)
            logits += lo
            fmaps += fm
        if "msd" in self.use:
            lo, fm = MultiScaleDiscriminator(self.msd_scales, self.channel_mult)(x)
            logits += lo
            fmaps += fm
        if "mrd" in self.use:
            lo, fm = MultiResolutionDiscriminator(self.mrd_resolutions)(x)
            logits += lo
            fmaps += fm
        if "msstft" in self.use:
            from amphion_tpu.models.vocoders.discriminators import (
                MultiSTFTDiscriminator,
            )

            lo, fm = MultiSTFTDiscriminator()(x)
            logits += lo
            fmaps += fm
        if "mssbcqt" in self.use:
            from amphion_tpu.models.vocoders.discriminators import (
                MultiScaleSubBandCQTDiscriminator,
            )

            lo, fm = MultiScaleSubBandCQTDiscriminator(self.sample_rate)(x)
            logits += lo
            fmaps += fm
        return logits, fmaps


@dataclass(frozen=True)
class GANTrainConfig:
    lr: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999  # per-epoch exponential decay (ref config)
    decay_steps: int = 1000  # steps per decay application
    mel_loss_weight: float = 45.0
    grad_clip: float | None = None
    # mixed precision: run G/D forward+backward in this dtype (params and
    # optimizer state stay f32; the mel-loss STFT and all loss math stay
    # f32). bf16 needs no loss scaling on TPU. "float32" = off.
    compute_dtype: str = "float32"


def make_optimizer(cfg: GANTrainConfig) -> optax.GradientTransformation:
    sched = optax.exponential_decay(
        cfg.lr, transition_steps=cfg.decay_steps, decay_rate=cfg.lr_decay
    )
    tx = optax.adamw(sched, b1=cfg.adam_b1, b2=cfg.adam_b2)
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def create_gan_states(
    generator: nn.Module,
    discriminator: nn.Module,
    rng: jax.Array,
    example_mel: jax.Array,
    example_audio: jax.Array,
    cfg: GANTrainConfig = GANTrainConfig(),
) -> tuple[TrainState, TrainState]:
    g_rng, d_rng = jax.random.split(rng)
    gstate = create_train_state(generator, g_rng, example_mel, make_optimizer(cfg))
    dstate = create_train_state(discriminator, d_rng, example_audio, make_optimizer(cfg))
    return gstate, dstate


def make_gan_train_step(
    mel_cfg: MelConfig,
    train_cfg: GANTrainConfig = GANTrainConfig(),
    gen_args: tuple[str, ...] = ("mel",),
    use_rng: bool = False,
):
    """Build the jitted (gstate, dstate, batch) -> (gstate, dstate, metrics) step.

    batch: {"audio": (B, N*hop)} plus the generator's conditioning keys
    (``gen_args``, default just "mel"; NSF adds "f0"). ``use_rng`` threads a
    fresh key into the generator (NSF sine-excitation noise)."""

    dt = jnp.dtype(train_cfg.compute_dtype)

    def _cast(tree):
        if dt == jnp.float32:
            return tree
        return jax.tree_util.tree_map(
            lambda p: p.astype(dt) if (hasattr(p, "dtype")
                                       and p.dtype == jnp.float32) else p,
            tree)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(gstate: TrainState, dstate: TrainState, batch):
        audio = batch["audio"]
        rng = gstate.rng
        extra = ()
        if use_rng:
            rng, sub = jax.random.split(rng)
            extra = (sub,)
        inputs = _cast(tuple(batch[k] for k in gen_args)) + extra
        audio_c = _cast(audio)

        # --- discriminator update (generator frozen) ---
        fake = gstate.apply_fn({"params": _cast(gstate.params)}, *inputs)
        fake = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            logits_r, _ = dstate.apply_fn({"params": _cast(d_params)},
                                          audio_c)
            logits_f, _ = dstate.apply_fn({"params": _cast(d_params)}, fake)
            loss, _, _ = discriminator_loss(
                [l.astype(jnp.float32) for l in logits_r],
                [l.astype(jnp.float32) for l in logits_f])
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dstate.params)
        dstate = dstate.apply_gradients(d_grads)

        # --- generator update (discriminator frozen) ---
        d_params_c = _cast(dstate.params)

        def g_loss_fn(g_params):
            fake_g = gstate.apply_fn({"params": _cast(g_params)}, *inputs)
            logits_r, fmaps_r = dstate.apply_fn({"params": d_params_c},
                                                audio_c)
            logits_f, fmaps_f = dstate.apply_fn({"params": d_params_c},
                                                fake_g)
            adv = generator_adv_loss(
                [l.astype(jnp.float32) for l in logits_f])
            fm = feature_loss(
                [[f.astype(jnp.float32) for f in fs] for fs in fmaps_r],
                [[f.astype(jnp.float32) for f in fs] for fs in fmaps_f])
            # mel-loss STFT in f32 regardless of compute dtype
            ml = mel_loss(audio, fake_g.astype(jnp.float32), mel_cfg,
                          train_cfg.mel_loss_weight)
            total = adv + fm + ml
            return total, {"g_adv": adv, "g_fm": fm, "g_mel": ml}

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            gstate.params
        )
        gstate = gstate.apply_gradients(g_grads).replace(rng=rng)

        metrics = {"d_loss": d_loss, "g_loss": g_loss, **aux}
        return gstate, dstate, metrics

    return train_step
