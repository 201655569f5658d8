import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.models.vocoders.gan_trainer import (
    CombinedDiscriminator,
    GANTrainConfig,
    create_gan_states,
    make_gan_train_step,
)
from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig, HiFiGANGenerator
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.parallel.mesh import build_mesh, shard_batch

TINY = HiFiGANConfig(
    resblock="2",
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    n_mel=16,
)
TINY_MEL = MelConfig(sample_rate=8000, n_fft=64, win_size=32, hop_size=8, n_mel=16, fmax=4000)


def _batch(rng, b=2, frames=32):
    hop = TINY.hop_size
    audio = (rng.standard_normal((b, frames * hop)) * 0.2).astype(np.float32)
    mel = np.asarray(mel_spectrogram(jnp.asarray(audio), TINY_MEL)).transpose(0, 2, 1)
    return {"mel": jnp.asarray(mel), "audio": jnp.asarray(audio)}


def test_generator_shape(rng):
    gen = HiFiGANGenerator(TINY)
    mel = jnp.zeros((2, 16, TINY.n_mel))
    params = gen.init(jax.random.key(0), mel)["params"]
    audio = gen.apply({"params": params}, mel)
    assert audio.shape == (2, 16 * TINY.hop_size)
    assert np.abs(np.asarray(audio)).max() <= 1.0


TINY_DISC = dict(
    use=("mpd", "msd"), mpd_periods=(2, 3), msd_scales=1, channel_mult=0.0625
)


def test_gan_train_step_decreases_mel_loss(rng):
    gen = HiFiGANGenerator(TINY)
    disc = CombinedDiscriminator(**TINY_DISC)
    batch = _batch(rng)
    gstate, dstate = create_gan_states(
        gen, disc, jax.random.key(0), batch["mel"], batch["audio"],
        GANTrainConfig(lr=1e-3),
    )
    step = make_gan_train_step(TINY_MEL)
    first = None
    for i in range(10):
        gstate, dstate, metrics = step(gstate, dstate, batch)
        if i == 0:
            first = float(metrics["g_mel"])
            for v in metrics.values():
                assert np.isfinite(float(v))
    assert float(metrics["g_mel"]) < first
    assert int(gstate.step) == 10


def test_gan_train_step_data_parallel(rng):
    mesh = build_mesh()
    gen = HiFiGANGenerator(TINY)
    disc = CombinedDiscriminator(use=("mpd",), mpd_periods=(2,), channel_mult=0.0625)
    batch = _batch(rng, b=8)
    gstate, dstate = create_gan_states(
        gen, disc, jax.random.key(0), batch["mel"][:1], batch["audio"][:1]
    )
    step = make_gan_train_step(TINY_MEL)
    sharded = shard_batch(mesh, {k: np.asarray(v) for k, v in batch.items()})
    gstate, dstate, metrics = step(gstate, dstate, sharded)
    for v in metrics.values():
        assert np.isfinite(float(v))


def test_mrd_discriminator(rng):
    from amphion_tpu.models.vocoders.discriminators import MultiResolutionDiscriminator

    d = MultiResolutionDiscriminator(resolutions=((64, 16, 64),))
    x = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
    params = d.init(jax.random.key(0), x)["params"]
    logits, fmaps = d.apply({"params": params}, x)
    assert len(logits) == 1 and len(fmaps) == 1
    assert logits[0].ndim == 2
