import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.models.tts.vits.vits import VITS, VITSConfig
from amphion_tpu.models.tts.vits.vits_trainer import (
    create_vits_states,
    make_vits_train_step,
)
from amphion_tpu.models.vocoders.gan_trainer import CombinedDiscriminator, GANTrainConfig
from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig
from amphion_tpu.ops.mel import MelConfig, linear_spectrogram

TINY = VITSConfig(
    num_phones=32,
    spec_channels=33,  # n_fft 64
    inter_channels=16,
    hidden_channels=16,
    filter_channels=32,
    n_heads=2,
    n_layers=1,
    n_speakers=4,
    gin_channels=8,
    segment_size=8,
    decoder=HiFiGANConfig(
        resblock="2",
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        n_mel=16,
    ),
)
MEL = MelConfig(sample_rate=8000, n_fft=64, win_size=32, hop_size=8, n_mel=16, fmax=4000)


def _batch(rng, b=2, frames=24, phones=6):
    hop = TINY.decoder.hop_size
    audio = (rng.standard_normal((b, frames * hop)) * 0.2).astype(np.float32)
    spec = np.asarray(linear_spectrogram(jnp.asarray(audio), MEL)).transpose(0, 2, 1)
    return {
        "phones": jnp.asarray(rng.integers(1, 32, (b, phones))),
        "phone_mask": jnp.ones((b, phones), jnp.float32),
        "spec": jnp.asarray(spec),
        "spec_mask": jnp.ones((b, frames), jnp.float32),
        "audio": jnp.asarray(audio),
        "sid": jnp.asarray([0, 1] if b == 2 else [0] * b),
    }


@pytest.fixture(scope="module")
def vits_setup():
    rng = np.random.default_rng(0)
    model = VITS(TINY)
    disc = CombinedDiscriminator(use=("mpd",), mpd_periods=(2,), channel_mult=0.0625)
    batch = _batch(rng)
    gstate, dstate = create_vits_states(
        model, disc, jax.random.key(0), batch, GANTrainConfig(lr=5e-4)
    )
    return model, disc, batch, gstate, dstate


def test_vits_train_step(vits_setup):
    model, disc, batch, gstate, dstate = vits_setup
    step = make_vits_train_step(model, MEL)
    # the step donates its inputs; work on copies so the fixture stays valid
    g = jax.tree_util.tree_map(jnp.copy, gstate)
    d = jax.tree_util.tree_map(jnp.copy, dstate)
    first = None
    for i in range(5):
        g, d, m = step(g, d, batch)
        if i == 0:
            first = {k: float(v) for k, v in m.items()}
            for k, v in first.items():
                assert np.isfinite(v), k
    assert float(m["g_mel"]) < first["g_mel"]


def test_vits_infer(vits_setup):
    model, disc, batch, gstate, dstate = vits_setup
    wav, mask, durs = model.apply(
        {"params": gstate.params},
        batch["phones"], batch["phone_mask"], jax.random.key(1),
        batch["sid"], 0.667, 1.0, 0.8, 64,
        method=VITS.infer,
    )
    assert wav.shape == (2, 64 * TINY.decoder.hop_size)
    assert np.isfinite(np.asarray(wav)).all()
    assert (np.asarray(durs) >= 0).all()


def test_vits_voice_conversion(vits_setup):
    model, disc, batch, gstate, dstate = vits_setup
    out = model.apply(
        {"params": gstate.params},
        batch["spec"], batch["spec_mask"],
        jnp.asarray([0, 1]), jnp.asarray([2, 3]), jax.random.key(2),
        method=VITS.voice_conversion,
    )
    assert out.shape == batch["audio"].shape
    assert np.isfinite(np.asarray(out)).all()
