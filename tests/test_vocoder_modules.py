import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.modules.activations import Snake, SnakeBeta
from amphion_tpu.modules.anti_aliasing import (
    downsample1d,
    kaiser_sinc_filter1d,
    upsample1d,
)
from amphion_tpu.modules.condition_encoder import (
    ConditionEncoder,
    ConditionEncoderConfig,
)
from amphion_tpu.modules.norms import StyleAdaptiveLayerNorm
from amphion_tpu.modules.nsf import SourceModuleHnNSF, upsample_f0
from amphion_tpu.modules.wavenet_denoiser import WaveNetDenoiser, WaveNetDenoiserConfig


def test_snake_identity_at_zero():
    m = Snake(4)
    x = jnp.zeros((1, 8, 4))
    p = m.init(jax.random.key(0), x)["params"]
    np.testing.assert_allclose(np.asarray(m.apply({"params": p}, x)), 0.0)
    y = m.apply({"params": p}, jnp.ones((1, 8, 4)))
    assert np.isfinite(np.asarray(y)).all()
    m2 = SnakeBeta(4)
    p2 = m2.init(jax.random.key(0), x)["params"]
    assert np.isfinite(np.asarray(m2.apply({"params": p2}, jnp.ones((1, 8, 4))))).all()


def test_kaiser_filter_dc_gain():
    f = kaiser_sinc_filter1d(0.25, 0.3, 12)
    assert abs(f.sum() - 1.0) < 1e-6


def test_up_down_roundtrip_preserves_band_limited():
    # band-limited signal survives up→down
    t = np.arange(256) / 256
    x = np.sin(2 * np.pi * 8 * t).astype(np.float32)[None, :, None]
    up = upsample1d(jnp.asarray(x), 2)
    assert up.shape == (1, 512, 1)
    down = downsample1d(up, 2)
    assert down.shape == (1, 256, 1)
    err = np.abs(np.asarray(down)[0, 20:-20, 0] - x[0, 20:-20, 0]).max()
    assert err < 0.02


def test_nsf_source_module():
    sr, hop = 8000, 8
    f0 = jnp.full((2, 16), 200.0)
    f0_up = upsample_f0(f0, hop)
    assert f0_up.shape == (2, 128)
    m = SourceModuleHnNSF(sr)
    p = m.init(jax.random.key(0), f0_up, jax.random.key(1))["params"]
    exc, uv = m.apply({"params": p}, f0_up, jax.random.key(2))
    assert exc.shape == (2, 128, 1)
    assert np.asarray(uv).all()  # all voiced
    # unvoiced → noise only
    exc0, uv0 = m.apply({"params": p}, jnp.zeros((2, 128)), jax.random.key(2))
    assert not np.asarray(uv0).any()


def test_style_adaptive_layernorm():
    m = StyleAdaptiveLayerNorm()
    x = jax.random.normal(jax.random.key(0), (2, 6, 8))
    s = jax.random.normal(jax.random.key(1), (2, 16))
    p = m.init(jax.random.key(2), x, s)["params"]
    y = m.apply({"params": p}, x, s)
    assert y.shape == x.shape


def test_condition_encoder_sums_streams():
    cfg = ConditionEncoderConfig(
        output_dim=32, use_whisper=True, whisper_dim=16, num_singers=4
    )
    m = ConditionEncoder(cfg)
    feats = {
        "whisper": jnp.ones((2, 10, 16)),
        "f0": jnp.full((2, 10), 220.0),
        "uv": jnp.ones((2, 10)),
        "loudness": jnp.full((2, 10), 0.1),
        "singer": jnp.asarray([0, 3]),
    }
    p = m.init(jax.random.key(0), feats)["params"]
    out = m.apply({"params": p}, feats)
    assert out.shape == (2, 10, 32)


def test_wavenet_denoiser():
    cfg = WaveNetDenoiserConfig(in_dim=8, hidden=16, num_layers=4, cond_dim=12)
    m = WaveNetDenoiser(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 10, 8))
    t = jnp.asarray([3, 7])
    cond = jnp.ones((2, 10, 12))
    p = m.init(jax.random.key(1), x, t, cond)["params"]
    out = m.apply({"params": p}, x, t, cond)
    assert out.shape == x.shape
    # zero-init output projection -> initial output is exactly 0
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_msstft_and_mssbcqt_discriminators(rng):
    """MS-STFT (complex-spectrogram) and MS-SB-CQT (native multi-octave
    CQT sub-band) discriminators (ref msstftd.py / mssbcqtd.py)."""
    import jax

    from amphion_tpu.models.vocoders.discriminators import (
        MultiScaleSubBandCQTDiscriminator,
        MultiSTFTDiscriminator,
    )

    x = jnp.asarray(rng.standard_normal((2, 4800)).astype(np.float32) * 0.3)
    d1 = MultiSTFTDiscriminator(resolutions=((512, 128, 512), (256, 64, 256)))
    p1 = d1.init(jax.random.key(0), x)["params"]
    logits, fmaps = d1.apply({"params": p1}, x)
    assert len(logits) == 2 and all(l.shape[0] == 2 for l in logits)
    assert all(np.isfinite(np.asarray(l)).all() for l in logits)

    d2 = MultiScaleSubBandCQTDiscriminator(
        sample_rate=24000, hops=(512, 256), n_octaves=(9, 9),
        bins_per_octaves=(24, 36))
    p2 = d2.init(jax.random.key(0), x)["params"]
    logits2, fmaps2 = d2.apply({"params": p2}, x)
    assert len(logits2) == 2 and all(np.isfinite(np.asarray(l)).all()
                                     for l in logits2)

    # gradient flows through both (they train jointly with the generator)
    def loss(params):
        lo, _ = d2.apply({"params": params}, x)
        return sum(jnp.mean(l**2) for l in lo)

    g = jax.grad(loss)(p2)
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))
