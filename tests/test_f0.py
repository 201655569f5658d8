import jax.numpy as jnp
import numpy as np

from amphion_tpu.ops.f0 import F0Config, f0_to_coarse, interpolate_f0, yin_f0


def _sine(freq, sr, dur, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_yin_on_pure_tone():
    cfg = F0Config()
    y = _sine(220.0, cfg.sample_rate, 1.0)
    y = y[: len(y) // cfg.hop_size * cfg.hop_size]
    f0, voiced = yin_f0(jnp.asarray(y), cfg)
    f0 = np.asarray(f0)[0]
    voiced = np.asarray(voiced)[0]
    mid = f0[10:-10]
    assert voiced[10:-10].all()
    assert np.abs(mid - 220.0).max() < 3.0


def test_yin_on_silence_and_noise():
    cfg = F0Config()
    rng = np.random.default_rng(0)
    sil = np.zeros(cfg.hop_size * 50, np.float32)
    _, v = yin_f0(jnp.asarray(sil), cfg)
    assert not np.asarray(v).any()
    noise = rng.standard_normal(cfg.hop_size * 50).astype(np.float32) * 0.1
    _, vn = yin_f0(jnp.asarray(noise), cfg)
    assert np.asarray(vn).mean() < 0.5


def test_yin_tracks_two_tones():
    cfg = F0Config()
    y = np.concatenate(
        [_sine(110.0, cfg.sample_rate, 0.5), _sine(440.0, cfg.sample_rate, 0.5)]
    )
    y = y[: len(y) // cfg.hop_size * cfg.hop_size]
    f0, _ = yin_f0(jnp.asarray(y), cfg)
    f0 = np.asarray(f0)[0]
    n = len(f0)
    assert np.abs(np.median(f0[5 : n // 2 - 5]) - 110.0) < 3.0
    assert np.abs(np.median(f0[n // 2 + 5 : -5]) - 440.0) < 5.0


def test_interpolate_f0_matches_numpy():
    f0 = np.array([0, 0, 100, 0, 0, 200, 0, 300, 0, 0], np.float32)
    out, uv = interpolate_f0(jnp.asarray(f0))
    out = np.asarray(out)
    # numpy reference (reference semantics, utils/f0.py:49-66)
    uv_ref = f0 == 0
    ref = f0.copy()
    ref[uv_ref] = np.interp(np.where(uv_ref)[0], np.where(~uv_ref)[0], f0[~uv_ref])
    np.testing.assert_allclose(out, ref, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(uv), uv_ref)


def test_f0_to_coarse_range():
    f0 = jnp.asarray([0.0, 50.0, 220.0, 1100.0, 2000.0])
    coarse = np.asarray(f0_to_coarse(f0, 256, 50.0, 1100.0))
    assert coarse.min() >= 1 and coarse.max() <= 255
    assert coarse[0] == 1  # unvoiced → bin 1
    assert coarse[3] == 255
