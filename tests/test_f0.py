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


def test_pyin_tracks_sweep_through_noise():
    """pYIN-style Viterbi tracker (ref get_f0_features_using_pyin,
    utils/f0.py:73): must stay on a sweep through a noise burst where the
    per-frame candidates get corrupted, and match YIN accuracy on the
    clean parts."""
    from amphion_tpu.ops.f0 import F0Config, PyinConfig, pyin_f0

    sr = 16000
    t = np.arange(sr) / sr
    freq = 150 * 2 ** (t / 1.0)  # one-octave sweep
    phase = 2 * np.pi * np.cumsum(freq) / sr
    x = 0.5 * np.sin(phase)
    x[sr // 2:sr // 2 + 600] += 0.6 * np.random.default_rng(0).standard_normal(600)
    cfg = PyinConfig(base=F0Config(sample_rate=sr, hop_size=160,
                                   f0_min=60, f0_max=800))
    f0, vp = pyin_f0(jnp.asarray(x[None]), cfg)
    f0 = np.asarray(f0[0])
    gt = freq[np.arange(len(f0)) * 160]
    v = f0 > 0
    cents = np.abs(1200 * np.log2(np.maximum(f0[v], 1) / gt[v]))
    assert float(np.median(cents)) < 15
    assert v.mean() > 0.8
    # no octave jumps: consecutive voiced deltas stay under 6 semitones
    fv = f0[v]
    jumps = np.abs(12 * np.log2(fv[1:] / fv[:-1]))
    assert float(jumps.max()) < 6


def test_pyin_silence_unvoiced():
    from amphion_tpu.ops.f0 import F0Config, PyinConfig, pyin_f0

    cfg = PyinConfig(base=F0Config(sample_rate=16000, hop_size=160,
                                   f0_min=60, f0_max=800))
    f0, _ = pyin_f0(jnp.zeros((1, 8000)), cfg)
    assert int((np.asarray(f0) > 0).sum()) == 0
