"""Chromagram op: physical ground truth (pure tones → pitch classes) and
the reference's get_chromagram frame conventions."""

import numpy as np
import pytest

import jax.numpy as jnp

from amphion_tpu.ops.chroma import (
    chroma_filterbank,
    chroma_stft,
    chromagram_for_frames,
)

SR = 24000


def tone(freq, secs=1.0, sr=SR):
    t = np.arange(int(secs * sr), dtype=np.float32) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_filterbank_shape_and_norm():
    fb = chroma_filterbank(SR, 1024, 24)
    assert fb.shape == (24, 513)
    # every FFT bin column has bounded weight (L2-normalized then
    # octave-weighted <= 1)
    assert np.all(np.linalg.norm(fb, axis=0) <= 1.0 + 1e-5)
    assert np.all(fb >= 0)


@pytest.mark.parametrize(
    "freq,pitch_class",
    [(261.63, 0), (440.0, 9), (523.25, 0), (392.0, 7)],  # C4, A4, C5, G4
)
def test_pure_tone_peaks_at_pitch_class(freq, pitch_class):
    """A pure tone's chroma must peak at its pitch class (24 bins = 2 per
    semitone, base C)."""
    c = np.asarray(chroma_stft(jnp.asarray(tone(freq)), SR))
    mean_profile = c[0].mean(axis=1)
    assert int(np.argmax(mean_profile)) == 2 * pitch_class


def test_octave_invariance():
    """Chroma folds octaves: A4, A5, A6 give the same argmax bin. (A3 and
    below smear across neighbors — n_fft=1024 @ 24 kHz gives 23 Hz bins vs
    a 6 Hz half-semitone at 220 Hz, the same resolution limit librosa's
    chroma_stft has.)"""
    for f in (440.0, 880.0, 1760.0):
        prof = np.asarray(chroma_stft(jnp.asarray(tone(f)), SR))[0].mean(1)
        assert int(np.argmax(prof)) == 18, f  # A = 9 * 2


def test_frame_count_and_normalization():
    y = tone(440.0, secs=0.5)
    c = np.asarray(chroma_stft(jnp.asarray(y), SR, 1024, 120, 480))
    assert c.shape == (1, 24, 1 + len(y) // 120)
    # inf-norm per frame: every frame max is 1 (signal everywhere)
    np.testing.assert_allclose(c[0].max(axis=0), 1.0, atol=1e-5)
    # silence stays finite and unnormalized
    s = np.asarray(chroma_stft(jnp.zeros((1, 12000)), SR))
    assert np.isfinite(s).all() and s.max() == 0.0


def test_chromagram_for_frames_pad_truncate_ratio():
    y = tone(330.0, secs=0.3)
    n = len(y) // 120
    c = chromagram_for_frames(y, n, SR)
    assert c.shape == (n, 24)
    # edge-pad far beyond the natural frame count
    c2 = chromagram_for_frames(y, n + 10, SR)
    assert c2.shape == (n + 10, 24)
    np.testing.assert_allclose(c2[-1], c2[n])  # n natural frames are 0..n
    # duration-ratio resampling halves the pre-pad length
    c3 = chromagram_for_frames(y, n // 2, SR, frame_len_ratio=0.5)
    assert c3.shape == (n // 2, 24)
    assert np.isfinite(c3).all()
