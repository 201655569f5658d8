"""DSP front-end parity tests vs an independent torch implementation."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from amphion_tpu.ops.mel import MelConfig, mel_filterbank, mel_spectrogram, linear_spectrogram
from amphion_tpu.ops.stft import hann_window, istft, stft, stft_magnitude


def _torch_stft_mag(y, n_fft, hop, win, center=False, pad_ref=True, eps=1e-6):
    yt = torch.from_numpy(np.asarray(y)).float()
    if yt.ndim == 1:
        yt = yt[None]
    if pad_ref:
        p = (n_fft - hop) // 2
        yt = torch.nn.functional.pad(yt[:, None], (p, p), mode="reflect")[:, 0]
    spec = torch.stft(
        yt, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=center, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    return torch.sqrt(spec.real**2 + spec.imag**2 + eps).numpy()


def test_hann_window_matches_torch():
    ours = np.asarray(hann_window(480))
    theirs = torch.hann_window(480).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 120, 480), (1024, 256, 1024), (2048, 300, 1200)])
def test_stft_magnitude_matches_torch(rng, n_fft, hop, win):
    t = hop * 50
    y = rng.standard_normal(t).astype(np.float32) * 0.3
    p = (n_fft - hop) // 2
    ypad = np.pad(y[None], ((0, 0), (p, p)), mode="reflect")
    ours = np.asarray(stft_magnitude(jnp.asarray(ypad), n_fft, hop, win))
    theirs = _torch_stft_mag(y, n_fft, hop, win)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_mel_spectrogram_matches_torch_pipeline(rng):
    cfg = MelConfig()
    t = cfg.hop_size * 200
    y = (rng.standard_normal(t) * 0.2).astype(np.float32)
    ours = np.asarray(mel_spectrogram(jnp.asarray(y), cfg))[0]
    mag = _torch_stft_mag(y, cfg.n_fft, cfg.hop_size, cfg.win_size)[0]
    basis = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mel, cfg.fmin, cfg.fmax)
    ref = np.log(np.clip(basis @ mag, 1e-5, None))
    assert ours.shape == (cfg.n_mel, t // cfg.hop_size)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-3)


def test_mel_standardization(rng):
    """`mel_mean`/`mel_var` standardize the log-mel exactly like the
    reference trainers (`vocos_trainer.py:512`, `rep_coco_trainer.py:126`,
    `vevo_utils.py:267`): (logmel - mean) / sqrt(var)."""
    raw_cfg = MelConfig()
    t = raw_cfg.hop_size * 50
    y = (rng.standard_normal(t) * 0.2).astype(np.float32)
    raw = np.asarray(mel_spectrogram(jnp.asarray(y), raw_cfg))

    class P(dict):
        __getattr__ = dict.__getitem__

    p = P(sample_rate=24000, n_fft=1024, win_size=480, hop_size=120,
          n_mel=80, fmin=0.0, fmax=12000.0, mel_mean=-4.92, mel_var=8.14)
    norm_cfg = MelConfig.from_preprocess_cfg(p)
    assert norm_cfg.mean == -4.92 and norm_cfg.var == 8.14
    norm = np.asarray(mel_spectrogram(jnp.asarray(y), norm_cfg))
    np.testing.assert_allclose(
        norm, (raw + 4.92) / np.sqrt(8.14), atol=1e-5, rtol=1e-5)


def test_mel_filterbank_properties():
    fb = mel_filterbank(24000, 1024, 80, 0.0, 12000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has some support; supports are ordered by center bin
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()
    assert fb.sum() > 0
    # slaney normalization: filters get narrower-but-taller at low freq
    assert fb[0].max() > fb[-1].max()


def test_istft_roundtrip(rng):
    n_fft, hop, win = 1024, 256, 1024
    t = 256 * 40
    y = (rng.standard_normal(t) * 0.3).astype(np.float32)
    re, im = stft(jnp.asarray(y)[None], n_fft, hop, win, center=True)
    out = np.asarray(istft(re, im, n_fft, hop, win, length=t))[0]
    np.testing.assert_allclose(out, y, atol=1e-3)


def test_istft_roundtrip_unaligned_length(rng):
    """Regression: with `length` not hop-aligned the symmetric end-trim used
    to zero the last partial-overlap samples (torch trims only the start)."""
    n_fft, hop, win = 1024, 256, 1024
    t = 24000  # not a multiple of hop
    y = (rng.standard_normal(t) * 0.3).astype(np.float32)
    re, im = stft(jnp.asarray(y)[None], n_fft, hop, win, center=True)
    out = np.asarray(istft(re, im, n_fft, hop, win, length=t))[0]
    np.testing.assert_allclose(out, y, atol=1e-3)
    # tail must be reconstructed, not zero-padded
    assert np.abs(out[-200:]).max() > 0.01


def test_linear_spectrogram_shape(rng):
    cfg = MelConfig()
    y = (rng.standard_normal(cfg.hop_size * 20) * 0.1).astype(np.float32)
    spec = linear_spectrogram(jnp.asarray(y), cfg)
    assert spec.shape == (1, cfg.n_fft // 2 + 1, 20)
