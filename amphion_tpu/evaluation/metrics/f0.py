"""F0 metrics (reference: `evaluation/metrics/f0/`): FPC, F0RMSE,
Periodicity RMSE, V/UV F1 — computed from the native YIN tracker."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from amphion_tpu.ops.f0 import F0Config, yin_f0


def _track(audio: np.ndarray, sample_rate: int, hop_size: int):
    cfg = F0Config(sample_rate=sample_rate, hop_size=hop_size)
    t = len(audio) // hop_size * hop_size
    f0, v = yin_f0(jnp.asarray(audio[:t]), cfg)
    return np.asarray(f0)[0], np.asarray(v)[0]


def _align(a: np.ndarray, b: np.ndarray):
    n = min(len(a), len(b))
    return a[:n], b[:n]


def f0_pearson_coefficients(ref, gen, sample_rate=24000, hop_size=120) -> float:
    """FPC: Pearson correlation over commonly-voiced frames."""
    f_r, v_r = _track(ref, sample_rate, hop_size)
    f_g, v_g = _track(gen, sample_rate, hop_size)
    f_r, f_g = _align(f_r, f_g)
    v_r, v_g = _align(v_r, v_g)
    both = v_r & v_g
    if both.sum() < 2:
        return 0.0
    a, b = f_r[both], f_g[both]
    if a.std() < 1e-6 or b.std() < 1e-6:
        return 0.0
    return float(np.corrcoef(a, b)[0, 1])


def f0_rmse(ref, gen, sample_rate=24000, hop_size=120, use_cents=True) -> float:
    """F0 RMSE over commonly-voiced frames (cents by default)."""
    f_r, v_r = _track(ref, sample_rate, hop_size)
    f_g, v_g = _track(gen, sample_rate, hop_size)
    f_r, f_g = _align(f_r, f_g)
    v_r, v_g = _align(v_r, v_g)
    both = v_r & v_g
    if both.sum() == 0:
        return 0.0
    a, b = f_r[both], f_g[both]
    if use_cents:
        d = 1200.0 * np.log2(np.maximum(b, 1e-5) / np.maximum(a, 1e-5))
    else:
        d = b - a
    return float(np.sqrt(np.mean(d**2)))


def f0_periodicity_rmse(ref, gen, sample_rate=24000, hop_size=120) -> float:
    """RMSE of the frame periodicity (voicing strength proxy)."""
    _, v_r = _track(ref, sample_rate, hop_size)
    _, v_g = _track(gen, sample_rate, hop_size)
    v_r, v_g = _align(v_r.astype(float), v_g.astype(float))
    return float(np.sqrt(np.mean((v_r - v_g) ** 2)))


def vuv_f1(ref, gen, sample_rate=24000, hop_size=120) -> float:
    """Voiced/unvoiced F1 score."""
    _, v_r = _track(ref, sample_rate, hop_size)
    _, v_g = _track(gen, sample_rate, hop_size)
    v_r, v_g = _align(v_r, v_g)
    tp = float((v_r & v_g).sum())
    fp = float((~v_r & v_g).sum())
    fn = float((v_r & ~v_g).sum())
    if tp == 0:
        return 0.0
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    return 2 * prec * rec / (prec + rec)
