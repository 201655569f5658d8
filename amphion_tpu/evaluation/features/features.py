"""Analysis features (reference: `evaluation/features/` — LTAS, SNR,
singing power ratio)."""

from __future__ import annotations

import numpy as np


def long_term_average_spectrum(
    x: np.ndarray, sr: int, n_fft: int = 2048, hop: int = 512
) -> tuple[np.ndarray, np.ndarray]:
    """LTAS: mean power spectrum over frames → (freqs, ltas_db)."""
    n = (len(x) - n_fft) // hop + 1
    if n < 1:
        n = 1
        x = np.pad(x, (0, max(0, n_fft - len(x))))
    w = np.hanning(n_fft)
    frames = np.stack([x[i * hop : i * hop + n_fft] * w for i in range(n)])
    psd = (np.abs(np.fft.rfft(frames, axis=1)) ** 2).mean(axis=0)
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    return freqs, 10 * np.log10(psd + 1e-12)


def signal_to_noise_ratio(x: np.ndarray, sr: int) -> float:
    """Global SNR estimate of a recording (spectral noise-floor method)."""
    from amphion_tpu.data.emilia.pipeline import estimate_snr

    return estimate_snr(np.asarray(x, np.float32), sr)


def singing_power_ratio(
    x: np.ndarray, sr: int,
    low_band: tuple = (50.0, 2000.0), high_band: tuple = (2000.0, 4000.0),
) -> float:
    """SPR (dB): ratio of the strongest partial in the low band to the
    strongest in the singer's-formant band — a resonance/projection measure."""
    freqs, ltas = long_term_average_spectrum(x, sr)
    lo = ltas[(freqs >= low_band[0]) & (freqs < low_band[1])]
    hi = ltas[(freqs >= high_band[0]) & (freqs < high_band[1])]
    if lo.size == 0 or hi.size == 0:
        return 0.0
    return float(lo.max() - hi.max())
