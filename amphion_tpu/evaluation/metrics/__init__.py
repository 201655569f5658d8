"""Objective metric registry (reference: `bins/calc_metrics.py:45-62`).

Maps metric names → callables computing a scalar from (reference audio,
generated audio) or derived features. Same metric surface as the reference's
16 metrics; everything DSP-based is implemented natively (no librosa/pyworld),
model-based metrics (WER, speaker-sim, FAD) wrap frozen `transformers`
checkpoints on the host.
"""

from __future__ import annotations

from amphion_tpu.evaluation.metrics.f0 import (
    f0_periodicity_rmse,
    f0_pearson_coefficients,
    f0_rmse,
    vuv_f1,
)
from amphion_tpu.evaluation.metrics.energy import (
    energy_pearson_coefficients,
    energy_rmse,
)
from amphion_tpu.evaluation.metrics.spectrogram import (
    frechet_distance,
    mel_cepstral_distortion,
    multi_resolution_stft_distance,
    pesq_proxy,
    si_sdr,
    si_snr,
    stoi,
)
from amphion_tpu.evaluation.metrics.intelligibility import (
    character_error_rate,
    word_error_rate,
)
from amphion_tpu.evaluation.metrics.p862 import pesq_p862
from amphion_tpu.evaluation.metrics.similarity import speaker_similarity

METRIC_REGISTRY = {
    "fpc": f0_pearson_coefficients,
    "f0rmse": f0_rmse,
    "f0_periodicity_rmse": f0_periodicity_rmse,
    "v_uv_f1": vuv_f1,
    "energy_rmse": energy_rmse,
    "energy_pc": energy_pearson_coefficients,
    "mcd": mel_cepstral_distortion,
    "mstft": multi_resolution_stft_distance,
    "pesq": pesq_p862,       # native P.862; one-time calibration warning
    "pesq_native": pesq_p862,  # explicit alias: native recalibrated impl
    "pesq_proxy": pesq_proxy,
    "si_sdr": si_sdr,
    "si_snr": si_snr,
    "stoi": stoi,
    "fad": frechet_distance,
    "wer": word_error_rate,
    "cer": character_error_rate,
    "speaker_similarity": speaker_similarity,
}


def calc_metric(name: str, *args, **kwargs) -> float:
    if name not in METRIC_REGISTRY:
        raise KeyError(
            f"unknown metric {name!r}; available: {sorted(METRIC_REGISTRY)}"
        )
    return METRIC_REGISTRY[name](*args, **kwargs)
