from amphion_tpu.evaluation.features.features import (
    long_term_average_spectrum,
    signal_to_noise_ratio,
    singing_power_ratio,
)
