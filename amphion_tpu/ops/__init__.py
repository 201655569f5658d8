from amphion_tpu.ops.stft import (
    frame_signal,
    hann_window,
    istft,
    stft,
    stft_magnitude,
)
from amphion_tpu.ops.mel import (
    MelConfig,
    log_compression,
    mel_filterbank,
    mel_spectrogram,
    linear_spectrogram,
)
from amphion_tpu.ops.f0 import (
    F0Config,
    f0_to_coarse,
    interpolate_f0,
    yin_f0,
)
from amphion_tpu.ops.energy import energy_from_log_mel, energy_from_waveform
from amphion_tpu.ops.mas import maximum_path
from amphion_tpu.ops.sampling import sample_logits, top_k_filter, top_p_filter
