from amphion_tpu.models.tta.autoencoder_kl import AutoencoderKL, AutoencoderKLConfig
from amphion_tpu.models.tta.audioldm import AudioLDM, AudioLDMConfig, audioldm_sample
