from amphion_tpu.models.tts.vits.vits import VITS, VITSConfig
