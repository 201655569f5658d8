from amphion_tpu.models.tts.valle.valle import VALLE, VALLEConfig
