from amphion_tpu.models.tts.jets.jets import Jets, JetsConfig
