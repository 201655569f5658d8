from amphion_tpu.models.tts.fastspeech2.fs2 import FastSpeech2, FastSpeech2Config
