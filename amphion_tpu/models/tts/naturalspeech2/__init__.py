from amphion_tpu.models.tts.naturalspeech2.ns2 import (
    NaturalSpeech2,
    NS2Config,
    ns2_sample,
)
