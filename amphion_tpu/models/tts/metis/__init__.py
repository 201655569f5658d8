from amphion_tpu.models.tts.metis.metis import Metis, MetisConfig
