from amphion_tpu.data.emilia.pipeline import EmiliaPipeline, energy_vad
