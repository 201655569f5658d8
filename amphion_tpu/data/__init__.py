from amphion_tpu.data.metadata import Utterance, load_metadata, save_metadata
from amphion_tpu.data.audio_io import load_wav, save_wav, resample
from amphion_tpu.data.samplers import (
    LengthBucketSampler,
    ScheduledSampler,
    VariableSampler,
    batch_by_size,
)
