from amphion_tpu.data.preprocessors.processor import (
    SUPPORTED_DATASETS,
    preprocess_dataset,
)
