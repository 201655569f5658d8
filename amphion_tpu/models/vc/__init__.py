from amphion_tpu.models.vc.ar_transformer import (
    ARTransformer,
    ARTransformerConfig,
    ar_transformer_generate,
)
from amphion_tpu.models.vc.flow_matching_transformer import (
    FlowMatchingTransformer,
    FMTConfig,
    fmt_inference,
)
