from amphion_tpu.models.svc.diffusion_svc import (
    DiffusionSVC,
    DiffusionSVCConfig,
    diffusion_svc_sample,
)
from amphion_tpu.models.svc.comosvc import ComoSVC, ComoSVCConfig, comosvc_sample, ct_loss
from amphion_tpu.models.svc.transformer_svc import TransformerSVC, TransformerSVCConfig
