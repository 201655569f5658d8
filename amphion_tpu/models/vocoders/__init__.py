from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig, HiFiGANGenerator
from amphion_tpu.models.vocoders.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    MultiScaleDiscriminator,
)
