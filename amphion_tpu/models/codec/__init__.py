from amphion_tpu.models.codec.amphion_codec import (
    AmphionCodec,
    CodecConfig,
    CodecDecoder,
    CodecEncoder,
)
from amphion_tpu.models.codec.repcodec import RepCodec, RepCodecConfig
