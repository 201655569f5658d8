from amphion_tpu.models.tts.maskgct.maskgct import (
    MaskGCTS2A,
    MaskGCTT2S,
    S2AConfig,
    T2SConfig,
    t2s_sample,
    s2a_sample,
)
