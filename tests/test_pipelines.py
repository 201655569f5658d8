"""Zero-shot pipeline assembly tests: tiny components end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
from amphion_tpu.models.codec.repcodec import RepCodec, RepCodecConfig
from amphion_tpu.models.tts.maskgct.maskgct import (
    MaskGCTS2A,
    MaskGCTT2S,
    S2AConfig,
    T2SConfig,
)
from amphion_tpu.pipelines.maskgct_pipeline import MaskGCTPipeline

SEM_DIM = 8
T2S = T2SConfig(hidden=32, num_layers=1, num_heads=4, codebook_size=24,
                phone_vocab=64, max_position=256)
S2A = S2AConfig(hidden=32, num_layers=1, num_heads=4, codebook_size=16,
                num_quantizers=2, semantic_dim=24, max_position=256)
SEM = RepCodecConfig(feature_dim=SEM_DIM, hidden=24, codebook_size=24,
                     codebook_dim=4, num_blocks=1)
AC = CodecConfig(sample_rate=8000, encoder_dim=4, latent_dim=8, decoder_dim=4,
                 strides=(2, 4), num_quantizers=2, codebook_size=16,
                 codebook_dim=4)


def _dummy_semantic_extractor(audio, sr):
    """Stand-in for w2v-bert: deterministic features at ~ the codec frame
    rate (1 frame per 8 samples here)."""
    n = max(len(audio) // 8, 1)
    rng = np.random.default_rng(int(abs(audio[:10]).sum() * 1e4) % 2**31)
    return rng.standard_normal((n, SEM_DIM)).astype(np.float32)


@pytest.mark.parametrize("target_len", [12])
def test_maskgct_pipeline_end_to_end(rng, target_len):
    t2s = MaskGCTT2S(T2S)
    s2a = MaskGCTS2A(S2A)
    sem = RepCodec(SEM)
    ac = AmphionCodec(AC)

    prompt_audio = (rng.standard_normal(8 * 32) * 0.2).astype(np.float32)

    params = {
        "t2s": t2s.init(
            jax.random.key(0), jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8)),
            jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4)), jax.random.key(1),
            method=MaskGCTT2S.compute_loss,
        )["params"],
        "s2a": s2a.init(
            jax.random.key(0), jnp.zeros((1, 2, 8), jnp.int32), jnp.ones((1, 8)),
            jnp.zeros((1, 8, 24)), jax.random.key(1),
            method=MaskGCTS2A.compute_loss,
        )["params"],
        "semantic_codec": sem.init(
            jax.random.key(0), jnp.zeros((1, 8, SEM_DIM))
        )["params"],
        "acoustic_codec": ac.init(
            jax.random.key(0), jnp.zeros((1, AC.hop * 4))
        )["params"],
    }
    # the S2A semantic conditioning dim must match the semantic codec's
    # quantized-latent dim
    assert S2A.semantic_dim == SEM.hidden

    pipe = MaskGCTPipeline(
        t2s=t2s, s2a=s2a, semantic_codec=sem, acoustic_codec=ac,
        params=params, semantic_extractor=_dummy_semantic_extractor,
        sample_rate=8000,
    )
    wav = pipe(
        prompt_audio, "hi there", "hello world", jax.random.key(3),
        target_len=target_len,
    )
    assert wav.ndim == 1
    assert wav.shape[0] == target_len * AC.hop
    assert np.isfinite(wav).all()
