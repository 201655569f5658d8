"""Batched Vevo VC serving (VevoService): tiny models, CPU.

Asserts the serving contract end-to-end, for both the FM-only "timbre"
product and the AR+FM "voice" product: a request's result is independent
of batch composition (per-request RNG keys + ragged masking). Integer
token streams are bit-identical (tests/test_ragged_vevo.py asserts that
at the sampler level); the float waveform matches to a small tolerance —
XLA compiles a separate program per batch size, and the FM-ODE/Vocos
float reduction order legitimately differs between the B=1 and B=3
programs (measured ≤8e-7 abs; asserted at 1e-5 headroom).
"""

import threading

import jax
import numpy as np
import pytest

from amphion_tpu.models.codec.repcodec import RepCodec, RepCodecConfig
from amphion_tpu.models.vc.ar_transformer import ARTransformer, ARTransformerConfig
from amphion_tpu.models.vc.flow_matching_transformer import (
    FlowMatchingTransformer,
    FMTConfig,
)
from amphion_tpu.models.vocoders.vocos import VocosConfig, VocosGenerator
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.pipelines.vevo_pipeline import VevoPipeline
from amphion_tpu.serving.service import VevoService

import jax.numpy as jnp

MEL = MelConfig(sample_rate=16000, n_fft=64, win_size=64, hop_size=32,
                n_mel=8, fmax=8000.0)


@pytest.fixture(scope="module")
def service():
    r = jax.random.key(0)
    content_tok = RepCodec(RepCodecConfig(
        feature_dim=8, hidden=16, codebook_size=32, codebook_dim=4,
        num_blocks=1))
    style_tok = RepCodec(RepCodecConfig(
        feature_dim=8, hidden=16, codebook_size=64, codebook_dim=4,
        num_blocks=1))
    feats = jnp.zeros((1, 20, 8))
    ct_params = content_tok.init(r, feats)["params"]
    st_params = style_tok.init(r, feats)["params"]
    ar = ARTransformer(ARTransformerConfig(
        input_vocab=32, output_vocab=64, hidden=32, intermediate=64,
        num_layers=2, num_heads=2, max_position=2048))
    toks = jnp.zeros((1, 6), jnp.int32)
    m = jnp.ones((1, 6), jnp.float32)
    ar_params = ar.init(r, toks, m, toks, m,
                        method=ARTransformer.loss)["params"]
    fm = FlowMatchingTransformer(FMTConfig(
        token_vocab=64, n_mel=8, hidden=32, num_layers=2, num_heads=2,
        max_position=2048))
    tok = jnp.zeros((1, 10), jnp.int32)
    mel = jnp.zeros((1, 10, 8))
    pmask = jnp.concatenate([jnp.ones((1, 4)), jnp.zeros((1, 6))], axis=1)
    fm_params = fm.init(r, mel, tok, pmask, jnp.ones((1, 10)),
                        jax.random.key(1),
                        method=FlowMatchingTransformer.loss)["params"]
    voc = VocosGenerator(VocosConfig(
        n_mel=8, dim=16, intermediate_dim=32, num_layers=1, n_fft=64,
        hop_size=32))
    voc_params = voc.init(r, mel)["params"]

    def ssl(audio, sample_rate):
        t = max(len(audio) // MEL.hop_size * MEL.hop_size, MEL.hop_size)
        return np.asarray(mel_spectrogram(
            jnp.asarray(audio[:t])[None], MEL)).transpose(0, 2, 1)[0]

    pipe = VevoPipeline(
        content_tokenizer=content_tok, style_tokenizer=style_tok,
        ar=ar, fm=fm, vocoder=voc,
        params={"content_tokenizer": ct_params, "style_tokenizer": st_params,
                "ar": ar_params, "fm": fm_params, "vocoder": voc_params},
        hubert_extractor=ssl, mel_cfg=MEL,
    )
    svc = VevoService(pipe, max_batch=4, max_wait_ms=60.0, len_step=32,
                      max_content_len=256, max_prompt_len=128, max_new=32,
                      flow_matching_steps=2, cfg_scale=1.0,
                      compute_dtype="float32")
    yield svc
    svc.batcher.shutdown()


def _audio(seed, n=3200):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32) * 0.1


@pytest.mark.parametrize("mode", ["timbre", "voice"])
def test_vevo_service_batch_invariance(service, mode):
    src, ref = _audio(1), _audio(2, 2400)
    solo = service.synthesize(src, ref, mode=mode, seed=7)
    assert solo.ndim == 1 and len(solo) > 0

    results = {}

    def client(i, seed):
        results[i] = service.synthesize(_audio(seed), ref, mode=mode,
                                        seed=seed)

    threads = [threading.Thread(target=client, args=(i, s))
               for i, s in enumerate([7, 11, 13])]
    # seed 7 uses the same src audio as the solo call
    results[0] = None
    t0 = threading.Thread(
        target=lambda: results.update(
            {0: service.synthesize(src, ref, mode=mode, seed=7)}))
    t0.start()
    for t in threads[1:]:
        t.start()
    t0.join()
    for t in threads[1:]:
        t.join()
    # same length + same tokens; waveform to float tolerance (separate
    # XLA programs per batch size → reduction-order drift, see module doc)
    assert results[0].shape == solo.shape
    np.testing.assert_allclose(results[0], solo, rtol=0, atol=1e-5)
    assert all(len(results[i]) > 0 for i in results)


def test_vevo_service_stats(service):
    snap = service.stats()
    assert snap["completed"] >= 2


def test_vevo_service_int8_config(service):
    """The production quantized config (compute_dtype="int8" → int8
    weight streaming + int8 KV cache on the AR, bf16 FM) serves
    end-to-end through the same pipeline/batcher plumbing."""
    from amphion_tpu.serving.service import VevoService

    svc = VevoService(service.pipe, max_batch=2, max_wait_ms=20.0,
                      len_step=32, max_content_len=256, max_prompt_len=128,
                      max_new=32, flow_matching_steps=2, cfg_scale=1.0,
                      compute_dtype="int8")
    try:
        for mode in ("timbre", "voice"):
            wav = svc.synthesize(_audio(21), _audio(22, 2400), mode=mode,
                                 seed=5)
            assert wav.ndim == 1 and len(wav) > 0
            assert np.isfinite(wav).all()
    finally:
        svc.batcher.shutdown()
