import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.models.codec.amphion_codec import CodecConfig
from amphion_tpu.models.codec.coco import CocoCodec, CocoConfig, coco_style
from amphion_tpu.models.codec.dualcodec import DualCodec, DualCodecConfig
from amphion_tpu.models.codec.facodec import FACodec, FACodecConfig, gradient_reversal

TINY_CODEC = CodecConfig(
    sample_rate=8000, encoder_dim=4, latent_dim=8, decoder_dim=4,
    strides=(2, 4), num_quantizers=2, codebook_size=32, codebook_dim=4,
)


def test_gradient_reversal():
    f = lambda x: jnp.sum(gradient_reversal(x, 2.0) ** 2 / 2)
    x = jnp.asarray([1.0, 2.0])
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), [-2.0, -4.0])


def test_facodec_forward_and_vc(rng):
    cfg = FACodecConfig(
        codec=TINY_CODEC, codebook_size=16, codebook_dim=4, timbre_dim=8,
        num_speakers=4, timbre_layers=1, timbre_heads=2, timbre_filter=16,
    )
    model = FACodec(cfg)
    audio = jnp.asarray((rng.standard_normal((2, 16 * TINY_CODEC.hop)) * 0.2).astype(np.float32))
    sid = jnp.asarray([0, 1])
    variables = model.init(jax.random.key(0), audio, sid)
    recon, codes, timbre, losses = model.apply(variables, audio, sid)
    assert recon.shape == audio.shape
    assert timbre.shape == (2, 8)
    assert "spk_adv" in losses and np.isfinite(float(losses["spk_adv"]))
    vc = model.apply(variables, audio, audio[::-1], method=FACodec.voice_conversion)
    assert vc.shape == audio.shape


def test_coco_modes(rng):
    feats = jnp.asarray(rng.standard_normal((2, 16, 12)).astype(np.float32))
    f0 = jnp.full((2, 16), 220.0)
    for mode, kwargs in [
        ("contentstyle", dict(content_feats=feats, f0=f0)),
        ("content", dict(content_feats=feats)),
        ("style", dict(f0=f0)),
    ]:
        cfg = CocoConfig(mode=mode, feature_dim=12, hidden=16, codebook_size=32,
                         codebook_dim=4, downsample=2, num_blocks=1)
        model = CocoCodec(cfg)
        variables = model.init(jax.random.key(0), **kwargs)
        recon, tokens, losses = model.apply(variables, **kwargs)
        assert tokens.shape == (2, 8)
        toks = model.apply(variables, method=CocoCodec.encode, **kwargs)
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(tokens))
    assert coco_style().codebook_size == 512


def test_dualcodec_distillation(rng):
    cfg = DualCodecConfig(
        codec=TINY_CODEC, semantic_dim=12, semantic_codebook_size=32,
        semantic_codebook_dim=4, convnext_dim=8, convnext_layers=1,
    )
    model = DualCodec(cfg)
    audio = jnp.asarray((rng.standard_normal((2, 16 * TINY_CODEC.hop)) * 0.2).astype(np.float32))
    sem = jnp.asarray(rng.standard_normal((2, 16, 12)).astype(np.float32))
    variables = model.init(jax.random.key(0), audio, sem)
    recon, (sem_tok, ac_tok), losses = model.apply(variables, audio, sem)
    assert recon.shape == audio.shape
    assert sem_tok.shape == (2, 16)
    assert ac_tok.shape == (2, 2, 16)  # all acoustic quantizers
    assert "distill" in losses
    # decode from tokens only (both streams and semantic-only)
    full = model.apply(variables, sem_tok, ac_tok, method=DualCodec.decode_tokens)
    sem_only = model.apply(variables, sem_tok, method=DualCodec.decode_tokens)
    assert full.shape == audio.shape and sem_only.shape == audio.shape


def test_speechtokenizer_forward_encode_decode():
    from amphion_tpu.models.codec.speechtokenizer import (
        SpeechTokenizer, SpeechTokenizerConfig)

    cfg = SpeechTokenizerConfig(
        codec=TINY_CODEC, n_q=3, codebook_size=16, codebook_dim=4,
        semantic_dimension=12, lstm_layers=1, bidirectional=True,
    )
    model = SpeechTokenizer(cfg)
    audio = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 8 * cfg.hop)).astype(np.float32))
    params = model.init(jax.random.key(0), audio)["params"]

    recon, codes, semantic, losses = model.apply({"params": params}, audio)
    assert recon.shape == audio.shape
    assert codes.shape == (3, 2, 8)
    assert semantic.shape == (2, 8, 12)  # RVQ-1 projected to semantic dim
    assert "vq_commit" in losses

    # st-based encode/decode: acoustic-only tokens skip the semantic layer
    all_codes = model.apply({"params": params}, audio, method=SpeechTokenizer.encode)
    assert all_codes.shape == (3, 2, 8)
    np.testing.assert_array_equal(np.asarray(all_codes), np.asarray(codes))
    ac_codes = model.apply({"params": params}, audio, 3, 1,
                           method=SpeechTokenizer.encode)
    assert ac_codes.shape == (2, 2, 8)
    np.testing.assert_array_equal(np.asarray(ac_codes), np.asarray(codes[1:]))
    wav_full = model.apply({"params": params}, all_codes,
                           method=SpeechTokenizer.decode)
    assert wav_full.shape == audio.shape
    wav_ac = model.apply({"params": params}, ac_codes, 1,
                         method=SpeechTokenizer.decode)
    assert wav_ac.shape == audio.shape
    assert not np.allclose(np.asarray(wav_full), np.asarray(wav_ac))
