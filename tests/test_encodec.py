"""EnCodec 24 kHz: token-exact oracle vs transformers `EncodecModel`
(the weight-compatible port of the `encodec` package the reference's
AudioTokenizer loads — `/root/reference/utils/tokenizer.py:18-77`), plus
the AudioTokenizer facade and the valle_ref end-to-end round trip
(VERDICT r3 directive #3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def torch_encodec():
    """Full encodec_24khz architecture, random-init, seeded; codebooks
    randomized (HF random-init leaves them k-means-uninitialized)."""
    from transformers import EncodecConfig, EncodecModel

    torch.manual_seed(0)
    m = EncodecModel(EncodecConfig())
    with torch.no_grad():
        for i, layer in enumerate(m.quantizer.layers):
            g = torch.Generator().manual_seed(100 + i)
            layer.codebook.embed.copy_(
                torch.randn(layer.codebook.embed.shape, generator=g))
    m.eval()
    return m


@pytest.fixture(scope="module")
def flax_encodec(torch_encodec):
    from amphion_tpu.models.codec.encodec import EncodecConfig, EncodecModel
    from amphion_tpu.utils.convert import hf_encodec_to_flax

    sd = {k: v.detach().numpy() for k, v in torch_encodec.state_dict().items()}
    params = hf_encodec_to_flax(sd)
    return EncodecModel(EncodecConfig()), params


def test_encodec_encode_token_exact(torch_encodec, flax_encodec):
    model, params = flax_encodec
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((2, 3200)).astype(np.float32) * 0.3

    with torch.no_grad():
        out = torch_encodec.encode(torch.from_numpy(wav)[:, None, :],
                                   bandwidth=6.0)
    ref_codes = out.audio_codes[0].numpy()  # (B, Q, N)

    codes = np.asarray(model.apply({"params": params}, jnp.asarray(wav),
                                   method=EncodecModelType.encode))
    assert codes.shape == (8, 2, 10)
    np.testing.assert_array_equal(codes.transpose(1, 0, 2), ref_codes)


def test_encodec_decode_matches_torch(torch_encodec, flax_encodec):
    model, params = flax_encodec
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 1024, size=(2, 8, 12))  # (B, Q, N)

    with torch.no_grad():
        ref = torch_encodec.decode(
            torch.from_numpy(codes)[None], [None]).audio_values
    ref = ref[:, 0].numpy()

    wav = np.asarray(model.apply(
        {"params": params}, jnp.asarray(codes.transpose(1, 0, 2)),
        method=EncodecModelType.decode_codes))
    assert wav.shape == ref.shape == (2, 12 * 320)
    np.testing.assert_allclose(wav, ref, atol=2e-4)


def test_encodec_forward_and_ragged_decode(flax_encodec):
    model, params = flax_encodec
    rng = np.random.default_rng(3)
    wav = rng.standard_normal((1, 1600)).astype(np.float32) * 0.3
    recon, codes, losses = model.apply({"params": params},
                                       jnp.asarray(wav))
    assert recon.shape == (1, 1600) and codes.shape == (8, 1, 5)
    assert np.isfinite(float(losses["vq_commit"]))

    # ragged decode: masked rows equal their solo decode
    codes2 = rng.integers(0, 1024, size=(8, 2, 10))
    fl = jnp.asarray([10, 6], jnp.int32)
    batched = np.asarray(model.apply(
        {"params": params}, jnp.asarray(codes2), fl,
        method=EncodecModelType.decode_codes))
    solo = np.asarray(model.apply(
        {"params": params}, jnp.asarray(codes2[:, 1:2, :6]),
        method=EncodecModelType.decode_codes))
    np.testing.assert_allclose(batched[1, :6 * 320], solo[0], atol=1e-5)
    assert np.all(batched[1, 6 * 320:] == 0)


def test_audio_tokenizer_encodec_backend(flax_encodec):
    """utils.tokenizer.AudioTokenizer drives the EnCodec backend — the
    reference-pipeline token space behind the VALL-E facade."""
    from amphion_tpu.utils.tokenizer import AudioTokenizer

    model, params = flax_encodec
    tok = AudioTokenizer(model, params, sample_rate=24000)
    rng = np.random.default_rng(4)
    wav = rng.standard_normal(3200).astype(np.float32) * 0.3
    codes = tok.encode(wav)
    assert codes.shape == (1, 8, 10)
    out = tok.decode(codes)
    assert out.shape == (1, 3200)
    # direct-encode parity through the facade
    direct = np.asarray(model.apply({"params": params}, jnp.asarray(wav)[None],
                                    method=EncodecModelType.encode))
    np.testing.assert_array_equal(codes[0], direct[:, 0])


def test_valle_ref_encodec_end_to_end(torch_encodec, flax_encodec):
    """The last reference-pipeline gap (VERDICT r3 'missing' #1): the
    checkpoint-compatible VALL-E operates IN the EnCodec token space end
    to end — prompt tokens from EnCodec encode, AR (ref stop rule) + NAR
    (sequential codebooks) generate, and the full (1, T, 8) code grid
    renders through the codec with the flax waveform matching a torch
    re-execution of the same codes."""
    from amphion_tpu.models.tts.valle.valle_ref import (
        ValleRef,
        ValleRefConfig,
        valle_ref_ar_generate,
        valle_ref_nar_generate,
    )

    model, params = flax_encodec
    rng = np.random.default_rng(5)
    prompt_wav = rng.standard_normal(3200).astype(np.float32) * 0.3
    prompt_codes = np.asarray(model.apply(
        {"params": params}, jnp.asarray(prompt_wav)[None],
        method=EncodecModelType.encode))  # (8, 1, 10)
    prompt_bnq = jnp.asarray(prompt_codes.transpose(1, 2, 0))  # (1, 10, 8)

    cfg = ValleRefConfig(text_token_num=32, audio_token_num=1024,
                         decoder_dim=64, nhead=2, num_decoder_layers=2)
    vm = ValleRef(cfg)
    text = jnp.asarray([[3, 5, 7, 9]])
    y0 = prompt_bnq[:, :, 0]
    key = jax.random.key(0)
    p_ar = vm.init(key, text, y0, jnp.ones((1, 4)),
                   jnp.ones((1, y0.shape[1])),
                   method=ValleRef.ar_logits)["params"]
    vparams = dict(p_ar)
    for stage in range(1, 8):  # each stage binds its own embeds/head
        p_nar = vm.init(key, text, jnp.zeros((1, 12, 8), jnp.int32), stage,
                        jnp.ones((1, 4)), jnp.ones((1, 12)), 6,
                        method=ValleRef.nar_logits)["params"]
        for k, v in p_nar.items():
            vparams.setdefault(k, v)

    ar = valle_ref_ar_generate(vm, vparams, text, y0, max_new=8)
    assert ar.shape[0] == 1 and ar.shape[1] >= 1
    codes = valle_ref_nar_generate(vm, vparams, text, ar, prompt_bnq)
    codes = np.asarray(codes)  # (1, T, 8)
    assert codes.shape[2] == 8
    assert codes.min() >= 0 and codes.max() < 1024

    # render through EnCodec: flax == torch re-execution, token-exact in
    wav = np.asarray(model.apply(
        {"params": params}, jnp.asarray(codes.transpose(2, 0, 1)),
        method=EncodecModelType.decode_codes))
    with torch.no_grad():
        ref = torch_encodec.decode(
            torch.from_numpy(codes.transpose(0, 2, 1).copy())[None],
            [None]).audio_values[:, 0].numpy()
    np.testing.assert_allclose(wav, ref, atol=2e-4)


from amphion_tpu.models.codec.encodec import EncodecModel as EncodecModelType


def test_extract_codes_encodec_backend(tmp_path):
    """bins/tts/preprocess.extract_codes with model.codec.type="encodec"
    tokenizes a corpus into the reference VALL-E token space."""
    import types

    from amphion_tpu.data.audio_io import save_wav
    from amphion_tpu.utils.config import JsonHParams
    from amphion_tpu.utils.logging import get_logger
    from bins.tts.preprocess import extract_codes

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    utts = []
    for i in range(2):
        x = rng.standard_normal(2400).astype(np.float32) * 0.2
        save_wav(wav_dir / f"u{i}.wav", x, 24000)
        utts.append(types.SimpleNamespace(uid=f"u{i}",
                                          path=str(wav_dir / f"u{i}.wav")))
    cfg = JsonHParams(**{
        "preprocess": {"sample_rate": 24000},
        "model": {"codec": {"type": "encodec", "num_quantizers": 8}},
    })
    extract_codes(utts, tmp_path, cfg, "", get_logger("t"))
    codes = np.load(tmp_path / "codes" / "u0.npy")
    assert codes.shape[0] == 8 and codes.shape[1] == 2400 // 320
    assert codes.dtype == np.int32
    assert (codes >= 0).all() and (codes < 1024).all()
