"""Round-trip tests for the checkpoint-ingestion CLI
(`bins/convert_checkpoint.py`): torch-save a random reference-format model
in the reference's own checkpoint formats (.pt state dict / HF
safetensors), convert through the CLI plumbing, restore through
`CheckpointManager.restore_raw`, and require the tree to match the direct
converter output exactly. Numeric forward parity of the converters
themselves is proven in `test_weight_conversion.py`; these tests pin the
ingestion path end to end (reference pull sites:
`models/tts/maskgct/maskgct_inference.py:33-64`,
`models/vc/vevo/vevo_utils.py:46-175`).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not available")

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="module", autouse=True)
def _ref_on_path():
    from tests._ref_oracle import install_ref_stubs, remove_ref_stubs

    stubs = install_ref_stubs()
    yield
    remove_ref_stubs(stubs)


def _tiny_t2s_state_dict():
    """Random reference-format MaskGCT T2S state dict (torch)."""
    from models.tts.maskgct.maskgct_t2s import MaskGCT_T2S

    torch.manual_seed(7)
    ref = MaskGCT_T2S(hidden_size=32, num_heads=4, num_layers=2,
                      cond_codebook_size=24).eval()
    return {k: v.detach().numpy() for k, v in ref.state_dict().items()}


def _trees_equal(a, b, path=""):
    assert sorted(a.keys()) == sorted(b.keys()), (
        f"{path}: {sorted(a)} != {sorted(b)}")
    for k in a:
        va, vb = a[k], b[k]
        if isinstance(va, dict):
            _trees_equal(va, vb, f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                          err_msg=f"{path}/{k}")


@pytest.fixture(scope="module")
def t2s_sd():
    return _tiny_t2s_state_dict()


def test_safetensors_roundtrip(tmp_path, t2s_sd):
    from safetensors.numpy import save_file

    from amphion_tpu.runtime.checkpoint import CheckpointManager
    from amphion_tpu.utils.convert import maskgct_t2s_to_flax
    from bins.convert_checkpoint import convert_one

    src = tmp_path / "model.safetensors"
    save_file(t2s_sd, str(src))
    out = tmp_path / "out"
    convert_one("maskgct_t2s", src, out, {"num_layers": 2})

    tree, epoch, step = CheckpointManager(out).restore_raw()
    direct = maskgct_t2s_to_flax(t2s_sd, num_layers=2)
    _trees_equal(tree["params"], direct)


def test_torch_pt_roundtrip(tmp_path, t2s_sd):
    from amphion_tpu.runtime.checkpoint import CheckpointManager
    from amphion_tpu.utils.convert import maskgct_t2s_to_flax
    from bins.convert_checkpoint import convert_one

    src = tmp_path / "model.pt"
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in t2s_sd.items()}, str(src))
    out = tmp_path / "out_pt"
    convert_one("maskgct_t2s", src, out, {"num_layers": 2})
    tree, _, _ = CheckpointManager(out).restore_raw()
    _trees_equal(tree["params"], maskgct_t2s_to_flax(t2s_sd, num_layers=2))


def test_bundle_snapshot_layout(tmp_path, t2s_sd):
    """A reference HF-snapshot-shaped dir converts into a per-component
    manifest; absent components are skipped, present ones land in
    restorable checkpoint dirs."""
    from safetensors.numpy import save_file

    from amphion_tpu.runtime.checkpoint import CheckpointManager
    from bins.convert_checkpoint import convert_bundle

    snap = tmp_path / "MaskGCT"
    (snap / "t2s_model").mkdir(parents=True)
    save_file(t2s_sd, str(snap / "t2s_model" / "model.safetensors"))
    out = tmp_path / "converted"
    manifest = convert_bundle(
        "maskgct", snap, out,
        kw_json=json.dumps({"t2s": {"num_layers": 2}}))
    assert list(manifest) == ["t2s"]
    assert json.loads((out / "manifest.json").read_text()) == manifest
    tree, _, _ = CheckpointManager(out / "t2s").restore_raw()
    assert "params" in tree and "cond_emb" in tree["params"]


def test_amphion_codec_vocos_decoder_roundtrip(tmp_path):
    """The published MaskGCT acoustic codec: encoder safetensors + decoder
    (Vocos head + FVQ quantizer) safetensors → full AmphionCodec params
    through the CLI; decode_codes matches the reference quantizer+Vocos
    path (ref codec.py:372 use_vocos / maskgct_inference.py:44-52)."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
    from amphion_tpu.runtime.checkpoint import CheckpointManager
    from bins.convert_checkpoint import convert_one
    from models.codec.amphion_codec.codec import (
        CodecDecoder as RefDecoder,
        CodecEncoder as RefEncoder,
    )

    torch.manual_seed(11)
    enc = RefEncoder(d_model=4, up_ratios=[2, 5], out_channels=8).eval()
    dec = RefDecoder(in_channels=8, num_quantizers=2, codebook_size=16,
                     codebook_dim=4, quantizer_type="fvq", use_vocos=True,
                     vocos_dim=12, vocos_intermediate_dim=24,
                     vocos_num_layers=2, n_fft=16, hop_size=10,
                     padding="same").eval()
    with torch.no_grad():
        for n, p in enc.named_parameters():
            if n.endswith("alpha"):
                p.copy_(torch.rand_like(p) + 0.5)

    snap = tmp_path / "acoustic_codec"
    snap.mkdir()
    save_file({k: v.detach().numpy() for k, v in enc.state_dict().items()},
              str(snap / "model.safetensors"))
    save_file({k: v.detach().numpy() for k, v in dec.state_dict().items()},
              str(snap / "model_1.safetensors"))
    out = tmp_path / "codec"
    convert_one("amphion_codec", snap, out,
                {"strides": (2, 5), "num_quantizers": 2,
                 "vocos_num_layers": 2})
    tree, _, _ = CheckpointManager(out).restore_raw()

    ours = AmphionCodec(CodecConfig(
        encoder_dim=4, latent_dim=8, strides=(2, 5), num_quantizers=2,
        codebook_size=16, codebook_dim=4, use_vocos_decoder=True,
        vocos_dim=12, vocos_intermediate_dim=24, vocos_num_layers=2,
        vocos_n_fft=16, vocos_hop=10))
    codes = np.random.default_rng(0).integers(0, 16, (2, 1, 6))
    wav = np.asarray(ours.apply({"params": tree["params"]},
                                jnp.asarray(codes),
                                method=AmphionCodec.decode_codes))

    with torch.no_grad():
        zq = dec.vq2emb(torch.from_numpy(codes))  # (B, C, T)
        ref_wav = dec(zq).numpy()
    assert wav.shape[-1] == ref_wav.shape[-1], (wav.shape, ref_wav.shape)
    np.testing.assert_allclose(wav, ref_wav.reshape(wav.shape), atol=2e-4)


def test_vocoder_wrap_loads_through_load_vocoder(tmp_path):
    """hifigan conversions use the GAN state layout {"g": {"params"}} and
    load through the shared `load_vocoder` helper given a --vocoder_config."""
    import jax.numpy as jnp

    from bins.convert_checkpoint import convert_one
    from amphion_tpu.runtime.vocoder_trainer import load_vocoder
    from models.vocoders.gan.generator.hifigan import HiFiGAN

    class A:  # reference HiFiGAN config shim (as in test_weight_conversion)
        pass

    cfg = A()
    cfg.model = A()
    cfg.model.hifigan = A()
    cfg.model.hifigan.resblock = "1"
    cfg.model.hifigan.upsample_rates = [4, 4]
    cfg.model.hifigan.upsample_kernel_sizes = [8, 8]
    cfg.model.hifigan.upsample_initial_channel = 32
    cfg.model.hifigan.resblock_kernel_sizes = [3]
    cfg.model.hifigan.resblock_dilation_sizes = [[1, 3, 5]]
    cfg.preprocess = A()
    cfg.preprocess.n_mel = 8
    torch.manual_seed(3)
    ref = HiFiGAN(cfg).eval()  # keep weight_norm: the published ckpt format
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    src = tmp_path / "g.pt"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(src))
    out = tmp_path / "voc"
    convert_one("hifigan", src, out,
                {"num_upsamples": 2, "num_kernels": 1})

    voc_cfg = tmp_path / "voc_config.json"
    voc_cfg.write_text(json.dumps({
        "model": {"generator": "hifigan", "hifigan": {
            "resblock": "1", "upsample_rates": [4, 4],
            "upsample_kernel_sizes": [8, 8], "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3, 5]]}},
    }))
    fn, hop = load_vocoder(out, 8, str(voc_cfg))
    assert hop == 16
    mel = jnp.zeros((1, 12, 8), jnp.float32)
    wav = np.asarray(fn(mel))
    assert wav.shape[-1] == 12 * 16

    with torch.no_grad():
        ref_wav = ref(torch.zeros(1, 8, 12)).numpy()
    np.testing.assert_allclose(wav.reshape(-1), ref_wav.reshape(-1),
                               atol=2e-4)
