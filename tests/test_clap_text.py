"""CLAP text tower oracle: our flax `ClapTextEncoder` + converter vs the
reference's vendored open_clip CLAP loaded by file path
(`models/tta/picoaudio/picoaudio/audioldm/clap/open_clip/model.py`),
with its unavailable heavy deps (torchlibrosa/torchvision/timm) stubbed
— only the TEXT branch is exercised, the audio branch is merely
constructed. Also pins the native CLIP BPE tokenizer against the
reference `tokenizer.py` on the reference's own merges file."""

import importlib
import sys
import types
from pathlib import Path

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = Path("/root/reference")
OPEN_CLIP = (REFERENCE / "models" / "tta" / "picoaudio" / "picoaudio"
             / "audioldm" / "clap" / "open_clip")
pytestmark = pytest.mark.skipif(
    not OPEN_CLIP.exists(), reason="reference tree not available")

from amphion_tpu.modules.clap_text import (  # noqa: E402
    ClapBPETokenizer,
    ClapTextConfig,
    ClapTextEncoder,
    clap_text_embed,
)
from amphion_tpu.utils.convert import clap_text_to_flax  # noqa: E402


def _stub(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref_clap_pkg():
    """Import the vendored open_clip as a package by path, stubbing the
    deps this container lacks (the `tests/test_mdx_net.py` pattern)."""
    import torch.nn as nn

    class _TLModule(nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()

        def forward(self, x):
            return x

    injected = []

    def inject(name, mod):
        if name not in sys.modules:
            sys.modules[name] = mod
            injected.append(name)

    tl = _stub("torchlibrosa")
    tl_stft = _stub("torchlibrosa.stft", Spectrogram=_TLModule,
                    LogmelFilterBank=_TLModule)
    tl_aug = _stub("torchlibrosa.augmentation", SpecAugmentation=_TLModule)
    tl.stft, tl.augmentation = tl_stft, tl_aug
    inject("torchlibrosa", tl)
    inject("torchlibrosa.stft", tl_stft)
    inject("torchlibrosa.augmentation", tl_aug)

    tv = _stub("torchvision")
    tv_ops = _stub("torchvision.ops")
    tv_misc = _stub("torchvision.ops.misc",
                    FrozenBatchNorm2d=nn.BatchNorm2d)
    tv.ops = tv_ops
    tv_ops.misc = tv_misc
    inject("torchvision", tv)
    inject("torchvision.ops", tv_ops)
    inject("torchvision.ops.misc", tv_misc)

    ftfy = _stub("ftfy", fix_text=lambda s: s)
    inject("ftfy", ftfy)

    pkg = types.ModuleType("_refclap")
    pkg.__path__ = [str(OPEN_CLIP)]
    inject("_refclap", pkg)
    try:
        yield importlib.import_module("_refclap.model"), "_refclap"
    finally:
        for name in list(sys.modules):
            if name.startswith("_refclap"):
                sys.modules.pop(name, None)
        for name in injected:
            sys.modules.pop(name, None)


CFG = ClapTextConfig(vocab_size=100, context_length=16, width=64, heads=4,
                     layers=2, joint_embed=32)


def _ref_model(ref_mod, mlp_act="relu", quick_gelu=False):
    audio_cfg = dict(
        model_type="PANN", model_name="Cnn6", sample_rate=16000,
        audio_length=1024, window_size=1024, hop_size=320, mel_bins=64,
        fmin=50, fmax=8000, class_num=10, clip_samples=16000)
    text_cfg = dict(context_length=CFG.context_length,
                    vocab_size=CFG.vocab_size, width=CFG.width,
                    heads=CFG.heads, layers=CFG.layers,
                    model_type="transformer")
    return ref_mod.CLAP(embed_dim=32, audio_cfg=audio_cfg,
                        text_cfg=text_cfg, quick_gelu=quick_gelu,
                        joint_embed_shape=CFG.joint_embed,
                        mlp_act=mlp_act).eval()


def _tokens(rng, b=3):
    toks = np.zeros((b, CFG.context_length), np.int64)
    for i in range(b):
        n = int(rng.integers(4, CFG.context_length))
        toks[i, :n] = rng.integers(1, CFG.vocab_size - 2, size=n)
        toks[i, n - 1] = CFG.vocab_size - 1  # EOT = highest id
    return toks


def test_clap_text_oracle(ref_clap_pkg):
    ref_mod, _ = ref_clap_pkg
    ref = _ref_model(ref_mod)
    rng = np.random.default_rng(0)
    toks = _tokens(rng)

    with torch.no_grad():
        want_raw = ref.encode_text(torch.from_numpy(toks),
                                   device="cpu").numpy()
        want_norm = torch.nn.functional.normalize(
            torch.from_numpy(want_raw), dim=-1).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = clap_text_to_flax(sd, num_layers=CFG.layers)
    model = ClapTextEncoder(CFG)
    # parameter-tree compatibility: init then replace
    init = model.init(jax.random.key(0), toks.astype(np.int32))["params"]
    assert jax.tree_util.tree_structure(init) == \
        jax.tree_util.tree_structure(jax.tree_util.tree_map(
            np.asarray, params))

    got_raw = np.asarray(model.apply({"params": params},
                                     toks.astype(np.int32),
                                     normalize=False))
    np.testing.assert_allclose(got_raw, want_raw, atol=2e-5, rtol=2e-4)
    got_norm = np.asarray(clap_text_embed(model, params,
                                          toks.astype(np.int32)))
    np.testing.assert_allclose(got_norm, want_norm, atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.linalg.norm(got_norm, axis=-1), 1.0,
                               atol=1e-5)


def test_clap_text_oracle_gelu_proj(ref_clap_pkg):
    """mlp_act="gelu" projection variant (model.py:455)."""
    ref_mod, _ = ref_clap_pkg
    ref = _ref_model(ref_mod, mlp_act="gelu")
    rng = np.random.default_rng(1)
    toks = _tokens(rng, b=2)
    with torch.no_grad():
        want = ref.encode_text(torch.from_numpy(toks), device="cpu").numpy()
    params = clap_text_to_flax(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        num_layers=CFG.layers)
    import dataclasses

    model = ClapTextEncoder(dataclasses.replace(CFG, mlp_act="gelu"))
    got = np.asarray(model.apply({"params": params}, toks.astype(np.int32),
                                 normalize=False))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_clap_bpe_tokenizer_matches_reference(ref_clap_pkg):
    _, pkg_name = ref_clap_pkg
    ref_tok_mod = importlib.import_module(f"{pkg_name}.tokenizer")
    bpe_path = OPEN_CLIP / "bpe_simple_vocab_16e6.txt.gz"
    ours = ClapBPETokenizer(str(bpe_path))
    texts = [
        "a dog barks twice then a car passes by",
        "Thunder, heavy RAIN and wind!",
        "cat meowing (loudly) -- 3 times...",
        "sizzling food while a kettle whistles",
    ]
    want = ref_tok_mod.tokenize(texts, context_length=77).numpy()
    got = ours(texts, context_length=77)
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_picoaudio_claptext_variant_runs():
    """ClapText wiring: a CLAP text embedding (width-matched by
    repeat_interleave, the reference ClapText context protocol) drives
    `picoaudio_sample` in place of the class embedding."""
    import jax.numpy as jnp

    from amphion_tpu.models.tta.audioldm import AudioLDMConfig
    from amphion_tpu.models.tta.picoaudio import (
        PicoAudio,
        PicoAudioConfig,
        picoaudio_sample,
    )

    clap = ClapTextEncoder(CFG)
    rng = np.random.default_rng(2)
    toks = _tokens(rng, b=1).astype(np.int32)
    cparams = clap.init(jax.random.key(0), toks)["params"]
    emb = clap_text_embed(clap, cparams, toks)  # (1, 32)

    text_dim = 64
    model = PicoAudio(PicoAudioConfig(
        ldm=AudioLDMConfig(latent_channels=4, base_channels=8,
                           channel_mults=(1, 2), attn_levels=(1,),
                           num_heads=2, text_dim=text_dim),
        onset_classes=8, event_classes=4))
    onset = jnp.zeros((1, 8, 16))
    shape = (1, 16, 4, 4)
    params = model.init(jax.random.key(1), jnp.zeros(shape),
                        jnp.zeros((1,), jnp.int32), onset,
                        jnp.zeros((1,), jnp.int32))["params"]
    ctx = jnp.repeat(emb, text_dim // emb.shape[-1], axis=-1)[:, None, :]
    z = picoaudio_sample(model, params, onset, np.asarray([0]), shape,
                         jax.random.key(3), num_steps=2,
                         text_emb=ctx, compute_dtype="float32")
    assert z.shape == shape and np.isfinite(np.asarray(z)).all()
