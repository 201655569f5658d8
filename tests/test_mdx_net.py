"""Oracle + behavior tests for the native MDX-Net (Conv-TDF) separator.

The reference's network is an opaque ONNX graph, but everything around it
is torch code in-tree (`preprocessors/Emilia/models/separate_fast.py`):
the 4-channel stereo STFT packing, the istft re-pad, and the
chunk/margin/trim demix protocol. Those are pinned here against the
reference's own `ConvTDFNet`/`Predictor` (with the ONNX session replaced
by a linear stub on BOTH sides, making the protocols exactly comparable).
The flax network itself is checked for shape contract + trainability.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not available")

from amphion_tpu.models.mdx_net import (  # noqa: E402
    ConvTDFNet,
    MDXConfig,
    MDXSeparator,
    mdx_istft,
    mdx_stft,
    mdx_train_step,
)

# small-but-real STFT geometry (full size would be slow on the CPU core)
SMALL = MDXConfig(n_fft=512, hop=128, dim_f=200, dim_t_log2=5)


class _StubSession:
    """ONNX session stand-in: a fixed linear map on the packed spec."""

    def __init__(self, path=None, providers=None):
        pass

    def run(self, _out, feed):
        return [0.5 * feed["input"]]


@pytest.fixture(scope="module")
def ref_separate():
    # Load by file path: `from models import separate_fast` would resolve
    # against whichever `models` package an earlier oracle test imported
    # (the reference ROOT has one too), shadowing Emilia's in full-suite
    # runs. spec_from_file_location sidesteps sys.path entirely.
    import importlib.util

    stub = types.ModuleType("onnxruntime")
    stub.InferenceSession = _StubSession
    injected = "onnxruntime" not in sys.modules
    if injected:
        sys.modules["onnxruntime"] = stub
    path = REFERENCE / "preprocessors" / "Emilia" / "models" / "separate_fast.py"
    spec = importlib.util.spec_from_file_location("_emilia_separate_fast", path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
        yield mod
    finally:
        if injected:
            sys.modules.pop("onnxruntime", None)


def test_stft_packing_oracle(ref_separate):
    """mdx_stft == the reference ConvTDFNet.stft channel packing."""
    ref = ref_separate.ConvTDFNet(
        target_name="vocals", L=11, dim_f=SMALL.dim_f,
        dim_t=SMALL.dim_t_log2, n_fft=SMALL.n_fft, hop=SMALL.hop)
    rng = np.random.default_rng(0)
    waves = rng.standard_normal((3, 2, SMALL.chunk_size)).astype(np.float32)
    want = ref.stft(torch.from_numpy(waves)).numpy()  # (B, 4, dim_f, T)
    got = np.asarray(mdx_stft(waves, SMALL)).transpose(0, 3, 2, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_istft_oracle(ref_separate):
    """mdx_istft == the reference ConvTDFNet.istft (freq re-pad + torch
    center istft)."""
    ref = ref_separate.ConvTDFNet(
        target_name="vocals", L=11, dim_f=SMALL.dim_f,
        dim_t=SMALL.dim_t_log2, n_fft=SMALL.n_fft, hop=SMALL.hop)
    rng = np.random.default_rng(1)
    spec_ref = rng.standard_normal(
        (2, 4, SMALL.dim_f, SMALL.dim_t)).astype(np.float32) * 0.1
    want = ref.istft(torch.from_numpy(spec_ref)).numpy()  # (B, 2, chunk)
    got = np.asarray(mdx_istft(
        spec_ref.transpose(0, 3, 2, 1), SMALL))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_roundtrip():
    """istft(stft(x)) reconstructs the interior exactly (dim_f = full
    bins keeps all content)."""
    cfg = MDXConfig(n_fft=512, hop=128, dim_f=257, dim_t_log2=5)
    rng = np.random.default_rng(2)
    w = rng.standard_normal((1, 2, cfg.chunk_size)).astype(np.float32)
    back = np.asarray(mdx_istft(mdx_stft(w, cfg), cfg))
    np.testing.assert_allclose(back, w, rtol=0, atol=1e-4)


def test_demix_protocol_oracle(ref_separate):
    """Full Predictor.predict protocol (chunk walk, margins, trim,
    denoise, tail cut) == the reference, with the same linear 'network'
    on both sides."""
    import jax.numpy as jnp

    args = {"model_path": "stub", "denoise": True, "margin": 44100,
            "chunks": 1, "n_fft": SMALL.n_fft, "dim_t": SMALL.dim_t_log2,
            "dim_f": SMALL.dim_f}
    ref_pred = ref_separate.Predictor(args=args, device="cpu")
    # the reference hard-codes hop=1024 in Predictor; rebuild its model_
    ref_pred.model_ = ref_separate.ConvTDFNet(
        target_name="vocals", L=11, dim_f=SMALL.dim_f,
        dim_t=SMALL.dim_t_log2, n_fft=SMALL.n_fft, hop=SMALL.hop)

    def linear_apply(waves):  # our side: same 0.5x map through our stft
        return mdx_istft(0.5 * mdx_stft(jnp.asarray(waves), SMALL), SMALL)

    ours = MDXSeparator(None, SMALL, margin=44100, chunks=1, denoise=True,
                        apply_fn=linear_apply)
    rng = np.random.default_rng(3)
    mix = (rng.standard_normal((2, 100_000)) * 0.3).astype(np.float32)
    want_v, want_t = ref_pred.predict(mix.copy())
    got_v, got_t = ours.predict(mix.copy())
    assert got_v.shape == want_v.shape and got_t.shape == want_t.shape
    np.testing.assert_allclose(got_t, want_t, rtol=0, atol=5e-4)
    np.testing.assert_allclose(got_v, want_v, rtol=0, atol=5e-4)


TINY = MDXConfig(n_fft=128, hop=32, dim_f=48, dim_t_log2=4,
                 num_blocks=5, conv_depth=1, growth=4, bottleneck=4)


def test_network_shape_and_train():
    """ConvTDFNet maps packed spec to packed spec; a few optimizer steps
    reduce the separation loss on a toy linear task."""
    import jax
    import optax

    model = ConvTDFNet(TINY)
    rng = np.random.default_rng(4)
    mix = rng.standard_normal((2, 2, TINY.chunk_size)).astype(np.float32)
    target = (0.5 * mix).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           mdx_stft(mix, TINY), train=True)
    out = model.apply(variables, mdx_stft(mix, TINY))
    assert out.shape == (2, TINY.dim_t, TINY.dim_f, 4)

    opt = optax.adam(3e-3)
    params, stats = variables["params"], variables["batch_stats"]
    step = mdx_train_step(model, opt)
    opt_state = opt.init(params)
    losses = []
    for _ in range(8):
        params, stats, opt_state, loss = step(params, stats, opt_state,
                                              mix, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_emilia_separator_slot():
    """make_mdx_separator: mono pipeline audio in/out at the pipeline
    rate, running the real (random-init) tiny network."""
    import jax

    from amphion_tpu.data.emilia.stages import make_mdx_separator

    model = ConvTDFNet(TINY)
    rng = np.random.default_rng(5)
    probe = mdx_stft(np.zeros((1, 2, TINY.chunk_size), np.float32), TINY)
    variables = model.init(jax.random.PRNGKey(1), probe, train=True)
    sep = make_mdx_separator(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, TINY, sr=24000,
        chunks=1, denoise=False)
    x = (rng.standard_normal(24000) * 0.2).astype(np.float32)
    y = sep(x)
    assert y.shape == x.shape and np.isfinite(y).all()
