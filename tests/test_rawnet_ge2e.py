"""Oracle tests for the native RawNet3 and GE2E (Resemblyzer) speaker
embedders against the reference torch code.

RawNet3: the reference model (`evaluation/metrics/similarity/models/
RawNetModel.py`) is instantiated directly — its Res2Net trunk, AFMS and
attentive pooling are the true reference code. Its sinc front end comes
from `asteroid_filterbanks` (absent here), so the test injects a faithful
torch implementation of `Encoder(ParamSincFB(...))` built from the
published SincNet/asteroid formulation (analytic cos/sin bandpass pairs
from |low_hz_| / |band_hz_| params, half-Hamming window, 1/(2*band)
normalization) — the same formulation `models/rawnet3.sinc_filters`
implements, so the parity check pins our flax trunk against the reference
trunk and our sinc math against an independent torch realization.

GE2E: resemblyzer's VoiceEncoder is nn.LSTM(40, 256, 3) + Linear + ReLU +
L2 norm; replicated in torch here and matched through torch_ge2e_to_flax.
"""

import math
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not available")


# ---------------------------------------------------------------------------
# torch ParamSincFB (asteroid formulation) — injected as the missing dep
# ---------------------------------------------------------------------------


class _ParamSincFB(nn.Module):
    def __init__(self, n_filters, kernel_size, stride=1,
                 sample_rate=16000.0, min_low_hz=50, min_band_hz=50):
        super().__init__()
        if kernel_size % 2 == 0:
            kernel_size += 1
        self.n_filters, self.kernel_size, self.stride = (
            n_filters, kernel_size, stride)
        self.sample_rate = sample_rate
        self.min_low_hz, self.min_band_hz = min_low_hz, min_band_hz
        self.half_kernel = kernel_size // 2
        self.cutoff = n_filters // 2
        to_mel = lambda hz: 2595 * np.log10(1 + hz / 700)
        to_hz = lambda mel: 700 * (10 ** (mel / 2595) - 1)
        low_hz = 30
        high_hz = sample_rate / 2 - (min_low_hz + min_band_hz)
        hz = to_hz(np.linspace(to_mel(low_hz), to_mel(high_hz),
                               self.cutoff + 1))
        self.low_hz_ = nn.Parameter(
            torch.from_numpy(hz[:-1]).float().view(-1, 1))
        self.band_hz_ = nn.Parameter(
            torch.from_numpy(np.diff(hz)).float().view(-1, 1))
        self.register_buffer("window_", torch.from_numpy(
            np.hamming(kernel_size)[: self.half_kernel]).float())
        self.register_buffer("n_", 2 * math.pi * torch.arange(
            -self.half_kernel, 0.0).view(1, -1) / sample_rate)

    def _make(self, low, high, kind):
        band = (high - low)[:, 0]
        ft_low = torch.matmul(low, self.n_)
        ft_high = torch.matmul(high, self.n_)
        if kind == "cos":
            left = ((torch.sin(ft_high) - torch.sin(ft_low))
                    / (self.n_ / 2)) * self.window_
            center = 2 * band.view(-1, 1)
            right = torch.flip(left, dims=[1])
        else:
            left = ((torch.cos(ft_low) - torch.cos(ft_high))
                    / (self.n_ / 2)) * self.window_
            center = torch.zeros_like(band.view(-1, 1))
            right = -torch.flip(left, dims=[1])
        bp = torch.cat([left, center, right], dim=1) / (2 * band[:, None])
        return bp.view(self.cutoff, 1, self.kernel_size)

    def filters(self):
        low = self.min_low_hz + torch.abs(self.low_hz_)
        high = torch.clamp(low + self.min_band_hz + torch.abs(self.band_hz_),
                           self.min_low_hz, self.sample_rate / 2)
        return torch.cat([self._make(low, high, "cos"),
                          self._make(low, high, "sin")], dim=0)


class _Encoder(nn.Module):
    def __init__(self, filterbank):
        super().__init__()
        self.filterbank = filterbank

    def forward(self, x):
        if x.dim() == 2:
            x = x.unsqueeze(1)
        return torch.nn.functional.conv1d(
            x, self.filterbank.filters(), stride=self.filterbank.stride)


@pytest.fixture(scope="module")
def ref_rawnet_module():
    stub = types.ModuleType("asteroid_filterbanks")
    stub.Encoder, stub.ParamSincFB = _Encoder, _ParamSincFB
    injected = "asteroid_filterbanks" not in sys.modules
    if injected:
        sys.modules["asteroid_filterbanks"] = stub
    sys.path.insert(0, str(REFERENCE))
    try:
        from evaluation.metrics.similarity.models.RawNetBasicBlock import (
            Bottle2neck)
        from evaluation.metrics.similarity.models.RawNetModel import RawNet3
        yield RawNet3, Bottle2neck
    finally:
        sys.path.remove(str(REFERENCE))
        if injected:
            sys.modules.pop("asteroid_filterbanks", None)


def _randomize_bn_stats(model, gen):
    """Non-trivial running stats so eval-mode BN is actually pinned."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm1d):
            m.running_mean.copy_(0.3 * torch.randn(
                m.running_mean.shape, generator=gen))
            m.running_var.copy_(1.0 + 0.3 * torch.rand(
                m.running_var.shape, generator=gen))


class TestRawNet3:
    C = 64  # tiny: C//4=16 sinc filters, scale 4 -> width 16

    def _pair(self, ref_rawnet_module):
        RawNet3, Bottle2neck = ref_rawnet_module
        torch.manual_seed(0)
        ref = RawNet3(
            Bottle2neck, model_scale=4, context=True, summed=True,
            C=self.C, nOut=24, encoder_type="ECA", log_sinc=True,
            norm_sinc="mean", out_bn=False, sinc_stride=10,
        ).eval()
        gen = torch.Generator().manual_seed(1)
        with torch.no_grad():
            for p in ref.parameters():
                if p.dim() > 0:
                    p.copy_(0.2 * torch.randn(p.shape, generator=gen))
            # keep sinc cutoffs physical
            ref.conv1.filterbank.low_hz_.abs_()
            ref.conv1.filterbank.band_hz_.abs_()
            _randomize_bn_stats(ref, gen)

        from amphion_tpu.models.rawnet3 import RawNet3 as FlaxRawNet3
        from amphion_tpu.models.rawnet3 import RawNet3Config
        from amphion_tpu.utils.convert import torch_rawnet3_to_flax

        cfg = RawNet3Config(channels=self.C, model_scale=4, embed_dim=24)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params, stats = torch_rawnet3_to_flax(sd, model_scale=4)
        return ref, FlaxRawNet3(cfg), params, stats

    def test_forward_parity(self, ref_rawnet_module):
        # Tolerance note: log_sinc takes log(|conv|+1e-6); where the sinc
        # conv output dips to ~1e-5 the log's 1/x slope amplifies inherent
        # f32 conv noise (~1.4e-5 measured, identical math both sides) by
        # ~1e5, so exact f32 parity is unattainable past the front end.
        # Assert a loose elementwise bound + tight per-row cosine sim.
        ref, ours, params, stats = self._pair(ref_rawnet_module)
        rng = np.random.default_rng(2)
        audio = rng.standard_normal((2, 4800), dtype=np.float32) * 0.3
        with torch.no_grad():
            want = ref(torch.from_numpy(audio)).numpy()
        got = np.asarray(ours.apply(
            {"params": params, "batch_stats": stats}, audio))
        assert got.shape == want.shape == (2, 24)
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-2)
        cos = np.sum(got * want, axis=1) / (
            np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
        assert (cos > 0.99999).all(), cos

    def test_sinc_filters_match_torch_realization(self, ref_rawnet_module):
        """Our jnp sinc materialization == the torch stub's filters()."""
        ref, _, params, _ = self._pair(ref_rawnet_module)
        import jax.numpy as jnp

        from amphion_tpu.models.rawnet3 import sinc_filters

        want = ref.conv1.filterbank.filters().detach().numpy()[:, 0, :]
        got = np.asarray(sinc_filters(
            jnp.asarray(params["sinc"]["low_hz_"]),
            jnp.asarray(params["sinc"]["band_hz_"]),
            251, 16000.0, 50.0, 50.0))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    def test_embed_utterance_protocol(self, ref_rawnet_module):
        """Wrap-pad + 10 linspace crops + mean == reference
        extract_rawnet_speaker_embd (speaker_similarity.py:22-48)."""
        ref, ours, params, stats = self._pair(ref_rawnet_module)
        import jax

        from amphion_tpu.models.rawnet3 import embed_utterance

        rng = np.random.default_rng(3)
        audio = rng.standard_normal(7000).astype(np.float32) * 0.3
        n_samples, n_segments = 4800, 4
        a = np.pad(audio, (0, 0), "wrap")
        crops = []
        for s in np.linspace(0, len(a) - n_samples, num=n_segments):
            crops.append(a[int(s): int(s) + n_samples])
        with torch.no_grad():
            want = ref(torch.from_numpy(np.stack(crops))).numpy().mean(0)
        fwd = jax.jit(lambda au: ours.apply(
            {"params": params, "batch_stats": stats}, au))
        got = embed_utterance(fwd, audio, n_crop=n_samples,
                              n_segments=n_segments)
        # loose elementwise + tight cosine (same log_sinc noise note as
        # test_forward_parity)
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-2)
        cos = float(got @ want / (np.linalg.norm(got)
                                  * np.linalg.norm(want)))
        assert cos > 0.99999, cos


    def test_checkpoint_cli_roundtrip(self, ref_rawnet_module, tmp_path):
        """torch-save the reference ckpt layout ({"model": sd}) ->
        bins/convert_checkpoint --model rawnet3 -> rawnet3_embedder loads
        it and reproduces the direct-params embedding bit-exactly."""
        import jax
        import jax.numpy as jnp

        from amphion_tpu.evaluation.metrics.similarity import (
            rawnet3_embedder)
        from amphion_tpu.models.rawnet3 import (RawNet3Config,
                                                embed_utterance)
        from bins.convert_checkpoint import convert_one

        ref, ours, params, stats = self._pair(ref_rawnet_module)
        torch.save({"model": ref.state_dict()}, tmp_path / "model.pt")
        convert_one("rawnet3", tmp_path / "model.pt", tmp_path / "out",
                    {"model_scale": 4})
        cfg = RawNet3Config(channels=self.C, model_scale=4, embed_dim=24)
        embed = rawnet3_embedder(str(tmp_path / "out"), cfg=cfg)

        rng = np.random.default_rng(6)
        audio = rng.standard_normal(6000).astype(np.float32) * 0.3
        fwd = jax.jit(lambda au: ours.apply(
            {"params": params, "batch_stats": stats}, au))
        want = embed_utterance(fwd, audio)
        got = embed(audio, 16000)
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# GE2E / Resemblyzer
# ---------------------------------------------------------------------------


class _TorchVoiceEncoder(nn.Module):
    """resemblyzer voice_encoder.py:14-66 architecture replica."""

    def __init__(self, n_mel=40, hidden=256, out=256, layers=3):
        super().__init__()
        self.lstm = nn.LSTM(n_mel, hidden, layers, batch_first=True)
        self.linear = nn.Linear(hidden, out)
        self.relu = nn.ReLU()

    def forward(self, mels):
        _, (hidden, _) = self.lstm(mels)
        raw = self.relu(self.linear(hidden[-1]))
        return raw / torch.norm(raw, dim=1, keepdim=True)


class TestGE2E:
    def _pair(self, hidden=32, n_mel=40):
        torch.manual_seed(0)
        ref = _TorchVoiceEncoder(n_mel=n_mel, hidden=hidden,
                                 out=hidden).eval()

        from amphion_tpu.models.ge2e import GE2EConfig, GE2EEncoder
        from amphion_tpu.utils.convert import torch_ge2e_to_flax

        cfg = GE2EConfig(n_mel=n_mel, hidden=hidden, embed_dim=hidden)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        return ref, GE2EEncoder(cfg), torch_ge2e_to_flax(sd), cfg

    def test_forward_parity(self):
        ref, ours, params, _ = self._pair()
        rng = np.random.default_rng(1)
        mels = rng.standard_normal((3, 50, 40)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(mels)).numpy()
        got = np.asarray(ours.apply({"params": params}, mels))
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)
        np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0,
                                   atol=1e-5)

    def test_partial_slices_protocol(self):
        """compute_partial_slices == the resemblyzer grid (160-frame
        windows, 80-frame step, 0.75 min coverage)."""
        from amphion_tpu.models.ge2e import (GE2EConfig,
                                             compute_partial_slices)

        cfg = GE2EConfig()
        # long utterance: plural windows, step 80 frames = 12800 samples
        ws, ms = compute_partial_slices(16000 * 4, cfg)
        assert ms[0] == slice(0, 160) and ms[1] == slice(80, 240)
        assert all(s.stop - s.start == 160 for s in ms)
        assert ws[0] == slice(0, 160 * 160)
        # short utterance: single (padded) window survives
        ws, ms = compute_partial_slices(8000, cfg)
        assert len(ms) == 1 and ms[0] == slice(0, 160)

    def test_embed_utterance(self):
        import jax

        from amphion_tpu.models.ge2e import (GE2EConfig, embed_utterance,
                                             ge2e_mel)

        ref, ours, params, cfg = self._pair()
        fwd = jax.jit(lambda m: ours.apply({"params": params}, m))
        rng = np.random.default_rng(4)
        audio = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
        emb = embed_utterance(fwd, audio, cfg)
        assert emb.shape == (32,)
        np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)
        # mel front end: librosa power-mel semantics (frame count from
        # center=True padding: 1 + floor(T / hop))
        m = np.asarray(ge2e_mel(audio, cfg))
        assert m.shape == (1, 1 + len(audio) // cfg.hop, cfg.n_mel)
        assert (m >= 0).all()

    def test_mel_matches_torch_stft_oracle(self):
        """Power-mel == torch.stft(center=True, hann 400, hop 160) run
        through the same slaney filterbank."""
        from amphion_tpu.models.ge2e import GE2EConfig, ge2e_mel
        from amphion_tpu.ops.mel import mel_filterbank

        cfg = GE2EConfig()
        rng = np.random.default_rng(5)
        audio = rng.standard_normal(16000).astype(np.float32) * 0.2
        spec = torch.stft(torch.from_numpy(audio), n_fft=400,
                          hop_length=160, window=torch.hann_window(400),
                          center=True, pad_mode="reflect",
                          return_complex=True)
        power = (spec.abs() ** 2).numpy()
        basis = mel_filterbank(16000, 400, 40, 0.0, 8000.0)
        want = (basis @ power).T
        got = np.asarray(ge2e_mel(audio, cfg))[0]
        np.testing.assert_allclose(got, want[: got.shape[0]], rtol=0,
                                   atol=2e-4)
