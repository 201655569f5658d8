"""Native VGGish FAD embedder: torch forward oracle + front-end contract.

The reference computes FAD with the VGGish embedder
(`evaluation/metrics/spectrogram/frechet_distance.py:19-27` via the
frechet_audio_distance package → harritaylor/torchvggish). That package
isn't installed here, so the torch side of the oracle builds the SAME
published architecture inline (features.{0,3,6,8,11,13} convs,
embeddings.{0,2,4} linears, transpose-before-flatten) and the converter
must reproduce its forward exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amphion_tpu.models.vggish import (
    EXAMPLE_FRAMES,
    LOG_OFFSET,
    NUM_MEL_BINS,
    VGGish,
    _spectrogram_to_mel_matrix,
    vggish_fad_embedder,
    vggish_log_mel,
)

torch = pytest.importorskip("torch")


def _torch_vggish():
    """harritaylor/torchvggish VGG topology (the published VGGish)."""
    import torch.nn as tn

    class TV(tn.Module):
        def __init__(self):
            super().__init__()
            self.features = tn.Sequential(
                tn.Conv2d(1, 64, 3, padding=1), tn.ReLU(True),
                tn.MaxPool2d(2, 2),
                tn.Conv2d(64, 128, 3, padding=1), tn.ReLU(True),
                tn.MaxPool2d(2, 2),
                tn.Conv2d(128, 256, 3, padding=1), tn.ReLU(True),
                tn.Conv2d(256, 256, 3, padding=1), tn.ReLU(True),
                tn.MaxPool2d(2, 2),
                tn.Conv2d(256, 512, 3, padding=1), tn.ReLU(True),
                tn.Conv2d(512, 512, 3, padding=1), tn.ReLU(True),
                tn.MaxPool2d(2, 2),
            )
            self.embeddings = tn.Sequential(
                tn.Linear(512 * 4 * 6, 4096), tn.ReLU(True),
                tn.Linear(4096, 4096), tn.ReLU(True),
                tn.Linear(4096, 128), tn.ReLU(True),
            )

        def forward(self, x):  # x: (B, 1, 96, 64)
            x = self.features(x)
            x = torch.transpose(x, 1, 3)
            x = torch.transpose(x, 1, 2)
            x = x.contiguous().view(x.size(0), -1)
            return self.embeddings(x)

    return TV()


def test_vggish_forward_oracle():
    from amphion_tpu.utils.convert import torch_vggish_to_flax

    torch.manual_seed(0)
    tv = _torch_vggish().eval()
    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    params = torch_vggish_to_flax(sd)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, EXAMPLE_FRAMES, NUM_MEL_BINS)
                            ).astype(np.float32)
    with torch.no_grad():
        # torchvggish applies a trailing ReLU inside embeddings; the
        # published embedding is the PRE-activation 128-d output, which
        # is what frechet_audio_distance uses with use_activation=False
        # (it strips the last ReLU). Compare pre-ReLU:
        h = tv.features(torch.from_numpy(x[:, None]))
        h = torch.transpose(h, 1, 3)
        h = torch.transpose(h, 1, 2)
        h = h.contiguous().view(h.size(0), -1)
        for layer in list(tv.embeddings)[:-1]:
            h = layer(h)
        want = h.numpy()
    got = np.asarray(VGGish().apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_vggish_logmel_contract():
    """AudioSet front-end invariants: example framing, mel matrix
    properties (HTK band edges, DC zero, no slaney normalization)."""
    sr = 16000
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(int(sr * 2.5)) * 0.1).astype(np.float32)
    ex = np.asarray(vggish_log_mel(x, sr))
    # 2.5 s → 249 frames → 2 whole 0.96 s examples
    assert ex.shape == (2, EXAMPLE_FRAMES, NUM_MEL_BINS)
    assert np.isfinite(ex).all()
    # silence → log offset floor everywhere
    sil = np.asarray(vggish_log_mel(np.zeros(sr, np.float32), sr))
    np.testing.assert_allclose(sil, np.log(LOG_OFFSET), atol=1e-4)
    m = _spectrogram_to_mel_matrix()
    assert m.shape == (257, NUM_MEL_BINS)
    assert np.all(m[0] == 0.0)  # DC excluded
    assert np.all(m >= 0)
    # triangular peaks are 1.0-ish (no area normalization)
    assert 0.5 < m.max() <= 1.0 + 1e-6
    # resampling path: 24 kHz in → same example geometry
    x24 = (rng.standard_normal(int(24000 * 1.2)) * 0.1).astype(np.float32)
    ex24 = np.asarray(vggish_log_mel(x24, 24000))
    assert ex24.shape[1:] == (EXAMPLE_FRAMES, NUM_MEL_BINS)


def test_vggish_fad_discriminates(tmp_path):
    """FAD over VGGish embeddings: distance(same dist) << distance(noise
    vs tones) — the metric-level sanity the mel-stat FAD test has, now
    with the model embedder (random weights are fine for separation)."""
    from amphion_tpu.evaluation.metrics import calc_metric

    model = VGGish()
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, EXAMPLE_FRAMES, NUM_MEL_BINS))
                        )["params"]
    embed = vggish_fad_embedder(params=params)

    sr = 16000
    rng = np.random.default_rng(2)

    def clips(kind, n):
        out = []
        for i in range(n):
            if kind == "noise":
                out.append((rng.standard_normal(sr) * 0.1
                            ).astype(np.float32))
            else:
                t = np.arange(sr) / sr
                f = 200 + 40 * i
                out.append((0.3 * np.sin(2 * np.pi * f * t)
                            ).astype(np.float32))
        return out

    e_noise1 = np.concatenate([embed(c, sr) for c in clips("noise", 6)])
    e_noise2 = np.concatenate([embed(c, sr) for c in clips("noise", 6)])
    e_tone = np.concatenate([embed(c, sr) for c in clips("tone", 6)])
    d_same = calc_metric("fad", e_noise1, e_noise2)
    d_diff = calc_metric("fad", e_noise1, e_tone)
    assert d_diff > 5 * max(d_same, 1e-6), (d_same, d_diff)


def test_vggish_cli_convert(tmp_path):
    """convert_checkpoint --model vggish round-trips a torch .pt file."""
    from bins.convert_checkpoint import convert_one

    from amphion_tpu.runtime.checkpoint import CheckpointManager

    torch.manual_seed(3)
    tv = _torch_vggish()
    pt = tmp_path / "pytorch_vggish.pth"
    torch.save(tv.state_dict(), pt)
    out = tmp_path / "ck"
    convert_one("vggish", pt, out)
    tree, _, _ = CheckpointManager(out).restore_raw()
    assert tree["params"]["conv_0"]["kernel"].shape == (3, 3, 1, 64)
    assert tree["params"]["embedding"]["kernel"].shape == (4096, 128)
    # the embedder loads the converted dir too
    emb = vggish_fad_embedder(str(out))
    v = emb(np.zeros(16000, np.float32), 16000)
    assert v.shape == (1, 128) and np.isfinite(v).all()
