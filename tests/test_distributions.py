"""Discretized mixture-of-logistics ops vs the reference torch
implementation (`utils/distribution.py`), plus the WaveNet MoL head."""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_FILE = Path("/root/reference/utils/distribution.py")


def _load_ref_distribution():
    spec = importlib.util.spec_from_file_location("ref_distribution", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not REF_FILE.exists(), reason="reference unavailable")
class TestMoLOracle:
    def test_loss_matches_reference(self):
        ref = _load_ref_distribution()
        from amphion_tpu.ops.distributions import (
            discretized_mix_logistic_loss,
        )

        rng = np.random.RandomState(30)
        b, t, k = 2, 17, 4
        y_hat = rng.randn(b, 3 * k, t).astype(np.float32)
        # include exact edge values ±1 to exercise the boundary branches
        y = np.clip(rng.randn(b, t, 1) * 0.7, -1, 1).astype(np.float32)
        y[0, 0, 0] = -1.0
        y[1, 2, 0] = 1.0
        with torch.no_grad():
            ref_loss = ref.discretized_mix_logistic_loss(
                torch.from_numpy(y_hat), torch.from_numpy(y),
                num_classes=256, reduce=True).item()
        ours = discretized_mix_logistic_loss(
            jnp.asarray(y_hat.transpose(0, 2, 1)), jnp.asarray(y[..., 0]),
            num_classes=256, reduce="sum")
        np.testing.assert_allclose(float(ours), ref_loss, rtol=1e-5)

    def test_sampling_statistics(self):
        """With one dominant narrow mixture component the samples must
        concentrate at its mean (matches the reference sampler up to RNG)."""
        from amphion_tpu.ops.distributions import (
            sample_from_discretized_mix_logistic,
        )

        k = 3
        y_hat = np.zeros((1, 2000, 3 * k), np.float32)
        y_hat[..., 0] = 8.0  # dominant logit
        y_hat[..., k] = 0.35  # its mean
        y_hat[..., 2 * k:] = -6.0  # tiny scales everywhere
        s = np.asarray(sample_from_discretized_mix_logistic(
            jax.random.key(0), jnp.asarray(y_hat)))
        assert abs(float(s.mean()) - 0.35) < 0.01
        assert float(s.std()) < 0.02


class TestWaveNetMoL:
    def test_mol_loss_finite_and_head_shape(self):
        from amphion_tpu.models.vocoders.autoregressive import (
            WaveNetConfig,
            WaveNetVocoder,
        )

        rng = np.random.RandomState(31)
        cfg = WaveNetConfig(n_mel=8, upsample_scales=(2, 2),
                            mel_frame_pad=1, out_channels=9,
                            residual_channels=8, gate_channels=8,
                            skip_out_channels=8, layers=4, stacks=2,
                            scalar_input=True)
        model = WaveNetVocoder(cfg)
        t = (8 - 2) * 4  # (frames - 2*pad) * hop usable samples
        audio = jnp.asarray(np.clip(rng.randn(2, t + 1) * 0.3, -1, 1)
                            .astype(np.float32))
        mel = jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
        params = model.init(jax.random.key(0), audio, mel,
                            method=WaveNetVocoder.loss)["params"]
        out = model.apply({"params": params}, audio[:, :-1], mel)
        assert out.shape == (2, t, 9)
        loss = model.apply({"params": params}, audio, mel, False,
                           method=WaveNetVocoder.loss)
        assert np.isfinite(float(loss))
