"""AR vocoder generation (`wavenet_generate` / `wavernn_generate`):
the incremental step math must reproduce the teacher-forced `__call__`
logits exactly when fed the generated prefix."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amphion_tpu.models.vocoders.autoregressive import (
    WaveNetConfig,
    WaveNetVocoder,
    WaveRNNConfig,
    WaveRNNVocoder,
    mu_law_encode,
    wavenet_generate,
    wavernn_generate,
)


class TestWaveNetGenerate:
    @pytest.mark.parametrize("scalar_input", [False, True])
    def test_generate_shapes(self, scalar_input):
        rng = np.random.RandomState(40)
        cfg = WaveNetConfig(n_mel=4, upsample_scales=(2, 2), mel_frame_pad=1,
                            out_channels=6 if scalar_input else 16,
                            residual_channels=8, gate_channels=8,
                            skip_out_channels=8, layers=4, stacks=2,
                            scalar_input=scalar_input)
        model = WaveNetVocoder(cfg)
        mel = jnp.asarray(rng.randn(2, 6, 4).astype(np.float32))
        t = (6 - 2) * 4
        if scalar_input:
            a0 = jnp.zeros((2, t), jnp.float32)
        else:
            a0 = jnp.zeros((2, t), jnp.int32)
        variables = model.init(jax.random.key(0), a0, mel)
        audio = wavenet_generate(cfg, variables, mel, jax.random.key(1))
        assert audio.shape == (2, t)
        assert float(jnp.abs(audio).max()) <= 1.0 + 1e-5

    def test_step_matches_teacher_forced(self):
        """Greedy incremental decode == argmax over teacher-forced logits
        on the same prefix (locks buffers/param-tree math to __call__)."""
        rng = np.random.RandomState(41)
        cfg = WaveNetConfig(n_mel=4, upsample_scales=(2,), mel_frame_pad=1,
                            out_channels=16, residual_channels=8,
                            gate_channels=8, skip_out_channels=8,
                            layers=4, stacks=2, kernel_size=3)
        model = WaveNetVocoder(cfg)
        mel = jnp.asarray(rng.randn(1, 8, 4).astype(np.float32))
        t = (8 - 2) * 2
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, t), jnp.int32), mel)
        # deterministic decode: temperature→0 === argmax
        gen = wavenet_generate(cfg, variables, mel, jax.random.key(1),
                               temperature=1e-6)
        mu = cfg.out_channels - 1
        ids = mu_law_encode(gen, mu)  # decoded ids re-encoded exactly
        prefix = jnp.concatenate(
            [jnp.full((1, 1), cfg.out_channels // 2, jnp.int32),
             ids[:, :-1]], axis=1)
        logits = model.apply(variables, prefix, mel)
        np.testing.assert_array_equal(np.asarray(logits.argmax(-1)),
                                      np.asarray(ids))


class TestWaveRNNGenerate:
    def test_generate_and_consistency(self):
        from amphion_tpu.models.vocoders.autoregressive import label_to_float

        rng = np.random.RandomState(42)
        cfg = WaveRNNConfig(n_mel=4, upsample_factors=(2, 2), rnn_dim=16,
                            fc_dim=16, compute_dims=8, res_out_dims=8,
                            res_blocks=1, mel_pad=1, bits=4)
        model = WaveRNNVocoder(cfg)
        mel = jnp.asarray(rng.randn(2, 6, 4).astype(np.float32))
        t = (6 - 2 * cfg.mel_pad) * cfg.hop_size  # usable samples
        variables = model.init(jax.random.key(0), jnp.zeros((2, t)), mel)
        audio = wavernn_generate(cfg, variables, mel, jax.random.key(1),
                                 temperature=1e-6)
        assert audio.shape == (2, t)
        # greedy decode == argmax over the teacher-forced dual-GRU forward
        # on the generated prefix (x_0 = 0, then label floats)
        ids = mu_law_encode(audio, 2 ** cfg.bits - 1)
        x_in = jnp.concatenate(
            [jnp.zeros((2, 1)), label_to_float(ids[:, :-1], cfg.bits)],
            axis=1)
        logits = model.apply(variables, x_in, mel)
        np.testing.assert_array_equal(np.asarray(logits.argmax(-1)),
                                      np.asarray(ids))

    def test_generate_mol_head(self):
        rng = np.random.RandomState(43)
        cfg = WaveRNNConfig(n_mel=4, upsample_factors=(2, 2), rnn_dim=16,
                            fc_dim=16, compute_dims=8, res_out_dims=8,
                            res_blocks=1, mel_pad=1, mode="mol")
        model = WaveRNNVocoder(cfg)
        mel = jnp.asarray(rng.randn(1, 6, 4).astype(np.float32))
        t = (6 - 2) * 4
        variables = model.init(jax.random.key(0), jnp.zeros((1, t)), mel)
        audio = wavernn_generate(cfg, variables, mel, jax.random.key(1))
        assert audio.shape == (1, t)
        assert np.isfinite(np.asarray(audio)).all()
