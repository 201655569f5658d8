import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.models.vocoders.apnet import APNetConfig, APNetGenerator
from amphion_tpu.models.vocoders.autoregressive import (
    WaveNetConfig,
    WaveNetVocoder,
    WaveRNNConfig,
    WaveRNNVocoder,
    mu_law_decode,
    mu_law_encode,
)
from amphion_tpu.models.vocoders.bigvgan import BigVGANConfig, BigVGANGenerator
from amphion_tpu.models.vocoders.diffwave import DiffWave, DiffWaveConfig, diffwave_sample
from amphion_tpu.models.vocoders.melgan import MelGANConfig, MelGANGenerator
from amphion_tpu.models.vocoders.nsf_hifigan import NSFHiFiGANConfig, NSFHiFiGANGenerator
from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig
from amphion_tpu.models.vocoders.world import world_synthesis


def test_bigvgan(rng):
    cfg = BigVGANConfig(
        n_mel=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    gen = BigVGANGenerator(cfg)
    mel = jnp.asarray(rng.standard_normal((1, 12, 8)).astype(np.float32))
    params = gen.init(jax.random.key(0), mel)["params"]
    wav = gen.apply({"params": params}, mel)
    assert wav.shape == (1, 12 * 8)
    assert np.isfinite(np.asarray(wav)).all()


def test_nsf_hifigan(rng):
    base = HiFiGANConfig(
        resblock="2", upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), n_mel=8,
    )
    cfg = NSFHiFiGANConfig(base=base, sample_rate=8000, num_harmonics=3)
    gen = NSFHiFiGANGenerator(cfg)
    mel = jnp.asarray(rng.standard_normal((1, 12, 8)).astype(np.float32))
    f0 = jnp.full((1, 12), 200.0)
    params = gen.init(jax.random.key(0), mel, f0, jax.random.key(1))["params"]
    wav = gen.apply({"params": params}, mel, f0, jax.random.key(2))
    assert wav.shape == (1, 12 * 8)


def test_melgan(rng):
    cfg = MelGANConfig(n_mel=8, upsample_rates=(4, 2), ngf=4, n_residual_layers=1)
    gen = MelGANGenerator(cfg)
    mel = jnp.asarray(rng.standard_normal((1, 10, 8)).astype(np.float32))
    params = gen.init(jax.random.key(0), mel)["params"]
    assert gen.apply({"params": params}, mel).shape == (1, 80)


def test_apnet(rng):
    cfg = APNetConfig(n_mel=8, channels=16, num_layers=1, n_fft=64,
                      hop_size=16, win_size=64)
    gen = APNetGenerator(cfg)
    mel = jnp.asarray(rng.standard_normal((1, 10, 8)).astype(np.float32))
    params = gen.init(jax.random.key(0), mel)["params"]
    wav = gen.apply({"params": params}, mel)
    assert wav.shape == (1, 160)
    assert np.isfinite(np.asarray(wav)).all()


def test_diffwave(rng):
    cfg = DiffWaveConfig(n_mel=8, hop_size=8, residual_channels=8, num_layers=2,
                         dilation_cycle=2, num_train_steps=10)
    model = DiffWave(cfg)
    mel = jnp.asarray(rng.standard_normal((1, 6, 8)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((1, 48)).astype(np.float32) * 0.3)
    params = model.init(
        jax.random.key(0), audio, mel, jax.random.key(1), method=DiffWave.loss
    )["params"]
    loss = model.apply(
        {"params": params}, audio, mel, jax.random.key(2), method=DiffWave.loss
    )
    assert np.isfinite(float(loss))
    wav = diffwave_sample(model, params, mel, jax.random.key(3), num_steps=4)
    assert wav.shape == (1, 48)


def test_mulaw_roundtrip():
    x = jnp.asarray(np.linspace(-0.9, 0.9, 100).astype(np.float32))
    ids = mu_law_encode(x)
    assert int(ids.min()) >= 0 and int(ids.max()) <= 255
    back = mu_law_decode(ids)
    assert float(jnp.abs(back - x).max()) < 0.02


def test_wavenet_wavernn_loss(rng):
    audio = jnp.asarray(rng.standard_normal((1, 64)).astype(np.float32) * 0.3)
    mel = jnp.asarray(rng.standard_normal((1, 8, 8)).astype(np.float32))
    wn = WaveNetVocoder(WaveNetConfig(
        n_mel=8, upsample_scales=(2, 4), mel_frame_pad=1, out_channels=16,
        residual_channels=8, gate_channels=8, skip_out_channels=8,
        layers=2, stacks=1))
    wn_audio = jnp.asarray(
        rng.standard_normal((1, (8 - 2) * 8 + 1)).astype(np.float32) * 0.3)
    p = wn.init(jax.random.key(0), wn_audio, mel,
                method=WaveNetVocoder.loss)["params"]
    assert np.isfinite(float(wn.apply(
        {"params": p}, wn_audio, mel, False, method=WaveNetVocoder.loss)))
    wr_cfg = WaveRNNConfig(n_mel=8, upsample_factors=(2, 4), rnn_dim=16,
                           fc_dim=16, compute_dims=8, res_out_dims=8,
                           res_blocks=1, mel_pad=1, bits=4)
    wr = WaveRNNVocoder(wr_cfg)
    # usable samples = (frames - 2*pad) * hop; loss eats one for shifting
    wr_audio = jnp.asarray(
        rng.standard_normal((1, (8 - 2) * 8 + 1)).astype(np.float32) * 0.3)
    v2 = wr.init(jax.random.key(0), wr_audio, mel, method=WaveRNNVocoder.loss)
    loss2, _ = wr.apply(v2, wr_audio, mel, method=WaveRNNVocoder.loss,
                        mutable=["batch_stats"])
    assert np.isfinite(float(loss2))
    # MoL head variant
    wr_mol = WaveRNNVocoder(
        WaveRNNConfig(n_mel=8, upsample_factors=(2, 4), rnn_dim=16,
                      fc_dim=16, compute_dims=8, res_out_dims=8,
                      res_blocks=1, mel_pad=1, mode="mol"))
    v3 = wr_mol.init(jax.random.key(0), wr_audio, mel,
                     method=WaveRNNVocoder.loss)
    loss3, _ = wr_mol.apply(v3, wr_audio, mel, method=WaveRNNVocoder.loss,
                            mutable=["batch_stats"])
    assert np.isfinite(float(loss3))


def test_waveglow_roundtrip(rng):
    from amphion_tpu.models.vocoders.waveglow import WaveGlow, WaveGlowConfig

    cfg = WaveGlowConfig(n_mel=8, hop_size=8, upsample_kernel=16, n_group=4,
                         n_flows=3, n_early_every=2, n_early_size=2,
                         wn_channels=16, wn_layers=2)
    model = WaveGlow(cfg)
    audio = jnp.asarray(rng.standard_normal((1, 64)).astype(np.float32) * 0.3)
    mel = jnp.asarray(rng.standard_normal((1, 8, 8)).astype(np.float32))
    params = model.init(jax.random.key(0), audio, mel, method=WaveGlow.forward)["params"]
    loss = model.apply({"params": params}, audio, mel, method=WaveGlow.loss)
    assert np.isfinite(float(loss))
    z, _ = model.apply({"params": params}, audio, mel, method=WaveGlow.forward)
    assert z.shape == (1, 16, 4)  # early outputs + final block
    # learned upsampler length: (N-1)*hop + kernel, grouped
    wav = model.apply({"params": params}, mel, jax.random.key(1), method=WaveGlow.infer)
    assert wav.shape == (1, ((8 - 1) * 8 + 16) // 4 * 4)
    assert np.isfinite(np.asarray(wav)).all()


def test_world_synthesis():
    sr, hop = 8000, 8
    n = 40
    f0 = jnp.full((1, n), 220.0)
    log_mel = jnp.full((1, n, 16), -2.0)
    wav = world_synthesis(f0, log_mel, sr, hop, 16, jax.random.key(0))
    assert wav.shape == (1, n * hop)
    assert float(jnp.abs(wav).max()) <= 1.0
    # voiced output should be periodic with period sr/220 ≈ 36.4 samples:
    # autocorrelation peaks near that lag
    x = np.asarray(wav)[0]
    ac = np.correlate(x, x, mode="full")[len(x) - 1 :]
    lag = ac[20:60].argmax() + 20
    assert abs(lag - sr / 220.0) < 3
