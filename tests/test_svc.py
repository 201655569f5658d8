import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from amphion_tpu.models.svc.comosvc import (
    ComoSVC,
    ComoSVCConfig,
    comosvc_sample,
    ct_loss,
)
from amphion_tpu.models.svc.diffusion_svc import (
    DiffusionSVC,
    DiffusionSVCConfig,
    diffusion_svc_sample,
)
from amphion_tpu.models.svc.transformer_svc import (
    TransformerSVC,
    TransformerSVCConfig,
    transformer_svc_loss,
)
from amphion_tpu.modules.condition_encoder import ConditionEncoderConfig
from amphion_tpu.modules.wavenet_denoiser import WaveNetDenoiserConfig

COND = ConditionEncoderConfig(
    output_dim=16, use_whisper=True, whisper_dim=8, num_singers=4
)
SVC_TINY = DiffusionSVCConfig(
    n_mel=8,
    condition=COND,
    denoiser=WaveNetDenoiserConfig(in_dim=8, hidden=16, num_layers=2, cond_dim=16),
    num_train_steps=50,
)


def _features(rng, b=2, t=10):
    return {
        "whisper": jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32)),
        "f0": jnp.full((b, t), 220.0),
        "uv": jnp.ones((b, t)),
        "loudness": jnp.full((b, t), 0.1),
        "singer": jnp.asarray([0, 1]),
    }


def test_diffusion_svc_loss_and_sample(rng):
    model = DiffusionSVC(SVC_TINY)
    feats = _features(rng)
    mel = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    mask = jnp.ones((2, 10))
    params = model.init(
        jax.random.key(0), mel, feats, mask, jax.random.key(1),
        method=DiffusionSVC.loss,
    )["params"]
    loss, _ = model.apply(
        {"params": params}, mel, feats, mask, jax.random.key(2),
        method=DiffusionSVC.loss,
    )
    assert np.isfinite(float(loss))
    out = diffusion_svc_sample(
        model, params, feats, (2, 10, 8), jax.random.key(3), "ddim", 5
    )
    assert out.shape == (2, 10, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_comosvc_teacher_distill_and_sample(rng):
    cfg = ComoSVCConfig(
        n_mel=8, condition=COND, hidden=COND.output_dim, n_heads=2,
        n_layers=1, filter_channels=16,
        denoiser=WaveNetDenoiserConfig(in_dim=8, hidden=16, num_layers=2,
                                       cond_dim=8),
        n_timesteps=4,
    )
    model = ComoSVC(cfg)
    feats = _features(rng)
    mel = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    mask = jnp.ones((2, 10))
    params = model.init(
        jax.random.key(0), mel, feats, mask, jax.random.key(1),
        method=ComoSVC.compute_loss,
    )["params"]
    losses = model.apply(
        {"params": params}, mel, feats, mask, jax.random.key(2),
        method=ComoSVC.compute_loss,
    )
    assert all(np.isfinite(float(v)) for v in losses.values())
    # consistency distillation loss (student == ema == pretrained smoke)
    loss = ct_loss(model, params, params, params, mel, feats, mask,
                   jax.random.key(3))
    assert np.isfinite(float(loss))
    # one-step consistency sampling and multi-step teacher sampling
    out = comosvc_sample(model, params, feats, (2, 10, 8), jax.random.key(4))
    assert out.shape == (2, 10, 8) and np.isfinite(np.asarray(out)).all()
    out_t = comosvc_sample(model, params, feats, (2, 10, 8),
                           jax.random.key(5), num_steps=3, teacher=True)
    assert out_t.shape == (2, 10, 8) and np.isfinite(np.asarray(out_t)).all()


def test_transformer_svc(rng):
    cfg = TransformerSVCConfig(
        n_mel=8, hidden=16, num_layers=1, num_heads=2, ffn_hidden=32,
        condition=COND,
    )
    model = TransformerSVC(cfg)
    feats = _features(rng)
    params = model.init(jax.random.key(0), feats)["params"]
    pred = model.apply({"params": params}, feats)
    assert pred.shape == (2, 10, 8)
    tgt = jnp.zeros_like(pred)
    loss, parts = transformer_svc_loss(pred, tgt, jnp.ones((2, 10)))
    assert np.isfinite(float(loss))
