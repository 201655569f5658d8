import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from amphion_tpu.models.svc.comosvc import ComoSVC, comosvc_sample, consistency_distill_step
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


def test_comosvc_distill_and_sample(rng):
    student = ComoSVC(SVC_TINY)
    feats = _features(rng)
    mel = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    mask = jnp.ones((2, 10))
    params = student.init(
        jax.random.key(0), mel, jnp.ones(()), feats, method=ComoSVC.denoised
    )["params"]

    def teacher_eps(x, t_int):
        return jnp.zeros_like(x)  # dummy frozen teacher

    from amphion_tpu.modules.diffusion import DiffusionSchedule

    loss = consistency_distill_step(
        student, params, teacher_eps, DiffusionSchedule.create(50),
        mel, feats, mask, jax.random.key(1),
    )
    assert np.isfinite(float(loss))
    out = comosvc_sample(student, params, feats, (2, 10, 8), jax.random.key(2))
    assert out.shape == (2, 10, 8)


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
