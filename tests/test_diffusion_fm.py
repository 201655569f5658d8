import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.modules.diffusion import (
    DiffusionSchedule,
    cosine_betas,
    ddim_sample,
    ddpm_sample,
    edm_denoiser_scalings,
    heun_sample,
    consistency_sample,
    karras_sigmas,
    timestep_embedding,
)
from amphion_tpu.modules.flow_matching import (
    cfm_loss,
    cfm_pair,
    euler_sample,
    midpoint_sample,
    with_cfg,
)


def test_schedule_monotone():
    s = DiffusionSchedule.create(100)
    ab = s.alphas_bar
    assert ab[0] > ab[-1] > 0
    assert (np.diff(ab) < 0).all()
    cb = cosine_betas(100)
    assert (cb >= 0).all() and (cb <= 0.999).all()


def test_q_sample_limits():
    s = DiffusionSchedule.create(1000)
    x0 = jnp.ones((2, 4))
    noise = jnp.zeros((2, 4))
    # at t=0 nearly x0
    xt = s.q_sample(x0, jnp.asarray([0, 0]), noise)
    np.testing.assert_allclose(np.asarray(xt), 1.0, atol=1e-3)


def _gauss_denoiser(mu=2.0):
    """For data = constant mu, optimal eps prediction drives x -> mu."""
    s = DiffusionSchedule.create(200)
    ab = jnp.asarray(s.alphas_bar)

    def eps_fn(x, t):
        # eps* = (x - sqrt(ab) mu) / sqrt(1-ab)
        return (x - jnp.sqrt(ab[t]) * mu) / jnp.sqrt(1 - ab[t])

    return s, eps_fn


def test_ddpm_recovers_point_mass():
    s, eps_fn = _gauss_denoiser(2.0)
    out = ddpm_sample(eps_fn, s, (4, 8), jax.random.key(0))
    assert abs(float(out.mean()) - 2.0) < 0.3


def test_ddim_recovers_point_mass():
    s, eps_fn = _gauss_denoiser(-1.5)
    out = ddim_sample(eps_fn, s, (4, 8), jax.random.key(0), num_steps=25)
    assert abs(float(out.mean()) + 1.5) < 0.2


def test_karras_heun():
    def denoised_fn(x, sigma):
        return jnp.full_like(x, 3.0)  # x0 predictor that always says 3

    out = heun_sample(denoised_fn, (2, 4), jax.random.key(0), num_steps=10)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-3)
    sig = karras_sigmas(10)
    assert sig[0] > sig[-1] > 0


def test_consistency_single_step():
    def denoised_fn(x, sigma):
        return jnp.zeros_like(x)

    out = consistency_sample(denoised_fn, (2, 4), jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_edm_scalings():
    c_skip, c_out, c_in = edm_denoiser_scalings(jnp.asarray(0.5), 0.5)
    assert abs(float(c_skip) - 0.5) < 1e-6


def test_timestep_embedding():
    emb = timestep_embedding(jnp.asarray([0, 10]), 64)
    assert emb.shape == (2, 64)
    assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[1]))


def test_cfm_pair_endpoints():
    x1 = jnp.ones((2, 4))
    noise = jnp.zeros((2, 4))
    xt, v = cfm_pair(x1, jnp.asarray([0.0, 1.0]), noise)
    np.testing.assert_allclose(np.asarray(xt[0]), 0.0, atol=1e-6)  # t=0 -> noise
    np.testing.assert_allclose(np.asarray(xt[1]), 1.0, atol=1e-6)  # t=1 -> data
    np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-4)


def test_euler_integrates_linear_field():
    # v(x, t) = 5 (constant target x1=5 from x0=0 ... not exactly; just check
    # that constant velocity 5 moves noise by 5)
    out = euler_sample(lambda x, t: jnp.full_like(x, 5.0), (2, 4), jax.random.key(0), 8)
    noise = jax.random.normal(jax.random.key(0), (2, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(noise) + 5.0, atol=1e-4)


def test_midpoint_beats_euler_on_curved_field():
    # dx/dt = x  (solution: x(1) = x(0) * e)
    f = lambda x, t: x
    x0 = jax.random.normal(jax.random.key(1), (2, 3))
    eu = euler_sample(f, (2, 3), jax.random.key(1), num_steps=8)
    mid = midpoint_sample(f, (2, 3), jax.random.key(1), num_steps=8)
    exact = np.asarray(x0) * np.e
    assert np.abs(np.asarray(mid) - exact).max() < np.abs(np.asarray(eu) - exact).max()


def test_cfg_wrapper():
    vc = lambda x, t: jnp.full_like(x, 2.0)
    vu = lambda x, t: jnp.full_like(x, 1.0)
    v = with_cfg(vc, vu, 2.0)(jnp.zeros((1,)), 0.0)
    np.testing.assert_allclose(np.asarray(v), 3.0)


def test_cfm_loss_masked():
    v = jnp.ones((2, 4, 3))
    t = jnp.zeros((2, 4, 3))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.float32)
    loss = cfm_loss(v, t, mask)
    assert np.isfinite(float(loss)) and float(loss) > 0
