import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from amphion_tpu.models.tts.maskgct.maskgct import (
    MaskGCTS2A,
    MaskGCTT2S,
    S2AConfig,
    T2SConfig,
    s2a_sample,
    t2s_sample,
)

T2S_TINY = T2SConfig(hidden=32, num_layers=2, num_heads=4, codebook_size=24,
                     phone_vocab=16, max_position=128)
S2A_TINY = S2AConfig(hidden=32, num_layers=2, num_heads=4, codebook_size=16,
                     num_quantizers=3, semantic_dim=8, max_position=128)


@pytest.fixture(scope="module")
def t2s_setup():
    rng = np.random.default_rng(0)
    model = MaskGCTT2S(T2S_TINY)
    x0 = jnp.asarray(rng.integers(0, 24, (2, 12)))
    x_mask = jnp.ones((2, 12), jnp.float32)
    phones = jnp.asarray(rng.integers(0, 16, (2, 5)))
    phone_mask = jnp.ones((2, 5), jnp.float32)
    params = model.init(
        jax.random.key(0), x0, x_mask, phones, phone_mask, jax.random.key(1),
        method=MaskGCTT2S.compute_loss,
    )["params"]
    return model, params, (x0, x_mask, phones, phone_mask)


def test_t2s_loss_and_overfit(t2s_setup):
    model, params, (x0, x_mask, phones, phone_mask) = t2s_setup
    loss, aux = model.apply(
        {"params": params}, x0, x_mask, phones, phone_mask, jax.random.key(1),
        method=MaskGCTT2S.compute_loss,
    )
    assert np.isfinite(float(loss))
    assert abs(float(loss) - np.log(24)) < 1.5  # near uniform CE at init

    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rng):
        def loss_fn(p):
            return model.apply(
                {"params": p}, x0, x_mask, phones, phone_mask, rng,
                method=MaskGCTT2S.compute_loss,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for i in range(40):
        params, opt, loss = step(params, opt, jax.random.key(i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8


def test_t2s_sample(t2s_setup):
    model, params, (x0, x_mask, phones, phone_mask) = t2s_setup
    prompt = x0[:, :4]
    out = t2s_sample(
        model, params, prompt, phones, target_len=10, rng=jax.random.key(2),
        n_steps=6,
    )
    assert out.shape == (2, 10)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 24).all()


@pytest.fixture(scope="module")
def s2a_setup():
    rng = np.random.default_rng(1)
    model = MaskGCTS2A(S2A_TINY)
    tokens = jnp.asarray(rng.integers(0, 16, (2, 3, 10)))
    x_mask = jnp.ones((2, 10), jnp.float32)
    sem = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    params = model.init(
        jax.random.key(0), tokens, x_mask, sem, jax.random.key(1),
        method=MaskGCTS2A.compute_loss,
    )["params"]
    return model, params, (tokens, x_mask, sem)


def test_s2a_loss(s2a_setup):
    model, params, (tokens, x_mask, sem) = s2a_setup
    loss, aux = model.apply(
        {"params": params}, tokens, x_mask, sem, jax.random.key(3),
        method=MaskGCTS2A.compute_loss,
    )
    assert np.isfinite(float(loss))


def test_s2a_sample(s2a_setup):
    model, params, (tokens, x_mask, sem) = s2a_setup
    rng = np.random.default_rng(2)
    prompt_all = tokens[:, :, :4]
    target_len = 8
    sem_full = jnp.asarray(
        rng.standard_normal((2, 4 + target_len, 8)).astype(np.float32)
    )
    out = s2a_sample(
        model, params, sem_full, prompt_all, target_len, jax.random.key(4),
        first_layer_steps=4, rest_layer_steps=1,
    )
    assert out.shape == (2, 3, target_len)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 16).all()
