import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from amphion_tpu.models.tts.valle.valle import VALLE, VALLEConfig, ar_generate

TINY = VALLEConfig(
    num_phones=20, audio_vocab=32, num_quantizers=4,
    hidden=32, num_layers=2, num_heads=4, max_position=128,
)


def _batch(rng, b=2, lp=5, lt=12):
    return {
        "phones": jnp.asarray(rng.integers(1, 20, (b, lp))),
        "phone_mask": jnp.ones((b, lp), jnp.float32),
        "tokens": jnp.asarray(rng.integers(0, 32, (b, TINY.num_quantizers, lt))),
        "token_mask": jnp.asarray(
            np.stack([np.ones(lt), np.r_[np.ones(lt - 4), np.zeros(4)]])
        ).astype(jnp.float32),
    }


@pytest.fixture(scope="module")
def valle_setup():
    rng = np.random.default_rng(0)
    model = VALLE(TINY)
    batch = _batch(rng)
    params = model.init(
        jax.random.key(0),
        batch["phones"], batch["phone_mask"], batch["tokens"],
        batch["token_mask"], jax.random.key(1),
        method=VALLE.train_loss,
    )["params"]
    return model, params, batch


def test_valle_losses_finite(valle_setup):
    model, params, batch = valle_setup
    (loss, aux) = model.apply(
        {"params": params},
        batch["phones"], batch["phone_mask"], batch["tokens"],
        batch["token_mask"], jax.random.key(1),
        method=VALLE.train_loss,
    )
    assert np.isfinite(float(loss))
    # initial CE should be near log(V)
    assert abs(float(aux["ar_loss"]) - np.log(33)) < 1.0
    assert abs(float(aux["nar_loss"]) - np.log(32)) < 1.0


def test_valle_overfits_tiny(valle_setup):
    model, params, batch = valle_setup
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rng):
        def loss_fn(p):
            loss, aux = model.apply(
                {"params": p},
                batch["phones"], batch["phone_mask"], batch["tokens"],
                batch["token_mask"], rng,
                method=VALLE.train_loss,
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for i in range(30):
        params, opt, loss = step(params, opt, jax.random.key(i % 3))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7


def test_valle_ar_generate(valle_setup):
    model, params, batch = valle_setup
    tokens, lengths = ar_generate(
        model, params, batch["phones"], batch["tokens"][:, 0, :4],
        jax.random.key(5), max_new=8, temperature=1.0, top_k=8,
    )
    assert tokens.shape == (2, 8)
    assert (np.asarray(tokens) >= 0).all() and (np.asarray(tokens) <= 32).all()
    assert (np.asarray(lengths) <= 8).all()


def test_valle_nar_generate(valle_setup):
    model, params, batch = valle_setup
    out = model.apply(
        {"params": params},
        batch["phones"], batch["phone_mask"], batch["tokens"][:, 0],
        batch["token_mask"],
        method=VALLE.nar_generate,
    )
    assert out.shape == batch["tokens"].shape
    np.testing.assert_array_equal(np.asarray(out)[:, 0], np.asarray(batch["tokens"])[:, 0])


def test_valle_nar_generate_with_prompt(valle_setup):
    """Acoustic-prompt prefix (ref prefix_mode 1 inference): the prompt's
    full codes condition the NAR pass; only target-region codes return."""
    rng = np.random.default_rng(1)
    model, params, batch = valle_setup
    prompt = jnp.asarray(rng.integers(0, 32, (2, TINY.num_quantizers, 6)))
    out = model.apply(
        {"params": params},
        batch["phones"], batch["phone_mask"], batch["tokens"][:, 0],
        batch["token_mask"], prompt,
        method=VALLE.nar_generate,
    )
    assert out.shape == batch["tokens"].shape
    np.testing.assert_array_equal(
        np.asarray(out)[:, 0], np.asarray(batch["tokens"])[:, 0])
    # prompt conditioning must change the completion vs no-prompt decode
    base = model.apply(
        {"params": params},
        batch["phones"], batch["phone_mask"], batch["tokens"][:, 0],
        batch["token_mask"],
        method=VALLE.nar_generate,
    )
    assert not np.array_equal(np.asarray(out)[:, 1:], np.asarray(base)[:, 1:])


def test_valle_prefix_mode_0_loss(rng):
    """prefix_mode=0 keeps the original full-sequence NAR objective."""
    import dataclasses
    model = VALLE(dataclasses.replace(TINY, prefix_mode=0))
    batch = _batch(rng)
    params = model.init(
        jax.random.key(0), batch["phones"], batch["phone_mask"],
        batch["tokens"], batch["token_mask"], jax.random.key(1),
        method=VALLE.train_loss)["params"]
    loss, aux = model.apply(
        {"params": params}, batch["phones"], batch["phone_mask"],
        batch["tokens"], batch["token_mask"], jax.random.key(1),
        method=VALLE.train_loss)
    assert np.isfinite(float(loss))


def test_ar_generate_int8_runs(rng):
    """compute_dtype="int8": weight-only-quantized AR decode produces
    valid tokens (Pallas kernel in interpret mode on CPU)."""
    from amphion_tpu.models.tts.valle.valle import (
        VALLE,
        VALLEConfig,
        ar_generate,
    )

    cfg = VALLEConfig(num_phones=16, audio_vocab=16, num_quantizers=2,
                      hidden=32, num_layers=1, num_heads=2, max_position=128)
    model = VALLE(cfg)
    phones = jnp.asarray(rng.integers(0, 16, (1, 5)))
    prompt = jnp.asarray(rng.integers(0, 16, (1, 6)))
    params = model.init(
        jax.random.key(0), phones, jnp.ones((1, 5)),
        jnp.zeros((1, 2, 14), jnp.int32), jnp.ones((1, 14)),
        jax.random.key(1), method=VALLE.train_loss)["params"]
    toks, lens = ar_generate(model, params, phones, prompt,
                             jax.random.key(2), max_new=4, top_k=5,
                             compute_dtype="int8")
    assert toks.shape == (1, 4)
    assert int(toks.max()) <= cfg.audio_vocab


def test_ar_generate_int4_runs(rng):
    """compute_dtype="int4": group-wise int4 weight-only decode produces
    valid tokens (Pallas kernel in interpret mode on CPU)."""
    from amphion_tpu.models.tts.valle.valle import (
        VALLE,
        VALLEConfig,
        ar_generate,
    )

    cfg = VALLEConfig(num_phones=16, audio_vocab=16, num_quantizers=2,
                      hidden=32, num_layers=1, num_heads=2, max_position=128)
    model = VALLE(cfg)
    phones = jnp.asarray(rng.integers(0, 16, (1, 5)))
    prompt = jnp.asarray(rng.integers(0, 16, (1, 6)))
    params = model.init(
        jax.random.key(0), phones, jnp.ones((1, 5)),
        jnp.zeros((1, 2, 14), jnp.int32), jnp.ones((1, 14)),
        jax.random.key(1), method=VALLE.train_loss)["params"]
    toks, lens = ar_generate(model, params, phones, prompt,
                             jax.random.key(2), max_new=4, top_k=5,
                             compute_dtype="int4")
    assert toks.shape == (1, 4)
    assert int(toks.max()) <= cfg.audio_vocab


def test_nar_generate_ragged_int8_matches_bf16(valle_setup):
    """Regression (round 5): `nar_generate_ragged(compute_dtype="int8")`
    used to cast the NAR params to LITERAL int8 — silently destroying
    them (the AR weight-only quantization does not apply to the NAR's
    plain forward passes). It must now run the bf16 program instead and
    return the same greedy codes."""
    from amphion_tpu.models.tts.valle.valle import nar_generate_ragged

    model, params, batch = valle_setup
    rng = np.random.default_rng(3)
    phones = np.asarray(batch["phones"])
    phone_len = np.asarray([phones.shape[1]] * 2, np.int32)
    tokens0 = rng.integers(0, 32, (2, 6)).astype(np.int32)
    target_len = np.asarray([6, 4], np.int32)
    prompts = rng.integers(0, 32, (2, TINY.num_quantizers, 5)).astype(np.int32)
    prompt_len = np.asarray([5, 3], np.int32)

    want = nar_generate_ragged(model, params, phones, phone_len, tokens0,
                               target_len, prompts, prompt_len,
                               compute_dtype="bfloat16")
    got = nar_generate_ragged(model, params, phones, phone_len, tokens0,
                              target_len, prompts, prompt_len,
                              compute_dtype="int8")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
