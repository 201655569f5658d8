import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from amphion_tpu.models.tts.fastspeech2.fs2 import (
    FastSpeech2,
    FastSpeech2Config,
    fastspeech2_loss,
)

TINY = FastSpeech2Config(
    num_phones=20, hidden=32, n_enc_layers=1, n_dec_layers=1, n_heads=2,
    ffn_hidden=64, n_mel=16, max_frames=32, n_speakers=2,
)


def _batch(rng, b=2, lp=5):
    durs = rng.integers(1, 6, (b, lp))
    total = durs.sum(axis=1)
    mel = rng.standard_normal((b, TINY.max_frames, TINY.n_mel)).astype(np.float32)
    return {
        "phones": jnp.asarray(rng.integers(1, 20, (b, lp))),
        "phone_mask": jnp.ones((b, lp), jnp.float32),
        "durations": jnp.asarray(durs),
        "pitch": jnp.asarray(rng.standard_normal((b, TINY.max_frames)).astype(np.float32)),
        "energy": jnp.asarray(rng.standard_normal((b, TINY.max_frames)).astype(np.float32)),
        "mel": jnp.asarray(mel),
        "sid": jnp.asarray([0, 1]),
    }


def test_fs2_forward_and_loss(rng):
    model = FastSpeech2(TINY)
    batch = _batch(rng)
    params = model.init(
        jax.random.key(0), batch["phones"], batch["phone_mask"],
        batch["durations"], batch["pitch"], batch["energy"], batch["sid"],
    )["params"]
    out = model.apply(
        {"params": params}, batch["phones"], batch["phone_mask"],
        batch["durations"], batch["pitch"], batch["energy"], batch["sid"],
    )
    assert out["mel"].shape == (2, TINY.max_frames, TINY.n_mel)
    total, parts = fastspeech2_loss(out, batch)
    assert np.isfinite(float(total))
    # inference path (no ground-truth variances)
    out_i = model.apply(
        {"params": params}, batch["phones"], batch["phone_mask"], None, None,
        None, batch["sid"],
    )
    assert out_i["mel_postnet"].shape == (2, TINY.max_frames, TINY.n_mel)
    assert np.isfinite(np.asarray(out_i["mel_postnet"])).all()


def test_fs2_overfits(rng):
    model = FastSpeech2(TINY)
    batch = _batch(rng)
    params = model.init(
        jax.random.key(0), batch["phones"], batch["phone_mask"],
        batch["durations"], batch["pitch"], batch["energy"], batch["sid"],
    )["params"]
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, batch["phones"], batch["phone_mask"],
                batch["durations"], batch["pitch"], batch["energy"], batch["sid"],
            )
            return fastspeech2_loss(out, batch)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for _ in range(25):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8
