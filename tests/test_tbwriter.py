"""Tests for the native TensorBoard event writer (ref capability:
Accelerate TB trackers, `models/base/new_trainer.py:683-692`): CRC32C
known-answer, TFRecord/proto round trip, and TrainLoop integration."""

from pathlib import Path

import numpy as np

from amphion_tpu.utils.tbwriter import (
    SummaryWriter,
    _masked_crc,
    crc32c,
    read_scalars,
)


def test_crc32c_known_answer():
    # RFC 3720 test vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_masked_crc_matches_tfrecord_spec():
    # masked = ((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32)
    crc = crc32c(b"abc")
    expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert _masked_crc(b"abc") == expect


def test_scalar_round_trip(tmp_path):
    w = SummaryWriter(tmp_path)
    w.add_scalar("train/loss", 0.5, 1)
    w.add_scalars({"train/loss": 0.25, "train/acc": 0.9}, 2)
    w.close()
    (f,) = list(Path(tmp_path).glob("events.out.tfevents.*"))
    scalars = read_scalars(f)
    assert (1, "train/loss", 0.5) in scalars
    assert (2, "train/acc", np.float32(0.9)) in [
        (s, t, np.float32(v)) for s, t, v in scalars]
    assert len(scalars) == 3


def test_trainloop_writes_tfevents(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from amphion_tpu.runtime.loop import LoopConfig, TrainLoop
    from amphion_tpu.runtime.train_state import TrainState

    import flax.linen as nn

    model = nn.Dense(1)
    x = np.random.default_rng(0).standard_normal((8, 3)).astype(np.float32)
    y = x.sum(1, keepdims=True).astype(np.float32)
    tx = optax.sgd(0.01)
    params = model.init(jax.random.key(0), x)["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), rng=jax.random.key(1),
                       apply_fn=model.apply, tx=tx)

    @jax.jit
    def step(state, batch):
        def loss_fn(p):
            pred = model.apply({"params": p}, batch["x"])
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    def data():
        yield {"x": x, "y": y}

    tb_dir = tmp_path / "tb"
    loop = TrainLoop(LoopConfig(max_epoch=3, log_interval=1,
                                tensorboard_dir=str(tb_dir)),
                     step, state, data, mesh=None)
    loop.run()
    (f,) = list(tb_dir.glob("events.out.tfevents.*"))
    scalars = read_scalars(f)
    steps = sorted({s for s, t, _ in scalars if t == "train/loss"})
    assert steps == [1, 2, 3]
    assert any(t == "perf/sec_per_step" for _, t, _ in scalars)
