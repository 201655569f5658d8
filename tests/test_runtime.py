import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import flax.linen as nn

from amphion_tpu.runtime.checkpoint import CheckpointManager, parse_ckpt_name
from amphion_tpu.runtime.loop import LoopConfig, TrainLoop
from amphion_tpu.runtime.train_state import create_train_state


class Lin(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(1)(x)


def _state(lr=0.1):
    return create_train_state(
        Lin(), jax.random.key(0), jnp.zeros((1, 3)), optax.sgd(lr)
    )


def test_parse_ckpt_name():
    assert parse_ckpt_name("epoch-0004_step-0000123_loss-1.250000") == (4, 123)


def test_checkpoint_save_restore_resume(tmp_path):
    state = _state()
    mgr = CheckpointManager(tmp_path, [1], [2])
    # do a fake update so params differ from init
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads)
    mgr.save(state, epoch=1, step=int(state.step), loss=0.5)

    fresh = _state()
    restored, epoch, step = mgr.restore(fresh)
    assert (epoch, step) == (1, 1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b),
        restored.params, state.params,
    )
    # finetune: params only, step stays fresh
    ft, _, _ = mgr.restore(fresh, resume_type="finetune")
    assert int(ft.step) == 0
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b), ft.params, state.params
    )


def test_checkpoint_keep_last_gc(tmp_path):
    state = _state()
    mgr = CheckpointManager(tmp_path, [1], keep_last=[2])
    for e in range(1, 5):
        mgr.save(state, epoch=e, step=e, loss=1.0)
    names = sorted(p.name for p in tmp_path.iterdir() if p.name.startswith("epoch-"))
    assert len(names) == 2
    assert names[-1].startswith("epoch-0004")


def test_checkpoint_multi_state_dict(tmp_path):
    states = {"g": _state(), "d": _state()}
    mgr = CheckpointManager(tmp_path, [1], [1])
    mgr.save(states, 1, 1, 0.0)
    restored, _, _ = mgr.restore({"g": _state(), "d": _state()})
    assert set(restored) == {"g", "d"}


def test_train_loop_epoch_mode(tmp_path):
    state = _state(lr=0.05)
    x = np.random.default_rng(0).standard_normal((16, 3)).astype(np.float32)
    y = (x @ np.array([[1.0], [2.0], [-1.0]])).astype(np.float32)

    @jax.jit
    def step(state, batch):
        def loss_fn(p):
            pred = state.apply_fn({"params": p}, batch["x"])
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    def data():
        for i in range(0, 16, 4):
            yield {"x": x[i : i + 4], "y": y[i : i + 4]}

    mgr = CheckpointManager(tmp_path, [2], [1])
    loop = TrainLoop(
        LoopConfig(max_epoch=4, log_interval=100), step, state, data, ckpt=mgr
    )
    out = loop.run()
    assert loop.step == 16
    assert mgr.latest() is not None
    # loss decreased
    _, m0 = step(state, {"x": x, "y": y})
    _, m1 = step(out, {"x": x, "y": y})
    assert float(m1["loss"]) < float(m0["loss"])


def test_train_loop_nan_guard():
    state = _state()

    def bad_step(state, batch):
        return state, {"loss": jnp.float32(np.nan)}

    loop = TrainLoop(
        LoopConfig(max_epoch=1, nan_guard=True), bad_step, state,
        lambda: iter([{"x": 0}]),
    )
    with pytest.raises(FloatingPointError):
        loop.run()


def test_train_loop_step_mode_resume(tmp_path):
    state = _state(lr=0.01)

    @jax.jit
    def step(state, batch):
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        return state.apply_gradients(grads), {"loss": jnp.float32(1.0)}

    mgr = CheckpointManager(tmp_path, [1], [-1])
    loop = TrainLoop(
        LoopConfig(max_steps=5, save_checkpoints_steps=2), step, state,
        lambda: iter([{}] * 100), ckpt=mgr,
    )
    loop.run()
    assert loop.step == 5
    loop2 = TrainLoop(
        LoopConfig(max_steps=5), step, _state(), lambda: iter([{}] * 100), ckpt=mgr
    )
    loop2.resume()
    assert loop2.step == 5 and int(loop2.states.step) == 5


def test_train_loop_metrics_tracker(tmp_path):
    import json

    state = _state()

    @jax.jit
    def step(state, batch):
        return state, {"loss": jnp.float32(1.5)}

    loop = TrainLoop(
        LoopConfig(max_steps=3, metrics_path=str(tmp_path / "m.jsonl")),
        step, state, lambda: iter([{}] * 10),
    )
    loop.run()
    lines = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
    assert len(lines) == 3
    assert lines[-1]["step"] == 3 and lines[-1]["loss"] == 1.5


def test_gradient_accumulation():
    """optax.MultiSteps wrapper: k micro-steps average into one update
    (ref accelerator.accumulate, new_trainer.py:362)."""
    import optax

    from amphion_tpu.runtime.optimizers import maybe_accumulate
    from amphion_tpu.utils.config import JsonHParams

    tx = maybe_accumulate(optax.sgd(1.0),
                          JsonHParams(gradient_accumulation_steps=2))
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g1 = {"w": jnp.full(3, 2.0)}
    g2 = {"w": jnp.full(3, 4.0)}
    u1, state = tx.update(g1, state, params)
    assert float(jnp.abs(u1["w"]).max()) == 0.0  # buffered, no update yet
    u2, state = tx.update(g2, state, params)
    np.testing.assert_allclose(np.asarray(u2["w"]), -3.0)  # mean(2,4)*lr

    # k=1 is a no-op passthrough
    tx1 = maybe_accumulate(optax.sgd(1.0), JsonHParams())
    s1 = tx1.init(params)
    u, _ = tx1.update(g1, s1, params)
    np.testing.assert_allclose(np.asarray(u["w"]), -2.0)
