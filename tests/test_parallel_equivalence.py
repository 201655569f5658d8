"""Sharded training must compute the same math as single-device training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn

from amphion_tpu.parallel.mesh import MeshSpec, build_mesh, shard_batch


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(16)(x)
        x = nn.relu(x)
        return nn.Dense(1)(x)


def test_data_parallel_loss_and_update_equivalence():
    model = MLP()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 8)).astype(np.float32)
    y = rng.standard_normal((16, 1)).astype(np.float32)
    params = model.init(jax.random.key(0), x)["params"]
    tx = optax.sgd(0.1)
    opt = tx.init(params)

    def step(params, opt, batch):
        def loss_fn(p):
            pred = model.apply({"params": p}, batch["x"])
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    # single-device reference
    p1, _, l1 = jax.jit(step)(params, opt, {"x": x, "y": y})

    # 8-way data parallel
    mesh = build_mesh(MeshSpec(data=8, model=1))
    sharded = shard_batch(mesh, {"x": x, "y": y})
    p8, _, l8 = jax.jit(step)(params, opt, sharded)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        p1, p8,
    )


def test_tensor_parallel_forward_equivalence():
    """TP-sharded Llama forward == replicated forward."""
    from amphion_tpu.modules.llama import LlamaConfig, LlamaDecoder
    from amphion_tpu.parallel.sharding import shard_params_tp

    cfg = LlamaConfig(hidden_size=32, num_layers=2, num_heads=4, max_position=16)
    dec = LlamaDecoder(cfg)
    x = jax.random.normal(jax.random.key(1), (2, 8, 32))
    params = dec.init(jax.random.key(0), x)["params"]
    ref = dec.apply({"params": params}, x)

    mesh = build_mesh(MeshSpec(data=4, model=2))
    params_tp = shard_params_tp(params, mesh)
    out = jax.jit(lambda p, x: dec.apply({"params": p}, x))(params_tp, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)
