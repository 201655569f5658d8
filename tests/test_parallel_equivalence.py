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


def test_continuous_engine_tp_equivalence():
    """Continuous engine under a TP-sharded mesh produces the SAME token
    streams as the single-device engine (round-5: dryrun program 6)."""
    from amphion_tpu.models.vc.ar_transformer import (
        ARTransformer,
        ARTransformerConfig,
    )
    from amphion_tpu.parallel.sharding import shard_params_tp
    from amphion_tpu.serving.continuous import ContinuousARBatcher

    cfg = ARTransformerConfig(
        input_vocab=16, output_vocab=32, hidden=64, num_layers=2,
        num_heads=4, intermediate=128, max_position=256)
    model = ARTransformer(cfg)
    z = jnp.zeros((1, 6), jnp.int32)
    m = jnp.ones((1, 6), jnp.float32)
    params = model.init(jax.random.key(0), z, m, z, m,
                        method=ARTransformer.loss)["params"]
    contents = [np.arange(5, dtype=np.int32) % 16,
                np.arange(4, dtype=np.int32) % 16]
    keys = [jax.random.key(11), jax.random.key(12)]

    def run(prm, mesh=None):
        import contextlib

        ctx = mesh if mesh is not None else contextlib.nullcontext()
        with ctx:
            eng = ContinuousARBatcher(
                model, prm, slots=2, capacity=64, chunk=4, buckets=(8,),
                max_new=8, top_k=4, compute_dtype="float32")
            r0 = eng.submit(contents[0], keys[0], max_new=8)
            eng.step_chunk()
            r1 = eng.submit(contents[1], keys[1], max_new=8)
            out = eng.run()
        return out[r0], out[r1]

    a0, a1 = run(params)
    mesh = build_mesh(MeshSpec(data=1, model=8))
    b0, b1 = run(shard_params_tp(params, mesh), mesh)
    np.testing.assert_array_equal(a0, b0)
    np.testing.assert_array_equal(a1, b1)


def test_speculative_tp_equivalence():
    """Speculative decode under the 2-D mesh == single-device greedy
    speculative decode (round-5: dryrun program 7)."""
    from amphion_tpu.models.vc.ar_transformer import (
        ARTransformer,
        ARTransformerConfig,
    )
    from amphion_tpu.models.vc.speculative import (
        ar_transformer_generate_speculative,
    )
    from amphion_tpu.parallel.sharding import shard_params_tp

    cfg = ARTransformerConfig(
        input_vocab=16, output_vocab=32, hidden=64, num_layers=2,
        num_heads=4, intermediate=128, max_position=256)
    model = ARTransformer(cfg)
    z = jnp.zeros((1, 6), jnp.int32)
    m = jnp.ones((1, 6), jnp.float32)
    params = model.init(jax.random.key(0), z, m, z, m,
                        method=ARTransformer.loss)["params"]
    content = (jnp.arange(5)[None] % 16).astype(jnp.int32)

    toks1, n1 = ar_transformer_generate_speculative(
        model, params, content, max_new=8, draft_layers=1, k=2,
        compute_dtype="float32")
    mesh = build_mesh(MeshSpec(data=4, model=2))
    with mesh:
        toks8, n8 = ar_transformer_generate_speculative(
            model, shard_params_tp(params, mesh), content, max_new=8,
            draft_layers=1, k=2, compute_dtype="float32")
    assert int(n1[0]) == int(n8[0])
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks8))
