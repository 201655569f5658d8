import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.parallel.mesh import MeshSpec, build_mesh, data_sharding, shard_batch


def test_build_mesh_8_devices():
    mesh = build_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1


def test_build_mesh_2d():
    mesh = build_mesh(MeshSpec(data=4, model=2))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_shard_batch_and_psum():
    mesh = build_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding == data_sharding(mesh, 2)

    @jax.jit
    def mean(b):
        return jnp.mean(b["x"])

    assert float(mean(sharded)) == float(np.mean(batch["x"]))


def test_trainloop_auto_data_parallel(tmp_path):
    """TrainLoop auto-builds the mesh on multi-device hosts: params
    replicate, divisible batch dims shard over 'data', and the result
    matches the single-device run bit-for-bit (GSPMD DP is just a layout)."""
    import optax

    from amphion_tpu.runtime.loop import LoopConfig, TrainLoop
    from amphion_tpu.runtime.train_state import TrainState

    def make_state():
        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
        tx = optax.sgd(0.1)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=tx.init(params), rng=jax.random.key(0),
                          apply_fn=None, tx=tx)

    @jax.jit
    def step(state, batch):
        def loss_fn(p):
            y = batch["x"] @ p["w"] + p["b"]
            return jnp.mean((y - batch["y"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    rng = np.random.default_rng(0)
    batches = [
        {"x": rng.standard_normal((8, 4)).astype(np.float32),
         "y": rng.standard_normal((8, 4)).astype(np.float32)}
        for _ in range(3)
    ]

    def data():
        return iter(batches)

    results = {}
    for mesh in ("auto", None):
        loop = TrainLoop(LoopConfig(max_steps=3, log_interval=10),
                         step, make_state(), data, mesh=mesh)
        out = loop.run()
        results[mesh] = np.asarray(out.params["w"])
    assert jax.device_count() == 8
    np.testing.assert_allclose(results["auto"], results[None], atol=1e-6)
