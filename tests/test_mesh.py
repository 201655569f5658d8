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
