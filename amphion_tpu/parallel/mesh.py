"""Device-mesh bootstrap and sharding helpers.

The reference's only parallelism is DDP via HF Accelerate/NCCL (reference:
`models/base/new_trainer.py:185-198`, SURVEY §2.10). The TPU-native design
instead builds an n-D `jax.sharding.Mesh` up front and expresses *all*
parallelism as shardings over it:

- ``data``  — batch-dimension data parallelism (grad sync = implicit psum,
  compiled to ICI all-reduce by XLA);
- ``model`` — optional tensor parallelism axis for the larger transformers
  (Vevo AR 780M); size 1 in the common case, so the same code runs 1-chip.

Everything is written against the mesh so the same train step runs on one
chip, a v5e pod slice, or the 8-device virtual CPU mesh used by the tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh shape. -1 means 'all remaining devices'."""

    data: int = -1
    model: int = 1
    axis_names: tuple[str, ...] = field(default=("data", "model"))

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        if self.data == -1:
            if n_devices % model != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by model={model}"
                )
            return n_devices // model, model
        if self.data * model != n_devices:
            raise ValueError(
                f"mesh {self.data}x{model} != {n_devices} devices"
            )
        return self.data, model


def build_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    """Build a 2-D ('data', 'model') mesh over the available devices."""
    spec = spec or MeshSpec()
    devices = devices if devices is not None else jax.devices()
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, spec.axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put a pytree of arrays batch-sharded over the 'data' axis."""

    def _put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        return jax.device_put(x, data_sharding(mesh, max(1, x.ndim)))

    return jax.tree_util.tree_map(_put, batch)
