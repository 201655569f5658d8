"""Parameter sharding rules: tensor parallelism for the transformer backbones.

The reference has no TP (SURVEY §2.10); its largest model is the 780M Vevo
AR transformer. The TPU build keeps the mesh n-D-ready: these rules shard the
Llama backbone's weight matrices over the 'model' axis so that the same
train/infer step runs 1-chip (model=1, rules degenerate to replication) or
tensor-parallel (attention heads + MLP split; XLA inserts the all-reduces).

Convention (Megatron-style):
- q/k/v projections, MLP gate/up: shard OUTPUT features   → P(None, 'model')
- o projection, MLP down:         shard INPUT features    → P('model', None)
- embeddings, norms, everything else: replicated.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL_PARALLEL = re.compile(r"(q_proj|k_proj|v_proj|gate_proj|up_proj)$")
_ROW_PARALLEL = re.compile(r"(o_proj|down_proj)$")


def llama_tp_spec(path: tuple, value) -> P:
    """PartitionSpec for one parameter given its tree path."""
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(names)
    if value.ndim == 2 and "kernel" in names[-1:]:
        parent = names[-2] if len(names) >= 2 else ""
        if _COL_PARALLEL.search(parent):
            return P(None, "model")
        if _ROW_PARALLEL.search(parent):
            return P("model", None)
    return P()


def shard_params_tp(params, mesh: Mesh):
    """device_put a params pytree with Llama TP rules over ``mesh``."""

    def place(path, x):
        return jax.device_put(x, NamedSharding(mesh, llama_tp_spec(path, x)))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    """The NamedSharding pytree matching `shard_params_tp` (for jit
    in_shardings/out_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, llama_tp_spec(path, x)), params
    )
