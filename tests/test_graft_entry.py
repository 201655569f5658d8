"""The driver's entry points must keep working on the virtual CPU mesh."""

import jax
import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_tp_sharding_rules():
    from jax.sharding import PartitionSpec as P

    from amphion_tpu.modules.llama import LlamaConfig, LlamaDecoder
    from amphion_tpu.parallel.mesh import MeshSpec, build_mesh
    from amphion_tpu.parallel.sharding import llama_tp_spec, shard_params_tp

    cfg = LlamaConfig(hidden_size=32, num_layers=1, num_heads=4, max_position=16)
    dec = LlamaDecoder(cfg)
    params = dec.init(jax.random.key(0), jax.numpy.zeros((1, 4, 32)))["params"]
    mesh = build_mesh(MeshSpec(data=4, model=2))
    sharded = shard_params_tp(params, mesh)
    q = sharded["layer_0"]["attn"]["q_proj"]["kernel"]
    o = sharded["layer_0"]["attn"]["o_proj"]["kernel"]
    assert q.sharding.spec == P(None, "model")
    assert o.sharding.spec == P("model", None)
    # norms replicated
    assert sharded["final_norm"]["scale"].sharding.spec == P()
