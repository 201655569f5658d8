"""A/B the Vevo AR decode stage (int4+int8KV, 500 tokens) over int4-GEMV
block shapes. Uses the real model at bench scale; prints seconds/500tok."""
import os, time, json, sys
import numpy as np, jax, jax.numpy as jnp

def fence(x):
    v = jax.tree_util.tree_leaves(x)[0]
    _ = float(jnp.sum(v.astype(jnp.float32)))

from amphion_tpu.models.vc.ar_transformer import (
    ARTransformer, ARTransformerConfig, ar_transformer_generate,
)

r = jax.random.key(0)
ar = ARTransformer(ARTransformerConfig(
    input_vocab=32, output_vocab=8192, hidden=1536, num_layers=20,
    num_heads=16, intermediate=6144, max_position=4096))
import os as _os
CLEN = int(_os.environ.get("AMPHION_AB_CONTENT", "650"))
content = jnp.zeros((1, CLEN), jnp.int32)
cmask = jnp.ones((1, CLEN), jnp.float32)
out0 = jnp.zeros((1, 500), jnp.int32)
omask = jnp.ones((1, 500), jnp.float32)
params = ar.init(r, content, cmask, out0, omask, method=ARTransformer.loss)["params"]

def run(rng):
    return ar_transformer_generate(ar, params, content, rng, max_new=500,
                                   top_k=40, compute_dtype="int4")[0]

fence(run(jax.random.key(2)))
ts = []
for i in range(5):
    t0 = time.perf_counter(); fence(run(jax.random.key(3+i)))
    ts.append(time.perf_counter()-t0)
ts.sort()
print(json.dumps({"cfg": {k: os.environ.get(k, "") for k in
    ("AMPHION_INT4_BLOCK_N","AMPHION_INT4_BLOCK_K","AMPHION_AB_CONTENT","AMPHION_KV_QUANT")},
    "ar_500tok_median_s": round(ts[2],4), "all": [round(t,4) for t in ts]}))
