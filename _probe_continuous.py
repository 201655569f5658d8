import time, json
import numpy as np, jax, jax.numpy as jnp
from amphion_tpu.models.vc.ar_transformer import (
    ARTransformer, ARTransformerConfig)
from amphion_tpu.serving.continuous import ContinuousARBatcher
r = jax.random.key(0)
ar = ARTransformer(ARTransformerConfig(
    input_vocab=32, output_vocab=8192, hidden=1536, num_layers=20,
    num_heads=16, intermediate=6144, max_position=4096))
t0_=jnp.zeros((1,8),jnp.int32); m0=jnp.ones((1,8),jnp.float32)
ap = ar.init(r, t0_, m0, t0_, m0, method=ARTransformer.loss)["params"]
content = np.zeros((650,), np.int32)

def mk():
    return ContinuousARBatcher(ar, ap, slots=4, chunk=64, buckets=(650,),
                               max_new=500, top_k=40,
                               compute_dtype="bfloat16")
eng = mk()
eng.submit(content, jax.random.key(1), max_new=64)
eng.run()
print("primed", flush=True)

# fresh engine, like the bench rung does
t0 = time.perf_counter()
eng = mk()
print("fresh engine ctor:", round(time.perf_counter()-t0, 2), flush=True)
lens = [128, 260, 390, 500]
t0 = time.perf_counter()
for i, L in enumerate(lens):
    ta = time.perf_counter()
    eng.submit(content, jax.random.key(10+i), max_new=L)
    n = eng.step_chunk()
    print(f"submit+chunk {i}: {time.perf_counter()-ta:.3f}s", flush=True)
while eng.queue or any(s.req is not None for s in eng.slots):
    ta = time.perf_counter()
    fin = eng.step_chunk()
    print(f"chunk: {time.perf_counter()-ta:.3f}s fin={fin}", flush=True)
print("total:", round(time.perf_counter()-t0, 2))
