"""Explain the MaskGCT serving result (req/s FALLS with batch): measure
t(B) and achieved TFLOP/s for the T2S sampler at B=1/2/8. If achieved
TFLOP/s is ~constant across B, the per-step program is already
throughput-bound at B=1 (full-seq matmuls tile the MXU; no idle
dimension for batch to fill) and latency must scale ~linearly with B."""
import json, time
import numpy as np, jax, jax.numpy as jnp

def fence(x):
    v = jax.tree_util.tree_leaves(x)[0]
    _ = float(jnp.sum(v.astype(jnp.float32)))

from amphion_tpu.models.tts.maskgct.maskgct import (
    MaskGCTT2S, T2SConfig, t2s_sample,
)

t2s = MaskGCTT2S(T2SConfig(hidden=1024, num_layers=16, num_heads=16,
                           codebook_size=8192, phone_vocab=256))
r = jax.random.key(0)
lp, lt, lphone = 150, 500, 64
t2s_params = t2s.init(r, jnp.zeros((1, lp), jnp.int32), jnp.ones((1, lp)),
                      jnp.zeros((1, lphone), jnp.int32),
                      jnp.ones((1, lphone)), jax.random.key(1),
                      method=MaskGCTT2S.compute_loss)["params"]

rows = []
for b in (1, 2, 8):
    prompt = jnp.zeros((b, lp), jnp.int32)
    phones = jnp.zeros((b, lphone), jnp.int32)
    def run(rng):
        return t2s_sample(t2s, t2s_params, prompt, phones, lt, rng,
                          n_steps=25, cfg=2.5)
    fence(run(jax.random.key(2)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter(); fence(run(jax.random.key(3 + i)))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1]
    # analytic FLOPs: 25 steps x 2 CFG passes, seq = lp+lt, 16 layers,
    # h=1024, ffn 4096: per token 2*(4*h^2 + 2*h*ffn) + attn 4*h*seq
    seq = lp + lt
    per_tok = 2 * (4 * 1024 * 1024 + 2 * 1024 * 4096) * 16 \
        + 4 * 1024 * seq * 16
    fl = 50 * b * seq * per_tok
    rows.append({"b": b, "t_s": round(dt, 4),
                 "t_per_req_s": round(dt / b, 4),
                 "tflops": round(fl / 1e12, 2),
                 "achieved_tflops_s": round(fl / dt / 1e12, 1),
                 "mfu_pct": round(100 * fl / dt / 197e12, 1)})
    print(json.dumps(rows[-1]), flush=True)
print(json.dumps({"t2s_batch_scaling": rows}))
