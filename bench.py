"""Headline benchmark: HiFi-GAN copy-synthesis throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >=50x real-time 24 kHz vocoding per chip,
i.e. 1200 kHz-audio/sec/chip. vs_baseline = achieved / target.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig, HiFiGANGenerator

    cfg = HiFiGANConfig()  # V1, 24 kHz / hop 120
    gen = HiFiGANGenerator(cfg)

    batch, frames = 64, 1600  # 64 x 8 s utterances at 24 kHz (offline batch)
    rng = jax.random.key(0)
    mel = jax.random.normal(rng, (batch, frames, cfg.n_mel), jnp.float32)
    params = gen.init(rng, mel[:1, :8])["params"]
    # bf16 compute: cast params + input to bfloat16 (MXU-native), keep output f32
    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )

    @jax.jit
    def synthesize(p, m):
        return gen.apply({"params": p}, m.astype(jnp.bfloat16)).astype(jnp.float32)

    np.asarray(synthesize(params_bf16, mel))  # compile + warmup

    # NOTE: on the axon-tunneled TPU, block_until_ready() returns before the
    # computation finishes; a scalar device->host fetch is the reliable fence.
    n_iters = 15
    t0 = time.perf_counter()
    outs = [synthesize(params_bf16, mel) for _ in range(n_iters)]
    for o in outs:
        float(o[0, 0])  # force execution of each program
    dt = time.perf_counter() - t0

    samples_per_iter = batch * frames * cfg.hop_size
    khz_audio_per_sec = samples_per_iter * n_iters / dt / 1e3
    target = 24.0 * 50.0  # 50x real-time at 24 kHz, in kHz-audio/sec
    print(
        json.dumps(
            {
                "metric": "hifigan_vocoder_khz_audio_per_sec_per_chip",
                "value": round(khz_audio_per_sec, 1),
                "unit": "kHz-audio/sec/chip",
                "vs_baseline": round(khz_audio_per_sec / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
