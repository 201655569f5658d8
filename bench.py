"""Headline benchmark: HiFi-GAN copy-synthesis throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >=50x real-time 24 kHz vocoding per chip,
i.e. 1200 kHz-audio/sec/chip. vs_baseline = achieved / target.

`python bench.py --suite` additionally measures the other BASELINE.json
metrics (mel-extraction frames/sec, MaskGCT + VALL-E zero-shot RTF), one
JSON line each — the reproducible source of BENCHMARKS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: axon-tunnel compiles are expensive (minutes
# for the big models); cache executables across bench processes. Harmless
# no-op if the backend doesn't support serialization.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("AMPHION_JAX_CACHE",
                       os.path.join(os.path.dirname(__file__), ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass


def _fence(x) -> None:
    """Scalar device->host fetch: the reliable execution fence through the
    axon tunnel (block_until_ready returns early)."""
    float(jnp.asarray(x).reshape(-1)[0])


def _emit(metric, value, unit, vs_baseline, extra=None):
    rec = {"metric": metric, "value": round(value, 4),
           "unit": unit, "vs_baseline": round(vs_baseline, 3)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


# ---------------------------------------------------------------------------
# Roofline accounting (TPU v5e single chip, public spec):
#   bf16 matmul peak 197 TFLOP/s  ·  HBM bandwidth 819 GB/s
# Per bench we take the XLA-compiled program's own cost analysis
# (flops + bytes accessed) and report achieved TFLOP/s, MFU %, achieved
# HBM GB/s, and the compute-vs-HBM-bound verdict (which side of the
# roofline the program's arithmetic intensity falls on). "bytes accessed"
# is XLA's operand-byte count — an upper bound on true HBM traffic when
# ops fuse, so hbm_util_pct is conservative-high; MFU is exact.
# ---------------------------------------------------------------------------
_V5E_PEAK_BF16_FLOPS = 197e12
_V5E_HBM_BYTES_PER_S = 819e9


def _cost_analysis(jitted_fn, *args):
    """(flops, bytes) for one invocation, via the compiled program's own
    cost analysis; (0, 0) if the backend doesn't expose it."""
    try:
        c = jitted_fn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _roofline(flops, nbytes, dt_per_iter):
    """Extra JSON fields for _emit; {} when cost analysis was unavailable."""
    if flops <= 0 and nbytes <= 0:
        return {}
    out = {}
    if flops > 0:
        out["gflops_per_iter"] = round(flops / 1e9, 2)
        out["tflops_per_s"] = round(flops / dt_per_iter / 1e12, 2)
        out["mfu_pct"] = round(100 * flops / dt_per_iter
                               / _V5E_PEAK_BF16_FLOPS, 2)
    if nbytes > 0:
        out["gbytes_per_iter"] = round(nbytes / 1e9, 3)
        out["hbm_gbps"] = round(nbytes / dt_per_iter / 1e9, 1)
        out["hbm_util_pct"] = round(100 * nbytes / dt_per_iter
                                    / _V5E_HBM_BYTES_PER_S, 1)
    if flops > 0 and nbytes > 0:
        out["bound"] = ("compute" if flops / _V5E_PEAK_BF16_FLOPS
                        >= nbytes / _V5E_HBM_BYTES_PER_S else "hbm")
    return out


def _cost_analysis_scanned(whole, body, trips: int):
    """Corrected (flops, bytes) for a program whose hot path is a
    `lax.scan`: XLA's cost_analysis counts the scan body ONCE, not
    × trip count (the round-3 `ssl` rows published MFU 0.54% for a
    program actually at ~13% — a ~24× undercount). whole/body are
    (flops, bytes) pairs; result = whole + (trips-1) × body."""
    return (whole[0] + (trips - 1) * body[0],
            whole[1] + (trips - 1) * body[1])


def _repeats(default: int = 5) -> int:
    return int(os.environ.get("AMPHION_BENCH_REPEATS", default))


def _median_spread(values):
    """Median + spread fields — the honest estimator convention for any
    repeated measurement (round-3 verdict: a min-of-N headline is not).
    Returns (median, extra_fields)."""
    v = sorted(float(x) for x in values)
    med = v[len(v) // 2] if len(v) % 2 else 0.5 * (
        v[len(v) // 2 - 1] + v[len(v) // 2])
    return med, {"repeats": len(v), "spread_min": round(v[0], 4),
                 "spread_max": round(v[-1], 4),
                 "all_repeats": [round(x, 4) for x in v]}


def _param_bytes(params) -> int:
    return sum(int(np.prod(p.shape)) * p.dtype.itemsize
               for p in jax.tree_util.tree_leaves(params))


def _weight_stream(param_bytes_per_pass, n_passes, dt):
    """Roofline extra for sequential decode loops: every step re-reads the
    weights from HBM, so weight-bytes/s is the binding resource. Reports
    achieved weight-streaming bandwidth and % of HBM peak (upper bound on
    how much faster the loop could go at this dtype)."""
    gbps = param_bytes_per_pass * n_passes / dt / 1e9
    return {"weight_stream_gbps": round(gbps, 1),
            "hbm_util_pct": round(100 * gbps * 1e9 / _V5E_HBM_BYTES_PER_S, 1),
            "bound": "hbm (weight streaming)"}


def bench_mel() -> None:
    """Fused STFT->mel->log front end (BASELINE 'mel frames/sec')."""
    from amphion_tpu.ops.mel import MelConfig, mel_spectrogram

    cfg = MelConfig()
    batch, secs = 32, 10
    audio = jax.random.normal(
        jax.random.key(0), (batch, secs * cfg.sample_rate), jnp.float32)
    fn = jax.jit(lambda a: mel_spectrogram(a, cfg))
    _fence(fn(audio))
    n_iters = 10
    t0 = time.perf_counter()
    outs = [fn(audio) for _ in range(n_iters)]
    for o in outs:
        _fence(o)
    dt = time.perf_counter() - t0
    frames = outs[0].shape[-1] * batch * n_iters
    fps = frames / dt
    fl, by = _cost_analysis(fn, audio)
    # target: >=200 kHz-eq realtime (1000x RT at 200 fps); report vs 100k f/s
    _emit("mel_extraction_frames_per_sec", fps, "frames/sec", fps / 1e5,
          extra=_roofline(fl, by, dt / n_iters))


def bench_bigvgan() -> None:
    """Full-size BigVGAN with the fused AA-SnakeBeta Pallas kernel."""
    import dataclasses

    from amphion_tpu.models.vocoders.bigvgan import (
        BigVGANConfig,
        BigVGANGenerator,
    )

    cfg = BigVGANConfig(use_pallas_act=True)
    batch, frames = 16, 800
    mel = jax.random.normal(jax.random.key(0), (batch, frames, cfg.n_mel))
    gen = BigVGANGenerator(dataclasses.replace(cfg, use_pallas_act=False))
    params = gen.init(jax.random.key(0), mel[:1, :8])["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    g = BigVGANGenerator(cfg)
    fn = jax.jit(lambda p, m: g.apply(
        {"params": p}, m.astype(jnp.bfloat16)).astype(jnp.float32))
    _fence(fn(params, mel))
    n = 8
    t0 = time.perf_counter()
    outs = [fn(params, mel) for _ in range(n)]
    for o in outs:
        _fence(o)
    dt = time.perf_counter() - t0
    khz = batch * frames * cfg.hop_size * n / dt / 1e3
    fl, by = _cost_analysis(fn, params, mel)
    _emit("bigvgan_vocoder_khz_audio_per_sec_per_chip", khz,
          "kHz-audio/sec/chip", khz / (24.0 * 50.0),
          extra=_roofline(fl, by, dt / n))


def bench_maskgct_rtf() -> None:
    """Full-size MaskGCT zero-shot inference RTF (target < 0.1)."""
    from amphion_tpu.models.tts.maskgct.maskgct import (
        MaskGCTS2A, MaskGCTT2S, S2AConfig, T2SConfig, s2a_sample, t2s_sample,
    )

    t2s = MaskGCTT2S(T2SConfig(hidden=1024, num_layers=16, num_heads=16,
                               codebook_size=8192, phone_vocab=256))
    s2a = MaskGCTS2A(S2AConfig(hidden=1024, num_layers=16, num_heads=16,
                               codebook_size=1024, num_quantizers=8,
                               semantic_dim=384))
    r = jax.random.key(0)
    lp, lt, lphone = 150, 500, 64  # 3 s prompt + 10 s target @50 Hz
    prompt_sem = jnp.zeros((1, lp), jnp.int32)
    phones = jnp.zeros((1, lphone), jnp.int32)
    t2s_params = t2s.init(r, prompt_sem, jnp.ones((1, lp)), phones,
                          jnp.ones((1, lphone)), jax.random.key(1),
                          method=MaskGCTT2S.compute_loss)["params"]
    sem_feats = jnp.zeros((1, lp + lt, 384))
    prompt_ac = jnp.zeros((1, 8, lp), jnp.int32)
    s2a_params = s2a.init(r, jnp.zeros((1, 8, lp + lt), jnp.int32),
                          jnp.ones((1, lp + lt)), sem_feats,
                          jax.random.key(1),
                          method=MaskGCTS2A.compute_loss)["params"]

    def run(rng):
        sem = t2s_sample(t2s, t2s_params, prompt_sem, phones, lt, rng,
                         n_steps=25, cfg=2.5)
        codes = s2a_sample(s2a, s2a_params, sem_feats, prompt_ac, lt, rng,
                           first_layer_steps=16)
        return codes

    _fence(run(jax.random.key(2)))  # compile
    rtfs = []
    for i in range(_repeats()):
        t0 = time.perf_counter()
        _fence(run(jax.random.key(3 + i)))
        rtfs.append((time.perf_counter() - t0) / 10.0)  # 10 s of audio
    rtf, spread = _median_spread(rtfs)
    dt = rtf * 10.0
    # iterative mask-predict: every sampler step re-reads the full weights
    # (T2S 25 steps ×2 CFG passes + S2A 16+7 steps)
    pb = _param_bytes(t2s_params) * 50 + _param_bytes(s2a_params) * 23
    _emit("maskgct_zero_shot_rtf", rtf, "RTF (median, lower better)",
          0.1 / max(rtf, 1e-9),
          extra={**_weight_stream(pb, 1, dt), **spread})




def _serving_batches(default=(1, 4, 8)):
    """Batch ladder for serving sweeps; AMPHION_BENCH_BATCHES="1,8,16,32"
    extends it (each size is its own compiled program — minutes of compile
    through the tunnel, so the big ladder is opt-in)."""
    env = os.environ.get("AMPHION_BENCH_BATCHES", "")
    return tuple(int(x) for x in env.split(",") if x) or default

def bench_maskgct_serving(batch_sizes=None) -> None:
    """Batched serving throughput: B concurrent zero-shot requests through
    the ragged samplers (one compiled program per batch size). The
    mask-predict decode is weight-HBM-bound at B=1, so per-request RTF
    should drop ~linearly with B until the MXU saturates — this bench
    measures that multiplier (amphion_tpu/serving/, reference has no
    batched serving path)."""
    from amphion_tpu.models.tts.maskgct.maskgct import (
        MaskGCTS2A, MaskGCTT2S, S2AConfig, T2SConfig,
    )
    from amphion_tpu.models.tts.maskgct.ragged_sampling import (
        s2a_sample_ragged, t2s_sample_ragged,
    )

    batch_sizes = batch_sizes or _serving_batches()
    t2s = MaskGCTT2S(T2SConfig(hidden=1024, num_layers=16, num_heads=16,
                               codebook_size=8192, phone_vocab=256))
    s2a = MaskGCTS2A(S2AConfig(hidden=1024, num_layers=16, num_heads=16,
                               codebook_size=1024, num_quantizers=8,
                               cond_codebook_size=8192))
    r = jax.random.key(0)
    lp, lt, lphone = 150, 500, 64  # 3 s prompt + 10 s target @50 Hz
    t2s_params = t2s.init(r, jnp.zeros((1, lp), jnp.int32), jnp.ones((1, lp)),
                          jnp.zeros((1, lphone), jnp.int32),
                          jnp.ones((1, lphone)), jax.random.key(1),
                          method=MaskGCTT2S.compute_loss)["params"]
    s2a_params = s2a.init(r, jnp.zeros((1, 8, lp + lt), jnp.int32),
                          jnp.ones((1, lp + lt)),
                          jnp.zeros((1, lp + lt), jnp.int32),
                          jax.random.key(1),
                          method=MaskGCTS2A.compute_loss)["params"]

    results, dt_by = {}, {}
    for b in batch_sizes:
        # mixed lengths around the bucket — the realistic serving shape
        plen = jnp.asarray([lp - (i % 3) * 10 for i in range(b)], jnp.int32)
        tlen = jnp.asarray([lt - (i % 4) * 25 for i in range(b)], jnp.int32)
        phlen = jnp.asarray([lphone - (i % 2) * 8 for i in range(b)], jnp.int32)
        prompt_sem = jnp.zeros((b, lp), jnp.int32)
        phones = jnp.zeros((b, lphone), jnp.int32)
        prompt_ac = jnp.zeros((b, 8, lp), jnp.int32)
        sem_packed = jnp.zeros((b, lp + lt), jnp.int32)
        keys = jax.vmap(jax.random.key)(jnp.arange(b, dtype=jnp.uint32))

        def run(keys):
            sem = t2s_sample_ragged(t2s, t2s_params, prompt_sem, plen,
                                    phones, phlen, tlen, keys, lt,
                                    n_steps=25, cfg=2.5)
            codes = s2a_sample_ragged(s2a, s2a_params, sem_packed, prompt_ac,
                                      plen, tlen, keys, lt,
                                      first_layer_steps=16)
            return codes

        _fence(run(keys))  # compile
        n_iters = 3
        t0 = time.perf_counter()
        for i in range(n_iters):
            _fence(run(keys))
        dt = (time.perf_counter() - t0) / n_iters
        dt_by[b] = dt
        audio_s = float(jnp.sum(tlen)) / 50.0
        results[b] = dt / audio_s  # per-request RTF at this batch size
        print(f"# serving B={b}: {dt:.3f}s/batch, {audio_s:.1f}s audio, "
              f"per-request RTF {results[b]:.4f}", file=sys.stderr)

    b_max = max(batch_sizes)
    mult = results[min(batch_sizes)] / max(results[b_max], 1e-9)
    _emit("maskgct_serving_rtf_b%d" % b_max, results[b_max],
          "per-request RTF at batch %d (lower better)" % b_max,
          0.1 / max(results[b_max], 1e-9),
          extra={"rtf_by_batch": {str(k): round(v, 5) for k, v in
                                  results.items()},
                 "requests_per_s_by_batch": {
                     str(k): round(k / max(dt_by[k], 1e-9), 2)
                     for k in results},
                 "batch_latency_s_by_batch": {
                     str(k): round(dt_by[k], 3) for k in results},
                 "throughput_multiplier_vs_b1": round(mult, 2)})


def bench_serving_latency(qps_points=None, duration_s=None) -> None:
    """Latency vs LOAD (VERDICT r3 #7): an open-loop Poisson arrival
    process drives the MaskGCT zero-shot backend through the real
    MicroBatcher (batch rung ladder 1/2/4/8, 30 ms coalescing window) at
    several QPS; reports p50/p95/p99 end-to-end per-request latency per
    operating point. Single-chip capacity is ~3 req/s (BENCHMARKS.md),
    so the ladder spans under-load → near-capacity; the tail blowing up
    at the top rung is the queueing signature the table exists to show."""
    from amphion_tpu.models.tts.maskgct.maskgct import (
        MaskGCTS2A, MaskGCTT2S, S2AConfig, T2SConfig,
    )
    from amphion_tpu.models.tts.maskgct.ragged_sampling import (
        s2a_sample_ragged, t2s_sample_ragged,
    )
    from amphion_tpu.serving.batcher import MicroBatcher
    from amphion_tpu.serving.loadgen import run_load

    t2s = MaskGCTT2S(T2SConfig(hidden=1024, num_layers=16, num_heads=16,
                               codebook_size=8192, phone_vocab=256))
    s2a = MaskGCTS2A(S2AConfig(hidden=1024, num_layers=16, num_heads=16,
                               codebook_size=1024, num_quantizers=8,
                               cond_codebook_size=8192))
    r = jax.random.key(0)
    lp, lt, lphone = 150, 500, 64
    t2s_params = t2s.init(r, jnp.zeros((1, lp), jnp.int32), jnp.ones((1, lp)),
                          jnp.zeros((1, lphone), jnp.int32),
                          jnp.ones((1, lphone)), jax.random.key(1),
                          method=MaskGCTT2S.compute_loss)["params"]
    s2a_params = s2a.init(r, jnp.zeros((1, 8, lp + lt), jnp.int32),
                          jnp.ones((1, lp + lt)),
                          jnp.zeros((1, lp + lt), jnp.int32),
                          jax.random.key(1),
                          method=MaskGCTS2A.compute_loss)["params"]
    rungs = (1, 2, 4, 8)

    def run_rung(b, seeds):
        plen = jnp.full((b,), lp, jnp.int32)
        tlen = jnp.full((b,), lt, jnp.int32)
        phlen = jnp.full((b,), lphone, jnp.int32)
        keys = jax.vmap(jax.random.key)(seeds.astype(jnp.uint32))
        sem = t2s_sample_ragged(t2s, t2s_params,
                                jnp.zeros((b, lp), jnp.int32), plen,
                                jnp.zeros((b, lphone), jnp.int32), phlen,
                                tlen, keys, lt, n_steps=25, cfg=2.5)
        return s2a_sample_ragged(s2a, s2a_params,
                                 jnp.zeros((b, lp + lt), jnp.int32),
                                 jnp.zeros((b, 8, lp), jnp.int32),
                                 plen, tlen, keys, lt,
                                 first_layer_steps=16)

    def run_batch(bucket, payloads):
        n = len(payloads)
        rung = next(x for x in rungs if x >= n)
        seeds = np.asarray(list(payloads) + [0] * (rung - n))
        codes = run_rung(rung, jnp.asarray(seeds))
        _fence(codes)
        return [np.asarray(codes[i]) for i in range(n)]

    for b in rungs:  # pre-compile every rung outside the timed window
        _fence(run_rung(b, jnp.arange(b)))
        print(f"# rung {b} compiled", file=sys.stderr)

    mb = MicroBatcher(run_batch, bucket_fn=lambda p: 0, max_batch=8,
                      max_wait_ms=30.0)
    qps_points = qps_points or tuple(
        float(x) for x in os.environ.get(
            "AMPHION_BENCH_QPS", "0.5,1.5,3.0").split(","))
    duration_s = duration_s or float(
        os.environ.get("AMPHION_BENCH_LOAD_S", "20"))
    rows = []
    for qi, qps in enumerate(qps_points):
        res = run_load(mb.submit, lambda i: 1000 * qi + i, qps=qps,
                       duration_s=duration_s, seed=qi)
        rows.append(res.row())
        print(f"# qps {qps}: {res.row()}", file=sys.stderr)
    mb.shutdown()
    mid = rows[min(1, len(rows) - 1)]
    _emit("serving_latency_maskgct_p95_ms", mid["p95_ms"],
          f"p95 end-to-end latency at {mid['qps_target']} qps "
          "(10 s utterances, Poisson open loop)",
          1.0, extra={"latency_vs_load": rows,
                      "batcher": mb.stats.snapshot()})


def bench_valle_serving(batch_sizes=None, compute_dtype="bfloat16") -> None:
    """Batched VALL-E serving: B concurrent zero-shot requests through one
    ragged AR prefill + decode scan + NAR fill (models/tts/valle/valle.py
    ar_generate_ragged). The 750-step AR loop is weight-HBM-bound at B=1 —
    batching amortizes the weight stream across requests."""
    from amphion_tpu.models.tts.valle.valle import (
        VALLE, VALLEConfig, valle_generate_ragged,
    )

    batch_sizes = batch_sizes or _serving_batches()
    model = VALLE(VALLEConfig(num_phones=256, audio_vocab=1024,
                              num_quantizers=8, hidden=1024, num_layers=12,
                              num_heads=16, max_position=4096))
    r = jax.random.key(0)
    lphone, lp, new = 64, 225, 750  # 3 s prompt + 10 s target @75 Hz
    params = model.init(
        r, jnp.zeros((1, lphone), jnp.int32), jnp.ones((1, lphone)),
        jnp.zeros((1, 8, lp), jnp.int32), jnp.ones((1, lp)),
        jax.random.key(1), method=VALLE.train_loss,
    )["params"]

    results, dt_by = {}, {}
    for b in batch_sizes:
        phones = jnp.zeros((b, lphone), jnp.int32)
        prompts = jnp.zeros((b, 8, lp), jnp.int32)
        phlen = jnp.asarray([lphone - (i % 2) * 8 for i in range(b)], jnp.int32)
        plen = jnp.asarray([lp - (i % 3) * 15 for i in range(b)], jnp.int32)
        keys = jax.vmap(jax.random.key)(jnp.arange(b, dtype=jnp.uint32))

        def run(keys):
            return valle_generate_ragged(
                model, params, phones, phlen, prompts, plen, keys,
                max_new=new, temperature=1.0, top_k=50,
                compute_dtype=compute_dtype,
            )[0]

        _fence(run(keys))
        n_iters = 3
        t0 = time.perf_counter()
        for i in range(n_iters):
            _fence(run(keys))
        dt = (time.perf_counter() - t0) / n_iters
        dt_by[b] = dt
        audio_s = b * new / 75.0  # random weights don't EOS — full budget
        results[b] = dt / audio_s
        print(f"# valle serving B={b}: {dt:.3f}s/batch, {audio_s:.1f}s audio,"
              f" per-request RTF {results[b]:.4f}", file=sys.stderr)

    b_max = max(batch_sizes)
    mult = results[min(batch_sizes)] / max(results[b_max], 1e-9)
    _emit("valle_serving_rtf_b%d" % b_max, results[b_max],
          "per-request RTF at batch %d (lower better)" % b_max,
          0.1 / max(results[b_max], 1e-9),
          extra={"rtf_by_batch": {str(k): round(v, 5) for k, v in
                                  results.items()},
                 "requests_per_s_by_batch": {
                     str(k): round(k / max(dt_by[k], 1e-9), 2)
                     for k in results},
                 "batch_latency_s_by_batch": {
                     str(k): round(dt_by[k], 3) for k in results},
                 "throughput_multiplier_vs_b1": round(mult, 2)})


def bench_vevo_serving(batch_sizes=None, compute_dtype="bfloat16") -> None:
    """Batched Vevo VC serving: B concurrent requests through ONE ragged
    AR prefill + 500-step decode scan, ONE ragged 32-step FM ODE, and one
    Vocos pass (`amphion_tpu/serving/VevoService` path). The 780M-class AR
    decode is weight-HBM-bound at B=1 (see vevo_zero_shot_rtf roofline) —
    batching amortizes the per-token weight stream across requests, which
    is the single-chip lever left after int4. Same model scales as
    bench_vevo_rtf (ref `models/svc/vevosing/README.md:24-27`)."""
    from amphion_tpu.models.vc.ar_transformer import (
        ARTransformer, ARTransformerConfig, ar_transformer_generate_ragged,
    )
    from amphion_tpu.models.vc.flow_matching_transformer import (
        FlowMatchingTransformer, FMTConfig, fmt_inference_ragged,
    )
    from amphion_tpu.models.vocoders.vocos import VocosConfig, VocosGenerator

    r = jax.random.key(0)
    ar = ARTransformer(ARTransformerConfig(
        input_vocab=32, output_vocab=8192, hidden=1536, num_layers=20,
        num_heads=16, intermediate=6144, max_position=4096))
    toks0 = jnp.zeros((1, 8), jnp.int32)
    m0 = jnp.ones((1, 8), jnp.float32)
    ar_params = ar.init(r, toks0, m0, toks0, m0,
                        method=ARTransformer.loss)["params"]
    lc, lp, lt, new = 650, 281, 938, 500
    fm = FlowMatchingTransformer(FMTConfig(hidden=1024, num_layers=16))
    mel0 = jnp.zeros((1, 10, 80))
    fm_params = fm.init(r, mel0, jnp.zeros((1, 10), jnp.int32),
                        jnp.ones((1, 10)).at[:, 4:].set(0.0),
                        jnp.ones((1, 10)), jax.random.key(1),
                        method=FlowMatchingTransformer.loss)["params"]
    voc = VocosGenerator(VocosConfig(dim=1280, intermediate_dim=4096,
                                     num_layers=24))
    voc_params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16),
        voc.init(r, jnp.zeros((1, 16, 80)))["params"])
    voc_fwd = jax.jit(
        lambda prm, m: voc.apply({"params": prm}, m.astype(jnp.bfloat16)))

    batch_sizes = batch_sizes or _serving_batches()
    results, dt_by = {}, {}
    for b in batch_sizes:
        content = jnp.zeros((b, lc), jnp.int32)
        clen = jnp.asarray([lc - (i % 3) * 40 for i in range(b)], jnp.int32)
        ptoks = jnp.zeros((b, lp), jnp.int32)
        plen = jnp.asarray([lp - (i % 3) * 20 for i in range(b)], jnp.int32)
        ttoks = jnp.zeros((b, lt), jnp.int32)
        tlen = jnp.asarray([lt - (i % 4) * 30 for i in range(b)], jnp.int32)
        pmel = jnp.zeros((b, lp, 80))
        keys = jax.vmap(jax.random.key)(jnp.arange(b, dtype=jnp.uint32))

        def run(keys):
            toks, _ = ar_transformer_generate_ragged(
                ar, ar_params, content, clen, keys, max_new=new, top_k=40,
                compute_dtype=compute_dtype)
            del toks  # frame-aligned FM tokens precomputed (as in vevo_rtf)
            mel = fmt_inference_ragged(
                fm, fm_params, ptoks, plen, ttoks, tlen, pmel, keys,
                num_steps=32, cfg_scale=1.0, compute_dtype=compute_dtype)
            return voc_fwd(voc_params, mel)

        _fence(run(keys))
        n_iters = 3
        t0 = time.perf_counter()
        for i in range(n_iters):
            _fence(run(keys))
        dt = (time.perf_counter() - t0) / n_iters
        dt_by[b] = dt
        audio_s = float(jnp.sum(tlen)) / 93.75  # hop-256 @ 24 kHz
        results[b] = dt / audio_s
        print(f"# vevo serving B={b}: {dt:.3f}s/batch, {audio_s:.1f}s audio,"
              f" per-request RTF {results[b]:.4f}", file=sys.stderr)

    b_max = max(batch_sizes)
    mult = results[min(batch_sizes)] / max(results[b_max], 1e-9)
    sfx = "" if compute_dtype == "bfloat16" else f"_{compute_dtype}"
    _emit("vevo_serving_rtf%s_b%d" % (sfx, b_max), results[b_max],
          "per-request RTF at batch %d (lower better)" % b_max,
          0.1 / max(results[b_max], 1e-9),
          extra={"rtf_by_batch": {str(k): round(v, 5) for k, v in
                                  results.items()},
                 "requests_per_s_by_batch": {
                     str(k): round(k / max(dt_by[k], 1e-9), 2)
                     for k in results},
                 "batch_latency_s_by_batch": {
                     str(k): round(dt_by[k], 3) for k in results},
                 "throughput_multiplier_vs_b1": round(mult, 2)})


def bench_valle_rtf(compute_dtype="bfloat16") -> None:
    """Full-size VALL-E zero-shot inference RTF (target < 0.1)."""
    from amphion_tpu.models.tts.valle.valle import (
        VALLE, VALLEConfig, ar_generate,
    )

    model = VALLE(VALLEConfig(num_phones=256, audio_vocab=1024,
                              num_quantizers=8, hidden=1024, num_layers=12,
                              num_heads=16, max_position=4096))
    r = jax.random.key(0)
    lphone, lp, new = 64, 225, 750  # 3 s prompt + 10 s target @75 Hz
    phones = jnp.zeros((1, lphone), jnp.int32)
    prompt0 = jnp.zeros((1, lp), jnp.int32)
    params = model.init(
        r, phones, jnp.ones((1, lphone)),
        jnp.zeros((1, 8, lp + new), jnp.int32), jnp.ones((1, lp + new)),
        jax.random.key(1), method=VALLE.train_loss,
    )["params"]
    nar = jax.jit(lambda prm, t0_, tm: model.apply(
        {"params": prm}, phones, jnp.ones((1, lphone), jnp.float32), t0_, tm,
        method=VALLE.nar_generate))

    def run(rng):
        toks, _ = ar_generate(model, params, phones, prompt0, rng,
                              max_new=new, top_k=50,
                              compute_dtype=compute_dtype)
        return nar(params, toks, jnp.ones((1, new), jnp.float32))

    _fence(run(jax.random.key(2)))
    rtfs = []
    for i in range(_repeats()):
        t0 = time.perf_counter()
        _fence(run(jax.random.key(3 + i)))
        rtfs.append((time.perf_counter() - t0) / 10.0)
    rtf, spread = _median_spread(rtfs)
    dt = rtf * 10.0
    suffix = "" if compute_dtype == "bfloat16" else f"_{compute_dtype}"
    # AR decode re-reads only the AR subtree every token (750 steps, at the
    # decode dtype); the 7 NAR passes re-read only the NAR subtree (f32
    # apply). Counting the full tree for both would overstate HBM traffic.
    itemsize = {"float32": 4, "bfloat16": 2, "int8": 1, "int4": 0.5}.get(
        compute_dtype, 2)
    ar_b = _param_bytes({k: v for k, v in params.items()
                         if k in ("ar", "ar_head")})
    nar_b = _param_bytes({k: v for k, v in params.items()
                          if k in ("nar", "nar_head")})
    pb = ar_b / 4 * itemsize * new + nar_b * 7
    _emit(f"valle_zero_shot_rtf{suffix}", rtf, "RTF (median, lower better)",
          0.1 / max(rtf, 1e-9), extra={**_weight_stream(pb, 1, dt),
                                       **spread})


def bench_vevo_rtf(compute_dtype="bfloat16") -> None:
    """Vevo1.5-scale zero-shot VC RTF: AR 780M-class content-style decode
    + FM 350M-class 32-step ODE + Vocos 250M-class decode (ref model sizes
    `models/svc/vevosing/README.md:24-27`)."""
    from amphion_tpu.models.vc.ar_transformer import (
        ARTransformer, ARTransformerConfig, ar_transformer_generate,
    )
    from amphion_tpu.models.vc.flow_matching_transformer import (
        FlowMatchingTransformer, FMTConfig, fmt_inference,
    )
    from amphion_tpu.models.vocoders.vocos import VocosConfig, VocosGenerator

    r = jax.random.key(0)
    # AR: content (50 Hz) -> content-style tokens; 3 s prompt + 10 s target
    ar = ARTransformer(ARTransformerConfig(
        input_vocab=32, output_vocab=8192, hidden=1536, num_layers=20,
        num_heads=16, intermediate=6144, max_position=4096))
    content = jnp.zeros((1, 650), jnp.int32)
    cmask = jnp.ones((1, 650), jnp.float32)
    out0 = jnp.zeros((1, 500), jnp.int32)
    omask = jnp.ones((1, 500), jnp.float32)
    ar_params = ar.init(r, content, cmask, out0, omask,
                        method=ARTransformer.loss)["params"]
    # FM: tokens -> mel (hop-256 Vocos rate); Lp=281, Lt=938
    lp, lt = 281, 938
    fm = FlowMatchingTransformer(FMTConfig(hidden=1024, num_layers=16))
    tok0 = jnp.zeros((1, lp + lt), jnp.int32)
    mel_full = jnp.zeros((1, lp + lt, 80))
    pmask = jnp.concatenate([jnp.ones((1, lp)), jnp.zeros((1, lt))], axis=1)
    xmask = jnp.ones((1, lp + lt), jnp.float32)
    fm_params = fm.init(r, mel_full, tok0, pmask, xmask, jax.random.key(1),
                        method=FlowMatchingTransformer.loss)["params"]
    voc = VocosGenerator(VocosConfig(dim=1280, intermediate_dim=4096, num_layers=24))
    mel0 = jnp.zeros((1, lt, 80))
    voc_params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), voc.init(r, mel0)["params"])
    voc_fwd = jax.jit(
        lambda prm, m: voc.apply({"params": prm}, m.astype(jnp.bfloat16)))
    tokens_full = jnp.zeros((1, lp + lt), jnp.int32)
    prompt_mel = jnp.zeros((1, lp, 80))
    # FM dtype is independent of the AR dtype: the 32-step CFG ODE is
    # COMPUTE-bound at B=1 (~54 TFLOP over ~0.33 s ≈ 75%+ MFU), so
    # quantizing it buys ~nothing — bf16 stays the recommended FM config
    # while the weight-bound AR stage drops to int8/int4. Override with
    # AMPHION_FM_DTYPE=int8|int4 to A/B that claim.
    fm_dtype = os.environ.get("AMPHION_FM_DTYPE", "bfloat16")
    # FM step/solver knobs (fm_frontier bench measures the quality side;
    # the reference pins 32 Euler steps, vevo_utils.py:414)
    fm_steps = int(os.environ.get("AMPHION_FM_STEPS", "32"))
    fm_solver = os.environ.get("AMPHION_FM_SOLVER", "euler")

    def run(rng):
        toks, _ = ar_transformer_generate(ar, ar_params, content, rng,
                                          max_new=500, top_k=40,
                                          compute_dtype=compute_dtype)
        del toks  # frame-aligned tokens for FM are precomputed below
        mel = fmt_inference(fm, fm_params, tokens_full, prompt_mel, rng,
                            num_steps=fm_steps, cfg_scale=1.0,
                            compute_dtype=fm_dtype, solver=fm_solver)
        return voc_fwd(voc_params, mel)

    _fence(run(jax.random.key(2)))
    rtfs = []
    for i in range(_repeats()):
        t0 = time.perf_counter()
        _fence(run(jax.random.key(3 + i)))
        rtfs.append((time.perf_counter() - t0) / 10.0)
    rtf, spread = _median_spread(rtfs)
    dt = rtf * 10.0
    if os.environ.get("AMPHION_BENCH_STAGES"):
        def _stage(fn, *a):
            _fence(fn(*a))
            ts = time.perf_counter()
            for _ in range(3):
                _fence(fn(*a))
            return (time.perf_counter() - ts) / 3
        t_ar = _stage(lambda r: ar_transformer_generate(
            ar, ar_params, content, r, max_new=500, top_k=40,
            compute_dtype=compute_dtype)[0], jax.random.key(9))
        t_fm = _stage(lambda r: fmt_inference(
            fm, fm_params, tokens_full, prompt_mel, r, num_steps=fm_steps,
            cfg_scale=1.0, compute_dtype=fm_dtype, solver=fm_solver),
            jax.random.key(9))
        t_voc = _stage(voc_fwd, voc_params, mel0)
        print(json.dumps({"vevo_stages_s": {
            "ar_500tok": round(t_ar, 4),
            f"fm_{fm_solver}{fm_steps}_cfg": round(t_fm, 4),
            "vocos": round(t_voc, 4), "total_pipeline": round(dt, 4)}}),
            flush=True)
    suffix = "" if compute_dtype == "bfloat16" else f"_{compute_dtype}"
    itemsize = {"float32": 4, "bfloat16": 2, "int8": 1, "int4": 0.5}.get(
        compute_dtype, 2)
    # AR re-reads weights per token (500); FM 32 ODE steps; Vocos 1 pass
    pb = (_param_bytes(ar_params) / 4 * itemsize * 500
          + _param_bytes(fm_params) * fm_steps + _param_bytes(voc_params))
    _emit(f"vevo_zero_shot_rtf{suffix}", rtf, "RTF (median, lower better)",
          0.1 / max(rtf, 1e-9), extra={**_weight_stream(pb, 1, dt),
                                       **spread})


def bench_vevo_spec_cost(draft_layers=5, k=4) -> None:
    """Honest cost model for self-speculative Vevo AR decode (the r3
    lever (a)). The SPEEDUP depends on draft acceptance, which random
    bench weights cannot exhibit (~chance) — so this bench measures what
    it honestly can on hardware: worst-case (zero-acceptance)
    speculative RTF at full scale, plus the plain-decode baseline, and
    derives the breakeven/projected-speedup curve
    speedup(α) = (α·k+1) · t_step / t_iter from the measured per-
    iteration cost. Exactness (tokens == plain greedy) is CPU-property-
    tested in tests/test_speculative.py."""
    from amphion_tpu.models.vc.ar_transformer import (
        ARTransformer, ARTransformerConfig, ar_transformer_generate,
    )
    from amphion_tpu.models.vc.speculative import (
        ar_transformer_generate_speculative,
    )

    r = jax.random.key(0)
    ar = ARTransformer(ARTransformerConfig(
        input_vocab=32, output_vocab=8192, hidden=1536, num_layers=20,
        num_heads=16, intermediate=6144, max_position=4096))
    content = jnp.zeros((1, 650), jnp.int32)
    params = ar.init(r, content, jnp.ones((1, 650)),
                     jnp.zeros((1, 500), jnp.int32), jnp.ones((1, 500)),
                     method=ARTransformer.loss)["params"]
    n_new = 500

    def plain(rng):
        return ar_transformer_generate(ar, params, content, rng,
                                       max_new=n_new, top_k=1,
                                       compute_dtype="int4")[0]

    def spec():
        return ar_transformer_generate_speculative(
            ar, params, content, max_new=n_new,
            draft_layers=draft_layers, k=k, compute_dtype="int4",
            return_iters=True)

    _fence(plain(jax.random.key(2)))
    t0 = time.perf_counter(); _fence(plain(jax.random.key(3)))
    t_plain = time.perf_counter() - t0
    _fence(spec()[0])
    t0 = time.perf_counter(); out = spec(); _fence(out[0])
    t_spec_worst = time.perf_counter() - t0
    t_step = t_plain / n_new
    # random weights ≈ zero acceptance, but use the loop's OWN trip
    # count (while-loop early exit, round 5) rather than assuming n_new
    n_iters = int(out[2][0])
    t_iter = t_spec_worst / max(n_iters, 1)
    curve = {f"alpha_{a:.2f}": round((a * k + 1) * t_step / t_iter, 3)
             for a in (0.0, 0.25, 0.5, 0.75, 1.0)}
    breakeven = max(0.0, (t_iter / t_step - 1.0) / k)
    _emit("vevo_spec_decode_worst_case_s", t_spec_worst,
          f"s/500 tok at ZERO acceptance (draft {draft_layers}L, k={k}; "
          "plain {:.3f} s)".format(t_plain), t_plain / t_spec_worst,
          extra={"t_step_ms": round(t_step * 1e3, 3),
                 "t_iter_ms": round(t_iter * 1e3, 3),
                 "projected_speedup_vs_acceptance": curve,
                 "breakeven_acceptance": round(breakeven, 3)})


def bench_vevo_spec_accept() -> None:
    """MEASURED speculative acceptance + end-to-end speedup (VERDICT r4
    missing #2 / task #3): overfit a small-but-real AR model on a
    deterministic continuation task (output = content cycled) until the
    early-exit draft has real signal, then sweep (draft_layers, k) on
    hardware. α is computed from the decode loop's OWN iteration count
    (`return_iters`; α = (gen/iters − 1)/k), and end-to-end tokens/s is
    compared against plain greedy decode of the same model — the
    while-loop early exit (round 5) is what converts acceptance into
    wall-clock. Also validates the r4 cost model speedup(α) =
    (αk+1)·t_step/t_iter against the measured point."""
    import optax

    from amphion_tpu.models.vc.ar_transformer import (
        ARTransformer, ARTransformerConfig, ar_transformer_generate,
    )
    from amphion_tpu.models.vc.speculative import (
        ar_transformer_generate_speculative,
    )

    cfg = ARTransformerConfig(
        input_vocab=64, output_vocab=256, hidden=1024, num_layers=12,
        num_heads=16, intermediate=4096, max_position=2048)
    ar = ARTransformer(cfg)
    rng = np.random.default_rng(0)
    lc, new = 32, 256
    content1 = rng.integers(0, cfg.input_vocab, (1, lc))
    target1 = (content1[:, np.arange(new) % lc] % cfg.output_vocab)
    b = 8
    content = jnp.asarray(np.repeat(content1, b, 0))
    target = jnp.asarray(np.repeat(target1, b, 0))
    cm = jnp.ones((b, lc), jnp.float32)
    om = jnp.ones((b, new), jnp.float32)
    params = ar.init(jax.random.key(0), content[:1], cm[:1], target[:1],
                     om[:1], method=ARTransformer.loss)["params"]
    tx = optax.adam(3e-4)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt):
        def loss_fn(p):
            l, aux = ar.apply({"params": p}, content, cm, target, om,
                              method=ARTransformer.loss)
            return l, aux

        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, l, aux["ar_acc"]

    acc = 0.0
    for i in range(600):
        params, opt, l, acc = train_step(params, opt)
        if i % 100 == 0:
            print(f"# overfit step {i}: loss {float(l):.4f} "
                  f"acc {float(acc):.3f}", file=sys.stderr)
        if float(acc) > 0.999 and float(l) < 0.02:
            break
    print(f"# overfit done: teacher-forced acc {float(acc):.4f}",
          file=sys.stderr)

    c1 = jnp.asarray(content1)

    def plain():
        return ar_transformer_generate(
            ar, params, c1, jax.random.key(1), max_new=new, top_k=1,
            compute_dtype="bfloat16")[0]

    _fence(plain())
    reps = 5
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fence(plain())
        ts.append(time.perf_counter() - t0)
    t_plain = float(np.median(ts))
    t_step = t_plain / new

    rows = {}
    best = None
    for d in (3, 5, 8):
        for k in (2, 4, 8):
            def spec():
                return ar_transformer_generate_speculative(
                    ar, params, c1, max_new=new, draft_layers=d, k=k,
                    compute_dtype="bfloat16", return_iters=True)

            toks, gen, iters = spec()
            _fence(toks)
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = spec()
                _fence(out[0])
                ts.append(time.perf_counter() - t0)
            t_spec = float(np.median(ts))
            g, it = int(gen[0]), int(iters[0])
            alpha = max(0.0, (g / max(it, 1) - 1.0)) / k
            t_iter = t_spec / max(it, 1)
            speedup = t_plain / t_spec
            pred = (alpha * k + 1) * t_step / t_iter
            rows[f"d{d}_k{k}"] = {
                "alpha": round(alpha, 3), "iters": it, "gen": g,
                "speedup": round(speedup, 3),
                "cost_model_speedup": round(pred, 3),
                "t_spec_s": round(t_spec, 4),
            }
            print(f"# spec d={d} k={k}: α={alpha:.3f} iters={it} "
                  f"speedup {speedup:.3f} (model {pred:.3f})",
                  file=sys.stderr)
            if best is None or speedup > rows[best]["speedup"]:
                best = f"d{d}_k{k}"

    _emit("vevo_spec_accept_speedup", rows[best]["speedup"],
          f"measured speculative speedup vs plain greedy at α="
          f"{rows[best]['alpha']} ({best}, overfit 12L model, 256 tok)",
          rows[best]["speedup"],
          extra={"rows": rows, "best": best,
                 "t_plain_s": round(t_plain, 4),
                 "teacher_forced_acc": round(float(acc), 4)})


def bench_maskgct_frontier() -> None:
    """MaskGCT T2S latency-quality frontier (VERDICT r4 #8): the
    round-4 plateau analysis showed batching cannot help T2S (MXU
    already fed at B=1), so the remaining lever is the STEP SCHEDULE.
    Sweep n_steps × unmasking schedule on a partially-trained
    production-scale T2S (a from-scratch model on a synthetic
    phone→token task — enough structure that iterative refinement
    matters, which random weights cannot provide), reporting per-config
    RTF and a quality proxy: token agreement with the 50-step sin
    sampler on the same per-seed rng (the reference's own step count is
    config, `maskgct_t2s.py:226`). Serving configs can then pick a
    point deliberately."""
    import optax

    from amphion_tpu.models.tts.maskgct.maskgct import (
        MaskGCTT2S, T2SConfig, t2s_sample,
    )

    cfg = T2SConfig(hidden=1024, num_layers=16, num_heads=16,
                    codebook_size=8192, phone_vocab=256, max_position=1024)
    model = MaskGCTT2S(cfg)
    rng = np.random.default_rng(0)
    b, t_len, lph = 8, 200, 50
    phones_b = rng.integers(0, cfg.phone_vocab, (b, lph))
    # deterministic position-dependent mapping — learnable but not
    # trivially; limited training leaves calibrated uncertainty
    pos = np.arange(t_len)
    x0_b = ((phones_b[:, pos % lph] * 31 + pos[None] * 7) %
            cfg.codebook_size)
    x0 = jnp.asarray(x0_b)
    xm = jnp.ones((b, t_len), jnp.float32)
    ph = jnp.asarray(phones_b)
    pm = jnp.ones((b, lph), jnp.float32)
    params = model.init(jax.random.key(0), x0, xm, ph, pm,
                        jax.random.key(1),
                        method=MaskGCTT2S.compute_loss)["params"]
    tx = optax.adam(2e-4)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, r):
        def loss_fn(p):
            l, aux = model.apply({"params": p}, x0, xm, ph, pm, r,
                                 method=MaskGCTT2S.compute_loss)
            return l, aux

        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, l, aux["t2s_acc"]

    steps_train = int(os.environ.get("AMPHION_BENCH_FTRAIN", "400"))
    for i in range(steps_train):
        params, opt, l, acc = train_step(params, opt, jax.random.key(10 + i))
        if i % 100 == 0:
            print(f"# t2s partial-train {i}: loss {float(l):.3f} "
                  f"acc {float(acc):.3f}", file=sys.stderr)
    print(f"# t2s trained: masked acc {float(acc):.3f}", file=sys.stderr)

    lp, tgt = 25, 200
    prompt = jnp.asarray(x0_b[:1, :lp])
    phone1 = jnp.asarray(phones_b[:1])
    seeds = [jax.random.key(900 + s) for s in range(4)]

    def run(n_steps, schedule, key):
        return t2s_sample(model, params, prompt, phone1, tgt, key,
                          n_steps=n_steps, schedule=schedule,
                          compute_dtype="bfloat16")

    # 50-step sin reference outputs per seed
    refs = [np.asarray(run(50, "sin", s)) for s in seeds]
    _fence(refs[0][0, 0])
    t0 = time.perf_counter()
    _fence(run(50, "sin", seeds[0]))
    t_ref = time.perf_counter() - t0
    audio_s = tgt / 50.0  # semantic tokens at 50 Hz
    rows = {"s50_sin": {"rtf": round(t_ref / audio_s, 4),
                        "agreement": 1.0}}
    truth = np.asarray(x0_b[:1, :tgt])
    rows["s50_sin"]["task_acc"] = round(
        float(np.mean(refs[0] == truth)), 3)

    for schedule in ("sin", "linear", "pow2"):
        for n in (25, 16, 12, 8):
            outs = [np.asarray(run(n, schedule, s)) for s in seeds]
            _fence(outs[0][0, 0])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _fence(run(n, schedule, seeds[0]))
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            agree = float(np.mean([np.mean(o == r)
                                   for o, r in zip(outs, refs)]))
            rows[f"s{n}_{schedule}"] = {
                "rtf": round(dt / audio_s, 4),
                "agreement": round(agree, 3),
                "task_acc": round(float(np.mean(outs[0] == truth)), 3),
            }
            print(f"# frontier {n} steps/{schedule}: RTF "
                  f"{dt / audio_s:.4f} agree {agree:.3f}",
                  file=sys.stderr)

    best16 = rows["s16_sin"]
    _emit("maskgct_t2s_frontier_rtf_s16", best16["rtf"],
          "T2S RTF at 16 steps (sin), agreement %.3f vs 50-step"
          % best16["agreement"],
          rows["s50_sin"]["rtf"] / max(best16["rtf"], 1e-9),
          extra={"rows": rows, "target_len": tgt,
                 "train_masked_acc": round(float(acc), 3)})


def bench_fm_frontier() -> None:
    """Vevo FM latency-quality frontier (the MaskGCT-frontier analog for
    the OTHER flagship sampler): the 32-step CFG ODE is ~1/3 of the Vevo
    int4 budget and compute-bound (quantization can't help), so the
    remaining levers are the STEP COUNT and the INTEGRATOR. Train a
    production-scale FMT (1024h/16L — the bench_vevo_rtf FM config) on a
    synthetic deterministic token→mel task until the vector field has real
    structure, then sweep ODE steps × solver:

      - euler    = the reference's midpoint-sampled Euler
                   (fmt_model.py:260), 1 estimator eval per step
      - midpoint = explicit RK2, 2 evals per step (same cost unit: EVALS)

    Quality proxy (per config, fixed x_0): mel RMSE vs the 256-step fine
    solution, normalized by the fine solution's std — the FM equivalent of
    the T2S token-agreement proxy — plus task RMSE vs the ground-truth
    mel. RTF is measured separately at the production serving shape
    (B=1, Lp=281, Lt=938, CFG two-pass, bf16)."""
    import optax

    from amphion_tpu.models.vc.flow_matching_transformer import (
        FlowMatchingTransformer, FMTConfig, fmt_inference,
    )

    cfg = FMTConfig(token_vocab=512, hidden=1024, num_layers=16)
    model = FlowMatchingTransformer(cfg)
    rng = np.random.default_rng(0)
    b, t_len, lp = 8, 240, 40
    # deterministic token→mel mapping with context: learnable structure,
    # so the learned field's ODE solution depends on integration accuracy
    table = rng.standard_normal((cfg.token_vocab, cfg.n_mel)).astype(
        np.float32)
    tok_b = rng.integers(0, cfg.token_vocab, (b, t_len))
    mel_b = table[tok_b] * 0.7 + 0.3 * table[np.roll(tok_b, 1, axis=1)]
    mel = jnp.asarray(mel_b)
    tokens = jnp.asarray(tok_b)
    # prompt prefix on most rows; zero-prompt rows are the reference's
    # uncond/CFG training case (loss drops the condition there)
    pmask_np = np.zeros((b, t_len), np.float32)
    pmask_np[:6, :lp] = 1.0
    pmask = jnp.asarray(pmask_np)
    xmask = jnp.ones((b, t_len), jnp.float32)
    params = model.init(jax.random.key(0), mel, tokens, pmask, xmask,
                        jax.random.key(1),
                        method=FlowMatchingTransformer.loss)["params"]
    tx = optax.adam(2e-4)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, r):
        def loss_fn(p):
            l, _ = model.apply({"params": p}, mel, tokens, pmask, xmask, r,
                               method=FlowMatchingTransformer.loss)
            return l

        l, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, l

    steps_train = int(os.environ.get("AMPHION_BENCH_FTRAIN", "400"))
    for i in range(steps_train):
        params, opt, l = train_step(params, opt, jax.random.key(10 + i))
        if i % 100 == 0:
            print(f"# fm partial-train {i}: loss {float(l):.4f}",
                  file=sys.stderr)
    print(f"# fm trained: loss {float(l):.4f}", file=sys.stderr)

    # --- quality at the trained shape (fixed x_0, first row, CFG on) ---
    lt_q = t_len - lp
    tok_q = tokens[:1]
    pm_q = mel[:1, :lp]
    noise = jnp.asarray(
        rng.standard_normal((1, lt_q, cfg.n_mel)).astype(np.float32))

    def run_q(n, solver):
        return np.asarray(fmt_inference(
            model, params, tok_q, pm_q, jax.random.key(9), num_steps=n,
            cfg_scale=1.0, compute_dtype="bfloat16", noise=noise,
            solver=solver))

    fine = run_q(256, "euler")
    _fence(fine[0, 0])
    fine_std = float(np.std(fine))
    truth = mel_b[:1, lp:]

    grid = [("euler", n) for n in (32, 16, 12, 8, 4)] + \
           [("midpoint", n) for n in (16, 8, 6, 4, 2)]
    rows = {}
    for solver, n in grid:
        out = run_q(n, solver)
        rows[f"{solver[0]}{n}"] = {
            "evals": n * (2 if solver == "midpoint" else 1),
            "rmse_vs_fine": round(
                float(np.sqrt(np.mean((out - fine) ** 2))) / fine_std, 4),
            "rmse_vs_task": round(
                float(np.sqrt(np.mean((out - truth) ** 2))), 4),
        }
        print(f"# fm quality {solver}@{n}: {rows[f'{solver[0]}{n}']}",
              file=sys.stderr)

    # --- RTF at the production serving shape (bench_vevo_rtf FM stage) ---
    lp_p, lt_p = 281, 938
    tok_p = jnp.zeros((1, lp_p + lt_p), jnp.int32)
    pm_p = jnp.zeros((1, lp_p, cfg.n_mel))
    audio_s = 10.0

    def run_p(n, solver, key):
        return fmt_inference(model, params, tok_p, pm_p, key, num_steps=n,
                             cfg_scale=1.0, compute_dtype="bfloat16",
                             solver=solver)

    for solver, n in grid:
        _fence(run_p(n, solver, jax.random.key(5)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _fence(run_p(n, solver, jax.random.key(6 + i)))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        rows[f"{solver[0]}{n}"].update(
            fm_s=round(dt, 4), fm_rtf=round(dt / audio_s, 4))
        print(f"# fm rtf {solver}@{n}: {dt:.3f} s", file=sys.stderr)

    e32, e16 = rows["e32"], rows["e16"]
    _emit("fm_frontier_s_e16", e16["fm_s"],
          "FM ODE s/10s-utt at 16 Euler steps (rmse-vs-fine %.3f; "
          "32-step ref %.3f s @ %.3f)" % (
              e16["rmse_vs_fine"], e32["fm_s"], e32["rmse_vs_fine"]),
          e32["fm_s"] / max(e16["fm_s"], 1e-9),
          extra={"rows": rows, "fine_std": round(fine_std, 4),
                 "train_loss": round(float(l), 4)})


def bench_flash_attention() -> None:
    """Fused flash attention vs the dense einsum path at training shape
    (B=8, L=2048, H=16, D=64, causal+padding mask, forward).

    The op is looped N times INSIDE one jitted program (`lax.scan` with a
    data dependency) — per-dispatch timing through the axon tunnel bottoms
    out at its ~35 ms round-trip floor and makes every sub-35 ms op look
    identical."""
    from amphion_tpu.ops.pallas_kernels import flash_attention_pallas

    b, l, h, d = 8, 2048, 16, 64
    r = jax.random.key(0)
    q = jax.random.normal(r, (b, l, h, d), jnp.bfloat16)
    k = jax.random.normal(r, (b, l, h, d), jnp.bfloat16)
    v = jax.random.normal(r, (b, l, h, d), jnp.bfloat16)
    mask = jnp.ones((b, l), jnp.float32)
    n_inner = 50

    def dense(q, k, v, m):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
        neg = jnp.finfo(jnp.float32).min
        s = jnp.where(jnp.tril(jnp.ones((l, l), bool))[None, None],
                      s.astype(jnp.float32), neg)
        s = jnp.where(m[:, None, None, :] > 0, s, neg)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    def flash(q, k, v, m):
        return flash_attention_pallas(q, k, v, kv_mask=m, causal=True,
                                      interpret=False)

    def looped(fn):
        @jax.jit
        def run(q, k, v, m):
            def body(c, _):
                o = fn(q + c, k, v, m)
                return (jnp.mean(o.astype(jnp.float32)) * 0).astype(q.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype), None,
                                length=n_inner)
            return c
        return run

    def time_fn(fn):
        run = looped(fn)
        _fence(run(q, k, v, mask))
        t0 = time.perf_counter()
        _fence(run(q, k, v, mask))
        return (time.perf_counter() - t0) / n_inner

    t_dense, t_flash = time_fn(dense), time_fn(flash)
    # analytic attention flops: 2·(QK^T + PV) = 4·B·H·L²·D (×0.5 causal)
    fl = 4.0 * b * h * l * l * d * 0.5
    _emit("flash_attention_speedup_vs_dense", t_dense / t_flash,
          f"x (dense {t_dense * 1e3:.2f} ms -> flash {t_flash * 1e3:.2f} ms)",
          t_dense / t_flash, extra=_roofline(fl, 0, t_flash))


def bench_ssl_extract() -> None:
    """w2v-bert-2.0-class (1024/24 conformer) fused front-end + encoder
    extraction throughput (x realtime, 16 kHz input)."""
    from amphion_tpu.models.ssl_encoders import (
        W2VBertConfig, W2VBertEncoder, w2vbert_apply_scanned,
    )
    from amphion_tpu.ops.ssl_frontend import num_fbank_frames, seamless_fbank

    cfg = W2VBertConfig()
    model = W2VBertEncoder(cfg)
    b, secs = 8, 10
    wav = jnp.zeros((b, secs * 16000))
    nv = jnp.full((b,), secs * 16000)
    feats0 = seamless_fbank(wav[:1], num_valid_samples=nv[:1])
    params = model.init(jax.random.key(0), feats0)["params"]

    # params MUST be an argument, not a closure: closed-over params bake
    # 2.3 GB of constants into the HLO, and uploading that through the
    # tunnel's remote compile broke the transport after ~30 min — the
    # real reason this bench failed 4 times across rounds.
    @jax.jit
    def fwd(p, w, n):
        with jax.default_matmul_precision("float32"):
            feats = seamless_fbank(w, num_valid_samples=n)
            nf = (num_fbank_frames(n) + 1) // 2
            mask = (jnp.arange(feats.shape[1])[None, :]
                    < nf[:, None]).astype(feats.dtype)
            # scan-over-layers: ONE compiled layer body (~24x smaller HLO)
            return w2vbert_apply_scanned(model, p, feats, mask, tap=17)

    _fence(fwd(params, wav, nv))
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        _fence(fwd(params, wav, nv))
    dt = (time.perf_counter() - t0) / n_iters
    xrt = b * secs / dt
    # roofline: cost_analysis counts the 17-trip layer scan body ONCE —
    # cost one layer separately and add (trips-1)× (round-3 fix; the
    # old rows published 0.54% MFU for a ~13%-MFU program)
    whole = _cost_analysis(fwd, params, wav, nv)
    from amphion_tpu.models.ssl_encoders import _W2VBertLayer

    layer = _W2VBertLayer(cfg)
    feats_b = seamless_fbank(wav, num_valid_samples=nv)
    h0 = jnp.zeros((b, feats_b.shape[1], cfg.hidden))
    m0 = jnp.ones((b, feats_b.shape[1]))

    @jax.jit
    def one_layer(lp, h, m):
        with jax.default_matmul_precision("float32"):
            return layer.apply({"params": lp}, h, m)

    body = _cost_analysis(one_layer, params["layers_0"], h0, m0)
    fl, by = _cost_analysis_scanned(whole, body, trips=17)
    _emit("ssl_extract_xrt", xrt, "x realtime (w2v-bert-2.0-class)",
          xrt / 1.0, extra=_roofline(fl, by, dt))


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
    fl, by = _cost_analysis(synthesize, params_bf16, mel)
    _emit("hifigan_vocoder_khz_audio_per_sec_per_chip", khz_audio_per_sec,
          "kHz-audio/sec/chip", khz_audio_per_sec / target,
          extra=_roofline(fl, by, dt / n_iters))


def bench_train_hifigan(compute_dtype="float32", batch=16,
                        frames=64) -> None:
    """Full-size HiFiGAN V1 GAN training step (G+MPD/MSD, both optimizers).

    Reports training throughput as x-realtime audio consumed — the TPU
    answer to the reference's `gan_vocoder_trainer.py` hot loop. Variants:
    bf16 mixed precision and larger batch (`train_hifigan_bf16`,
    `train_hifigan_bf16_b64`)."""
    from amphion_tpu.models.vocoders.gan_trainer import (
        CombinedDiscriminator,
        GANTrainConfig,
        create_gan_states,
        make_gan_train_step,
    )
    from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig, HiFiGANGenerator
    from amphion_tpu.ops.mel import MelConfig, mel_spectrogram

    cfg = HiFiGANConfig()
    mel_cfg = MelConfig()
    hop = int(np.prod(cfg.upsample_rates))
    gen = HiFiGANGenerator(cfg)
    disc = CombinedDiscriminator(use=("mpd", "msd"))
    rng = jax.random.key(0)
    audio = jax.random.normal(rng, (batch, frames * hop), jnp.float32) * 0.2
    mel = jnp.transpose(mel_spectrogram(audio, mel_cfg), (0, 2, 1))
    tc = GANTrainConfig(compute_dtype=compute_dtype)
    gstate, dstate = create_gan_states(gen, disc, rng, mel[:1], audio[:1], tc)
    step = make_gan_train_step(mel_cfg, tc)
    gstate, dstate, m = step(gstate, dstate, {"mel": mel, "audio": audio})
    _fence(m["g_loss"])
    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        gstate, dstate, m = step(gstate, dstate, {"mel": mel, "audio": audio})
    _fence(m["g_loss"])
    dt = time.perf_counter() - t0
    xrt = (batch * frames * hop / mel_cfg.sample_rate) * n_iters / dt
    fl, by = _cost_analysis(step, gstate, dstate, {"mel": mel, "audio": audio})
    suffix = "" if compute_dtype == "float32" else "_bf16"
    if batch != 16:
        suffix += f"_b{batch}"
    _emit(f"hifigan_train_xrt{suffix}", xrt, "x realtime audio/sec trained",
          xrt / 1.0, extra=_roofline(fl, by, dt / n_iters))


def bench_bf16_gan_bandwidth() -> None:
    """Close-or-explain the bf16 GAN-training bandwidth gap (VERDICT r4
    #7: `train_hifigan_bf16` attains 481 GB/s where f32 attains
    615 GB/s, so bf16 buys 1.13× of a 1.45× byte-bound ceiling). The
    experiment isolates WHERE attained bandwidth drops: (a) the
    generator FORWARD alone f32 vs bf16 at training shapes, and (b)
    single conv stacks at wide (512) vs narrow (32) channel counts —
    HiFiGAN's upsampling ladder halves channels per stage, and the TPU's
    native bf16 tile is (16, 128) vs f32's (8, 128): narrow-channel
    convs leave more of every bf16 tile as padding, so the USEFUL-byte
    bandwidth (what cost analysis counts) falls even when the raw HBM
    streams are saturated. Emits per-case attained GB/s so BENCHMARKS.md
    can state the cause with numbers."""
    from amphion_tpu.models.vocoders.hifigan import (
        HiFiGANConfig, HiFiGANGenerator,
    )

    cfg = HiFiGANConfig()
    gen = HiFiGANGenerator(cfg)
    rng = jax.random.key(0)
    b, frames = 16, 64
    mel = jax.random.normal(rng, (b, frames, cfg.n_mel), jnp.float32)
    params32 = gen.init(rng, mel[:1, :8])["params"]
    rows = {}

    for dt_s in ("float32", "bfloat16"):
        dt = jnp.dtype(dt_s)
        params = jax.tree_util.tree_map(lambda p: p.astype(dt), params32)
        x = mel.astype(dt)
        fwd = jax.jit(lambda p, m: gen.apply({"params": p}, m))
        _fence(fwd(params, x))
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(params, x)
        _fence(out)
        dtt = (time.perf_counter() - t0) / n
        fl, by = _cost_analysis(fwd, params, x)
        rows[f"gen_fwd_{dt_s}"] = {
            "ms": round(dtt * 1e3, 2),
            "gbps": round(by / dtt / 1e9, 1),
            "tflops": round(fl / dtt / 1e12, 2),
            "gbytes": round(by / 1e9, 3),
        }
        print(f"# gen fwd {dt_s}: {rows[f'gen_fwd_{dt_s}']}",
              file=sys.stderr)

    # isolated conv stacks: wide vs narrow channels, both dtypes
    import flax.linen as nn

    for ch, t_len in ((512, 2048), (32, 32768)):
        class _Stack(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i in range(8):
                    x = nn.Conv(ch, (7,), padding="SAME")(x)
                    x = nn.leaky_relu(x, 0.1)
                return x

        stack = _Stack()
        xs32 = jax.random.normal(rng, (4, t_len, ch), jnp.float32)
        ps32 = stack.init(rng, xs32[:1, :64])["params"]
        for dt_s in ("float32", "bfloat16"):
            dt = jnp.dtype(dt_s)
            ps = jax.tree_util.tree_map(lambda p: p.astype(dt), ps32)
            xin = xs32.astype(dt)
            f = jax.jit(lambda p, a: stack.apply({"params": p}, a))
            _fence(f(ps, xin))
            n = 20
            t0 = time.perf_counter()
            for _ in range(n):
                out = f(ps, xin)
            _fence(out)
            dtt = (time.perf_counter() - t0) / n
            fl, by = _cost_analysis(f, ps, xin)
            rows[f"conv{ch}_{dt_s}"] = {
                "ms": round(dtt * 1e3, 2),
                "gbps": round(by / dtt / 1e9, 1),
                "tflops": round(fl / dtt / 1e12, 2),
            }
            print(f"# conv ch={ch} {dt_s}: {rows[f'conv{ch}_{dt_s}']}",
                  file=sys.stderr)

    # round-5 follow-up: is the wide-conv ~106 TF/s recoverable by
    # re-expressing the k=7 conv as matmuls (im2col/tap-sum)? Measure
    # (a) the tap-sum formulation y = Σ_j shift(x, j) @ W[j] at the same
    # stack shape and (b) the PURE-matmul rate of the conv's own GEMM
    # shape (M=B·T, K=C, N=C) — if the pure matmul is no faster, the
    # conv kernel already sits at its shape's ceiling and retiling is moot.
    ch, t_len, k_sz, n_lay = 512, 2048, 7, 8

    class _TapSum(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(n_lay):
                w = self.param(f"w{i}", nn.initializers.normal(0.02),
                               (k_sz, ch, ch), jnp.float32).astype(x.dtype)
                bb = self.param(f"b{i}", nn.initializers.zeros, (ch,),
                                jnp.float32).astype(x.dtype)
                t = x.shape[1]
                xp = jnp.pad(x, ((0, 0), (k_sz // 2, k_sz // 2), (0, 0)))
                y = bb
                for j in range(k_sz):
                    y = y + xp[:, j:j + t] @ w[j]
                x = nn.leaky_relu(y, 0.1)
            return x

    ts = _TapSum()
    xw32 = jax.random.normal(rng, (4, t_len, ch), jnp.float32)
    tsp = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16),
        ts.init(rng, xw32[:1, :64])["params"])
    fts = jax.jit(lambda p, a: ts.apply({"params": p}, a))
    xin = xw32.astype(jnp.bfloat16)
    _fence(fts(tsp, xin))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = fts(tsp, xin)
    _fence(out)
    dtt = (time.perf_counter() - t0) / n
    fl_conv = 2 * 4 * t_len * k_sz * ch * ch * n_lay
    rows["conv512_tapsum_bfloat16"] = {
        "ms": round(dtt * 1e3, 2), "tflops": round(fl_conv / dtt / 1e12, 1)}
    print(f"# tapsum ch=512 bf16: {rows['conv512_tapsum_bfloat16']}",
          file=sys.stderr)

    m_eq = 4 * t_len
    a_mm = jax.random.normal(rng, (m_eq, ch), jnp.float32).astype(jnp.bfloat16)
    wms = [jax.random.normal(jax.random.key(7 + i), (ch, ch),
                             jnp.float32).astype(jnp.bfloat16)
           for i in range(k_sz * n_lay)]

    @jax.jit
    def fmm(a, ws):
        return sum((a @ w).sum() for w in ws)

    _fence(fmm(a_mm, wms))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fmm(a_mm, wms)
    _fence(out)
    dtt = (time.perf_counter() - t0) / n
    rows["mm_equiv_bfloat16"] = {
        "ms": round(dtt * 1e3, 2), "tflops": round(fl_conv / dtt / 1e12, 1)}
    print(f"# pure-matmul equiv bf16: {rows['mm_equiv_bfloat16']}",
          file=sys.stderr)

    spd = (rows["gen_fwd_float32"]["ms"]
           / max(rows["gen_fwd_bfloat16"]["ms"], 1e-9))
    _emit("bf16_gan_fwd_speedup", spd,
          "HiFiGAN generator forward bf16 speedup over f32 (train shapes)",
          spd, extra={"rows": rows})


def bench_train_maskgct() -> None:
    """MaskGCT joint T2S+S2A masked-generative training step (the flagship
    trainer's jitted step at the 830M-class config), f32 params + Adam."""
    from amphion_tpu.models.tts.maskgct.maskgct import (
        MaskGCTS2A,
        MaskGCTT2S,
        S2AConfig,
        T2SConfig,
    )
    import optax
    from amphion_tpu.runtime.train_state import TrainState

    b, t_sem, t_ph = 8, 500, 128  # 8 x 10 s at 50 Hz semantic
    t2s = MaskGCTT2S(T2SConfig(remat=True))
    s2a = MaskGCTS2A(S2AConfig(semantic_dim=1024, remat=True))
    rng = jax.random.key(0)
    batch = {
        "semantic": jnp.zeros((b, t_sem), jnp.int32),
        "x_mask": jnp.ones((b, t_sem), jnp.float32),
        "phones": jnp.zeros((b, t_ph), jnp.int32),
        "phone_mask": jnp.ones((b, t_ph), jnp.float32),
        "codes": jnp.zeros((b, 12, t_sem), jnp.int32),
        "semantic_feats": jnp.zeros((b, t_sem, 1024), jnp.float32),
    }
    params = {
        "t2s": t2s.init(rng, batch["semantic"], batch["x_mask"],
                        batch["phones"], batch["phone_mask"], rng,
                        method=MaskGCTT2S.compute_loss)["params"],
        "s2a": s2a.init(rng, batch["codes"], batch["x_mask"],
                        batch["semantic_feats"], rng,
                        method=MaskGCTS2A.compute_loss)["params"],
    }
    tx = optax.adamw(1e-4)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), rng=rng, apply_fn=None, tx=tx)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, batch):
        rng, r1, r2 = jax.random.split(state.rng, 3)

        def loss_fn(prm):
            l1, _ = t2s.apply({"params": prm["t2s"]}, batch["semantic"],
                              batch["x_mask"], batch["phones"],
                              batch["phone_mask"], r1,
                              method=MaskGCTT2S.compute_loss)
            l2, _ = s2a.apply({"params": prm["s2a"]}, batch["codes"],
                              batch["x_mask"], batch["semantic_feats"], r2,
                              method=MaskGCTS2A.compute_loss)
            return l1 + l2, ()

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads).replace(rng=rng), loss

    state, loss = step_fn(state, batch)
    _fence(loss)
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, loss = step_fn(state, batch)
    _fence(loss)
    dt = time.perf_counter() - t0
    xrt = (b * t_sem / 50.0) * n_iters / dt  # audio-seconds trained per sec
    fl, by = _cost_analysis(step_fn, state, batch)
    _emit("maskgct_train_xrt", xrt, "x realtime audio/sec trained (T2S+S2A)",
          xrt / 1.0, extra=_roofline(fl, by, dt / n_iters))


def _build_bench_ar_family(family):
    """(model, params, submit_args_fn, static_run_fn_factory, meta) for
    the continuous-vs-static harness. `family` is "vevo" (780M-class
    `ARTransformer`, the Vevo AR stage) or "valle" (the 12-layer VALL-E
    AR stage). Both comparisons are AR-stage-only on BOTH sides — the
    non-AR tails (FM, NAR) are identical whichever dispatcher ran."""
    r = jax.random.key(0)
    if family == "vevo":
        from amphion_tpu.models.vc.ar_transformer import (
            ARTransformer, ARTransformerConfig,
            ar_transformer_generate_ragged,
        )
        from amphion_tpu.serving.continuous import ContinuousARBatcher

        ar = ARTransformer(ARTransformerConfig(
            input_vocab=32, output_vocab=8192, hidden=1536, num_layers=20,
            num_heads=16, intermediate=6144, max_position=4096))
        toks0 = jnp.zeros((1, 8), jnp.int32)
        m0 = jnp.ones((1, 8), jnp.float32)
        params = ar.init(r, toks0, m0, toks0, m0,
                         method=ARTransformer.loss)["params"]
        lc, new = 650, 500
        content = np.zeros((lc,), np.int32)

        def make_engine(slots, chunk, dtype):
            return ContinuousARBatcher(
                ar, params, slots=slots, chunk=chunk, buckets=(lc,),
                max_new=new, top_k=40, compute_dtype=dtype)

        def submit(eng, i, cap):
            return eng.submit(content, jax.random.key(100 + i),
                              max_new=cap)

        c4 = jnp.zeros((4, lc), jnp.int32)
        l4 = jnp.full((4,), lc, jnp.int32)

        def static_run(keys, dtype):
            _fence(ar_transformer_generate_ragged(
                ar, params, c4, l4, keys, max_new=new, top_k=40,
                compute_dtype=dtype)[0])

        return make_engine, submit, static_run, {"family": "vevo",
                                                 "max_new": new}

    from amphion_tpu.models.tts.valle.valle import (
        VALLE, VALLEConfig, ar_generate_ragged,
    )
    from amphion_tpu.serving.continuous import ContinuousValleBatcher

    model = VALLE(VALLEConfig(
        num_phones=256, audio_vocab=1024, num_quantizers=8, hidden=1024,
        num_layers=12, num_heads=16, max_position=4096))
    lph, lp, new = 64, 225, 750  # 3 s prompt + 10 s target @ 75 Hz
    params = model.init(
        r, jnp.zeros((1, lph), jnp.int32), jnp.ones((1, lph)),
        jnp.zeros((1, 8, lp), jnp.int32), jnp.ones((1, lp)),
        jax.random.key(1), method=VALLE.train_loss)["params"]
    phones = np.zeros((lph,), np.int32)
    prompt = np.zeros((lp,), np.int32)

    def make_engine(slots, chunk, dtype):
        return ContinuousValleBatcher(
            model, params, slots=slots, chunk=chunk, phone_buckets=(lph,),
            prompt_buckets=(lp,), max_new=new, top_k=50,
            compute_dtype=dtype)

    def submit(eng, i, cap):
        return eng.submit(phones, prompt, jax.random.key(100 + i),
                          max_new=cap)

    ph4 = jnp.zeros((4, lph), jnp.int32)
    phl4 = jnp.full((4,), lph, jnp.int32)
    pr4 = jnp.zeros((4, lp), jnp.int32)
    prl4 = jnp.full((4,), lp, jnp.int32)

    def static_run(keys, dtype):
        _fence(ar_generate_ragged(
            model, params, ph4, phl4, pr4, prl4, keys, max_new=new,
            top_k=50, compute_dtype=dtype)[0])

    return make_engine, submit, static_run, {"family": "valle",
                                             "max_new": new}


def _pctl(v, p):
    return v[min(len(v) - 1, int(p / 100 * len(v)))]


def _drive_continuous(make_engine, submit, trace, lens, slots, chunk,
                      dtype):
    """Cooperative open-loop drive of the continuous engine over a fixed
    arrival trace; returns sorted end-to-end latencies + makespan."""
    n_req = len(trace)
    eng = make_engine(slots, chunk, dtype)
    rid_arr, fin, nxt = {}, {}, 0
    t0 = time.perf_counter()
    while len(fin) < n_req:
        now = time.perf_counter() - t0
        while nxt < n_req and trace[nxt] <= now:
            rid = submit(eng, nxt, int(lens[nxt]))
            rid_arr[rid] = trace[nxt]
            nxt += 1
        if eng.queue or any(s.req is not None for s in eng.slots):
            for rid in eng.step_chunk():
                fin[rid] = time.perf_counter() - t0
        elif nxt < n_req:
            time.sleep(max(0.0, trace[nxt] - now))
    return sorted(fin[k] - rid_arr[k] for k in fin), max(fin.values())


def _drive_static(static_run, trace, dtype):
    """Window comparator: 50 ms coalescing, up-to-4 batches, one full
    max_new-step compiled scan per batch (`VevoService._run_batch`
    semantics — per-request lengths come from EOS, not the program)."""
    n_req = len(trace)
    fin2, nxt = {}, 0
    t0 = time.perf_counter()
    while nxt < n_req:
        now = time.perf_counter() - t0
        if trace[nxt] > now:
            time.sleep(trace[nxt] - now)
        time.sleep(0.05)  # coalescing window
        now = time.perf_counter() - t0
        batch = [i for i in range(nxt, n_req) if trace[i] <= now][:4]
        ks = jax.vmap(jax.random.key)(
            jnp.asarray([100 + i for i in batch] + [0] * (4 - len(batch)),
                        jnp.uint32))
        static_run(ks, dtype)
        done_t = time.perf_counter() - t0
        for i in batch:
            fin2[i] = done_t
        nxt = batch[-1] + 1
    return sorted(fin2[i] - trace[i] for i in fin2), max(fin2.values())


def bench_continuous_ar(family="vevo", dtypes=("bfloat16",)) -> None:
    """Continuous batching vs static window batching, SAME Poisson trace
    (`serving/continuous.py` — beyond-reference serving; now the default
    dispatcher in `bins/serve.py`). AR decode at production scale with
    VARIABLE per-request generation lengths (uniform 128..max_new —
    real workloads are length-skewed): requests arrive open-loop at each
    `AMPHION_BENCH_CQPS` rung and BOTH dispatchers replay the identical
    trace. The continuous engine admits each request into a live
    per-cursor decode slot at a chunk boundary and retires it at its own
    cap (host-side — no per-length compiles); the static comparator
    coalesces arrivals into up-to-4 batches behind a 50 ms window and
    pays one compiled max_new-step scan per batch. Reports p50/p95/p99
    end-to-end latency + req/s per rung for both; with multiple
    ``dtypes`` the same trace also answers the quantization crossover
    ("quantize single-stream, serve batches bf16" — does it survive
    per-slot occupancy?)."""
    make_engine, submit, static_run, meta = _build_bench_ar_family(family)
    new = meta["max_new"]
    slots = int(os.environ.get("AMPHION_BENCH_CSLOTS", "4"))
    chunk = int(os.environ.get("AMPHION_BENCH_CCHUNK", "64"))
    qps_pts = tuple(float(x) for x in os.environ.get(
        "AMPHION_BENCH_CQPS", "0.5,1.0,2.0,4.0").split(","))
    n_req = int(os.environ.get("AMPHION_BENCH_CREQ", "100"))
    lens = np.random.default_rng(7).integers(128, new + 1, size=n_req)

    # prime compiles once per dtype: admission + EVERY occupancy rung's
    # chunk program (staggered caps drain occupancy S -> 1, compiling
    # each rung on the way down) + the static ragged comparator
    for dt_s in dtypes:
        eng = make_engine(slots, chunk, dt_s)
        for i in range(slots):
            submit(eng, i, min(chunk * (i + 1), new))
        eng.run()
        static_run(jax.vmap(jax.random.key)(
            jnp.arange(4, dtype=jnp.uint32)), dt_s)

    rows = {}
    for qps in qps_pts:
        trace = np.random.default_rng(0).exponential(1.0 / qps,
                                                     n_req).cumsum()
        for dt_s in dtypes:
            tag = "" if len(dtypes) == 1 else f"_{dt_s}"
            cont_lat, cont_mk = _drive_continuous(
                make_engine, submit, trace, lens, slots, chunk, dt_s)
            stat_lat, stat_mk = _drive_static(static_run, trace, dt_s)
            rows.setdefault(qps, {}).update({
                f"cont{tag}_p50_s": round(_pctl(cont_lat, 50), 3),
                f"cont{tag}_p95_s": round(_pctl(cont_lat, 95), 3),
                f"cont{tag}_p99_s": round(_pctl(cont_lat, 99), 3),
                f"cont{tag}_req_s": round(n_req / cont_mk, 3),
                f"static{tag}_p50_s": round(_pctl(stat_lat, 50), 3),
                f"static{tag}_p95_s": round(_pctl(stat_lat, 95), 3),
                f"static{tag}_p99_s": round(_pctl(stat_lat, 99), 3),
                f"static{tag}_req_s": round(n_req / stat_mk, 3),
            })
            print(f"# [{family}/{dt_s}] continuous vs static @ {qps} qps: "
                  f"{rows[qps]}", file=sys.stderr)

    top = rows[max(qps_pts)]
    k50 = "cont_p50_s" if len(dtypes) == 1 else f"cont_{dtypes[0]}_p50_s"
    s50 = k50.replace("cont", "static", 1)
    _emit(f"continuous_{family}_p50_s", top[k50],
          "p50 end-to-end latency (s) at %.1f qps, continuous batching"
          % max(qps_pts),
          top[s50] / max(top[k50], 1e-9),
          extra={"rows_by_qps": {str(k): v for k, v in rows.items()},
                 "n_req": n_req, "slots": slots, "chunk": chunk,
                 "family": family, "dtypes": list(dtypes)})


def bench_chunk_cost() -> None:
    """Per-rung chunk-step cost of the continuous engine (Vevo-scale AR
    bf16): ms/step at occupancy 1/2/4/8 vs the one-shot ragged decode's
    per-step cost at matching batch (prefill differenced out). This
    quantifies the per-lane-cursor overhead that the occupancy-adaptive
    rungs bound, and tells whether a shared-ring-cursor redesign (cheap
    shared-index K/V writes) would pay at high occupancy."""
    from amphion_tpu.models.vc.ar_transformer import (
        ARTransformer, ARTransformerConfig, ar_transformer_generate_ragged,
    )
    from amphion_tpu.serving.continuous import ContinuousARBatcher

    r = jax.random.key(0)
    ar = ARTransformer(ARTransformerConfig(
        input_vocab=32, output_vocab=8192, hidden=1536, num_layers=20,
        num_heads=16, intermediate=6144, max_position=4096))
    toks0 = jnp.zeros((1, 8), jnp.int32)
    m0 = jnp.ones((1, 8), jnp.float32)
    params = ar.init(r, toks0, m0, toks0, m0,
                     method=ARTransformer.loss)["params"]
    # SERVING-shape capacity (an earlier cap-4000 probe tripled the
    # per-lane KV read and made the chunk look 2.3x the one-shot step;
    # at matched capacity the gap is ~0.5-1.2 ms/step and is tunnel
    # dispatch+fetch, NOT the per-lane cursor: a shared-scalar-cursor
    # variant measured 5.42 vs 5.43 ms/step at 4 lanes — the
    # ring-cursor redesign is measured moot)
    lc, chunk, slots = 650, 64, 8
    content = np.zeros((lc,), np.int32)
    eng = ContinuousARBatcher(ar, params, slots=slots, chunk=chunk,
                              buckets=(lc,), max_new=500, top_k=40,
                              compute_dtype="bfloat16")
    rows = {}
    for occ in (1, 2, 4, 8):
        while sum(s.req is not None for s in eng.slots) < occ:
            eng.submit(content, jax.random.key(100 + occ), max_new=500)
            eng.step_chunk()  # admit (+ compiles the rung on first use)
        eng.step_chunk()  # warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            eng.step_chunk()
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        rows[f"occ{occ}"] = {"ms_per_step": round(dt / chunk * 1e3, 3),
                             "ms_per_chunk": round(dt * 1e3, 1),
                             "rung": eng.last_rung}
        print(f"# chunk occ={occ} rung={eng.last_rung}: "
              f"{dt / chunk * 1e3:.3f} ms/step", file=sys.stderr)

    # one-shot ragged per-step cost at B, prefill differenced out
    for b in (1, 4, 8):
        cb = jnp.zeros((b, lc), jnp.int32)
        lb = jnp.full((b,), lc, jnp.int32)
        kb = jax.vmap(jax.random.key)(jnp.arange(b, dtype=jnp.uint32))

        def run(n):
            _fence(ar_transformer_generate_ragged(
                ar, params, cb, lb, kb, max_new=n, top_k=40,
                compute_dtype="bfloat16")[0])

        run(128)
        run(256)
        t128, t256 = [], []
        for _ in range(3):
            t0 = time.perf_counter(); run(128)
            t128.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); run(256)
            t256.append(time.perf_counter() - t0)
        step_ms = (np.median(t256) - np.median(t128)) / 128 * 1e3
        rows[f"oneshot_b{b}"] = {"ms_per_step": round(float(step_ms), 3)}
        print(f"# one-shot B={b}: {step_ms:.3f} ms/step", file=sys.stderr)

    _emit("chunk_step_ms_occ1", rows["occ1"]["ms_per_step"],
          "continuous chunk ms/step at occupancy 1 (vs one-shot B=1 "
          f"{rows['oneshot_b1']['ms_per_step']})",
          rows["oneshot_b1"]["ms_per_step"]
          / max(rows["occ1"]["ms_per_step"], 1e-9),
          extra={"rows": rows, "chunk": chunk})


def bench_continuous_http() -> None:
    """END-TO-END HTTP serving: the full Vevo voice pipeline (780M-class
    AR + 32-step FM + Vocos, random weights) behind the real
    `bins/serve.py` ThreadingHTTPServer, driven by the Poisson HTTP
    loadgen (`bins/loadgen.py` machinery) — the SAME fixed trace against
    `--batcher continuous` and `--batcher window`. This measures the
    shipped product path: base64-WAV request in, WAV out, front-end
    token extraction + AR + FM + vocoder + HTTP overhead all included.
    Request audio lengths vary (4-8 s), qps rungs from
    `AMPHION_BENCH_HQPS` (the full pipeline sustains well under 1 qps on
    one chip — the AR+FM tail is ~2-3 s of device time per request)."""
    from amphion_tpu.models.codec.repcodec import RepCodec, RepCodecConfig
    from amphion_tpu.models.vc.ar_transformer import (
        ARTransformer, ARTransformerConfig,
    )
    from amphion_tpu.models.vc.flow_matching_transformer import (
        FlowMatchingTransformer, FMTConfig,
    )
    from amphion_tpu.models.vocoders.vocos import VocosConfig, VocosGenerator
    from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
    from amphion_tpu.pipelines.vevo_pipeline import VevoPipeline
    from amphion_tpu.serving.continuous_service import VevoContinuousService
    from amphion_tpu.serving.loadgen import (
        http_synthesize_submit, poisson_arrivals, run_trace,
    )
    from amphion_tpu.serving.service import VevoService
    from bins import serve as serve_mod
    from bins.loadgen import make_request_factory
    import threading

    r = jax.random.key(0)
    mel_cfg = MelConfig(sample_rate=16000, n_fft=1024, win_size=1024,
                        hop_size=320, n_mel=80, fmax=8000.0)
    content_tok = RepCodec(RepCodecConfig(
        feature_dim=80, hidden=128, codebook_size=32, codebook_dim=8,
        num_blocks=2))
    style_tok = RepCodec(RepCodecConfig(
        feature_dim=80, hidden=128, codebook_size=8192, codebook_dim=8,
        num_blocks=2))
    feats = jnp.zeros((1, 20, 80))
    ct_params = content_tok.init(r, feats)["params"]
    st_params = style_tok.init(r, feats)["params"]
    ar = ARTransformer(ARTransformerConfig(
        input_vocab=32, output_vocab=8192, hidden=1536, num_layers=20,
        num_heads=16, intermediate=6144, max_position=4096))
    toks0 = jnp.zeros((1, 8), jnp.int32)
    m0 = jnp.ones((1, 8), jnp.float32)
    ar_params = ar.init(r, toks0, m0, toks0, m0,
                        method=ARTransformer.loss)["params"]
    fm = FlowMatchingTransformer(FMTConfig(hidden=1024, num_layers=16))
    mel0 = jnp.zeros((1, 10, 80))
    fm_params = fm.init(r, mel0, jnp.zeros((1, 10), jnp.int32),
                        jnp.ones((1, 10)).at[:, 4:].set(0.0),
                        jnp.ones((1, 10)), jax.random.key(1),
                        method=FlowMatchingTransformer.loss)["params"]
    voc = VocosGenerator(VocosConfig(dim=1280, intermediate_dim=4096,
                                     num_layers=24, n_mel=80))
    voc_params = voc.init(r, jnp.zeros((1, 16, 80)))["params"]

    def ssl(audio, sample_rate):
        t = max(len(audio) // mel_cfg.hop_size * mel_cfg.hop_size,
                mel_cfg.hop_size)
        return np.asarray(mel_spectrogram(
            jnp.asarray(audio[:t])[None], mel_cfg)).transpose(0, 2, 1)[0]

    pipe = VevoPipeline(
        content_tokenizer=content_tok, style_tokenizer=style_tok,
        ar=ar, fm=fm, vocoder=voc,
        params={"content_tokenizer": ct_params,
                "style_tokenizer": st_params, "ar": ar_params,
                "fm": fm_params, "vocoder": voc_params},
        hubert_extractor=ssl, mel_cfg=mel_cfg)

    qps_pts = tuple(float(x) for x in os.environ.get(
        "AMPHION_BENCH_HQPS", "0.25,0.5").split(","))
    n_req = int(os.environ.get("AMPHION_BENCH_HREQ", "50"))
    svc_kw = dict(len_step=128, max_content_len=512, max_prompt_len=256,
                  max_new=500,
                  flow_matching_steps=int(
                      os.environ.get("AMPHION_FM_STEPS", "32")),
                  fm_solver=os.environ.get("AMPHION_FM_SOLVER", "euler"),
                  cfg_scale=1.0, compute_dtype="bfloat16")

    rows = {}
    for batcher in ("continuous", "window"):
        if batcher == "continuous":
            svc = VevoContinuousService(pipe, slots=4, chunk=64, **svc_kw)
        else:
            svc = VevoService(pipe, max_batch=4, max_wait_ms=50.0,
                              **svc_kw)

        def synth(prompt_audio, prompt_text, target_text, target_sec,
                  seed, src_audio=None):
            return svc.synthesize(src_audio, prompt_audio, mode="voice",
                                  seed=seed), 16000

        httpd = serve_mod.serve(synth, svc.stats, "vevo", port=0,
                                input_sr=16000)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{port}"
        submit = http_synthesize_submit(url, timeout_s=900.0)
        make = make_request_factory("vevo", 16000, seed=42,
                                    min_sec=4.0, max_sec=8.0)
        try:
            # compile-surface warmup (untimed): per content bucket,
            # bursts of 4/3/2/1 concurrent same-length requests — the
            # window batcher compiles one program per (B, bucket), the
            # continuous engine one admission program per bucket plus
            # the shared chunk + FM programs. A first request otherwise
            # pays a 45-90 s tunnel compile mid-trace; production
            # servers pre-warm (serving services expose `prewarm()`).
            import concurrent.futures as cf

            for sec in (4.0, 8.0):
                wmake = make_request_factory("vevo", 16000, seed=7,
                                             min_sec=sec, max_sec=sec)
                for nb in (4, 3, 2, 1):
                    with cf.ThreadPoolExecutor(nb) as ex:
                        list(ex.map(lambda i: submit(wmake(i)),
                                    range(nb)))
                print(f"# [{batcher}] warmed bucket for {sec}s audio",
                      file=sys.stderr)
            # remaining extractor length-grid points (0.5 s grid)
            for sec in np.arange(4.5, 8.0, 0.5):
                wmake = make_request_factory("vevo", 16000, seed=7,
                                             min_sec=float(sec),
                                             max_sec=float(sec))
                submit(wmake(0))
            print(f"# [{batcher}] warmup complete", file=sys.stderr)
            for qps in qps_pts:
                arrivals = poisson_arrivals(qps, n_req, seed=42)
                res = run_trace(submit, make, arrivals,
                                drain_timeout_s=1800.0)
                row = res.row()
                try:
                    import urllib.request

                    with urllib.request.urlopen(url + "/api/stats",
                                                timeout=10) as r:
                        row["server_stats"] = json.loads(r.read())
                except Exception:
                    pass
                rows.setdefault(qps, {})[batcher] = row
                print(f"# [http/{batcher}] @ {qps} qps: {row}",
                      file=sys.stderr)
        finally:
            httpd.shutdown()
            if hasattr(svc, "shutdown"):
                svc.shutdown()
            elif hasattr(svc, "batcher"):
                svc.batcher.shutdown()

    top = rows[max(qps_pts)]
    _emit("continuous_http_p50_s",
          top["continuous"]["p50_ms"] / 1e3,
          "p50 end-to-end HTTP latency (s) at %.2f qps, full Vevo voice "
          "pipeline, continuous batching" % max(qps_pts),
          top["window"]["p50_ms"] / max(top["continuous"]["p50_ms"], 1e-9),
          extra={"rows_by_qps": {str(k): v for k, v in rows.items()},
                 "n_req": n_req})


_SUITE = {
    "mel": bench_mel,
    "bigvgan": bench_bigvgan,
    "train_hifigan": bench_train_hifigan,
    "train_hifigan_bf16": lambda: bench_train_hifigan("bfloat16"),
    "train_hifigan_bf16_b64": lambda: bench_train_hifigan("bfloat16", 64),
    "train_maskgct": bench_train_maskgct,
    "maskgct": bench_maskgct_rtf,
    "serving": bench_maskgct_serving,
    "serving_valle": bench_valle_serving,
    "serving_vevo": bench_vevo_serving,
    "serving_vevo_int4": lambda: bench_vevo_serving(compute_dtype="int4"),
    "serving_latency": bench_serving_latency,
    "continuous": bench_continuous_ar,
    "continuous_valle": lambda: bench_continuous_ar(family="valle"),
    "continuous_crossover": lambda: bench_continuous_ar(
        family="vevo", dtypes=("bfloat16", "int4")),
    "continuous_http": bench_continuous_http,
    "chunk_cost": bench_chunk_cost,
    "valle": bench_valle_rtf,
    "valle_int8": lambda: bench_valle_rtf("int8"),
    "valle_int4": lambda: bench_valle_rtf("int4"),
    "vevo": bench_vevo_rtf,
    "vevo_int8": lambda: bench_vevo_rtf("int8"),
    "vevo_int4": lambda: bench_vevo_rtf("int4"),
    "vevo_spec_cost": bench_vevo_spec_cost,
    "vevo_spec_accept": bench_vevo_spec_accept,
    "maskgct_frontier": bench_maskgct_frontier,
    "fm_frontier": bench_fm_frontier,
    "bf16_gan_bandwidth": bench_bf16_gan_bandwidth,
    "flash": bench_flash_attention,
    "ssl": bench_ssl_extract,
}

def _run_isolated(names) -> int:
    """Run each named bench in a fresh subprocess (allocator/autotune state
    from one bench contaminates the next in-process — BENCHMARKS.md)."""
    import subprocess

    rc = 0
    for n in names:
        r = subprocess.run([sys.executable, __file__, "--inproc", n])
        rc = rc or r.returncode
    return rc


if __name__ == "__main__":
    # `--inproc NAME` is the internal per-subprocess entry; `--only a,b,c`
    # and `--suite` subprocess-isolate every bench so no number depends on
    # run order. Bare `python bench.py` = the headline vocoder bench.
    if "--inproc" in sys.argv:
        _SUITE[sys.argv[sys.argv.index("--inproc") + 1]]()
        sys.exit(0)
    if "--only" in sys.argv:
        names = sys.argv[sys.argv.index("--only") + 1].split(",")
        sys.exit(_run_isolated(names))
    if "--suite" in sys.argv:
        main()
        sys.exit(_run_isolated(list(_SUITE)))
    main()
