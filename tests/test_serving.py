"""Serving runtime tests: micro-batcher mechanics + batched MaskGCT service."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.serving.batcher import MicroBatcher, bucket_ladder


# ---------------------------------------------------------------------------
# MicroBatcher
# ---------------------------------------------------------------------------


def test_bucket_ladder():
    assert bucket_ladder(1, 64, 512) == 64
    assert bucket_ladder(64, 64, 512) == 64
    assert bucket_ladder(65, 64, 512) == 128
    assert bucket_ladder(512, 64, 512) == 512
    with pytest.raises(ValueError):
        bucket_ladder(513, 64, 512)


def test_batcher_coalesces_and_routes():
    calls = []

    def run_batch(bucket, payloads):
        calls.append((bucket, list(payloads)))
        return [p * 10 for p in payloads]

    mb = MicroBatcher(run_batch, bucket_fn=lambda p: "b", max_batch=4,
                      max_wait_ms=150.0)
    try:
        futs = [mb.submit(i) for i in range(6)]
        results = [f.result(timeout=10) for f in futs]
        assert results == [0, 10, 20, 30, 40, 50]
        sizes = sorted(len(c[1]) for c in calls)
        # 6 requests, cap 4: two batches (4+2) — or (…) if the worker won the
        # race before all submissions landed; total must be 6, max ≤ 4
        assert sum(sizes) == 6 and max(sizes) <= 4
        assert mb.stats.snapshot()["completed"] == 6
    finally:
        mb.shutdown()


def test_batcher_never_mixes_buckets():
    seen = []

    def run_batch(bucket, payloads):
        seen.append((bucket, list(payloads)))
        assert all(p % 2 == bucket for p in payloads)
        return payloads

    mb = MicroBatcher(run_batch, bucket_fn=lambda p: p % 2, max_batch=8,
                      max_wait_ms=100.0)
    try:
        futs = [mb.submit(i) for i in range(10)]
        assert [f.result(timeout=10) for f in futs] == list(range(10))
        for bucket, payloads in seen:
            assert all(p % 2 == bucket for p in payloads)
    finally:
        mb.shutdown()


def test_batcher_single_request_flushes_on_timeout():
    mb = MicroBatcher(lambda b, ps: ps, bucket_fn=lambda p: 0, max_batch=8,
                      max_wait_ms=30.0)
    try:
        t0 = time.monotonic()
        assert mb.submit("x").result(timeout=5) == "x"
        assert time.monotonic() - t0 < 2.0
    finally:
        mb.shutdown()


def test_batcher_error_fanout_keeps_serving():
    def run_batch(bucket, payloads):
        if any(p == "boom" for p in payloads):
            raise RuntimeError("kaboom")
        return payloads

    mb = MicroBatcher(run_batch, bucket_fn=lambda p: p == "boom",
                      max_batch=4, max_wait_ms=10.0)
    try:
        bad = mb.submit("boom")
        with pytest.raises(RuntimeError, match="kaboom"):
            bad.result(timeout=5)
        assert mb.submit("ok").result(timeout=5) == "ok"
        snap = mb.stats.snapshot()
        assert snap["failed"] == 1 and snap["completed"] == 1
    finally:
        mb.shutdown()


def test_batcher_concurrent_threads_batch_together():
    """Threads arriving within the wait window share device batches."""
    sizes = []

    def run_batch(bucket, payloads):
        time.sleep(0.02)  # emulate device latency so stragglers queue up
        sizes.append(len(payloads))
        return [p + 1 for p in payloads]

    mb = MicroBatcher(run_batch, bucket_fn=lambda p: 0, max_batch=8,
                      max_wait_ms=40.0)
    results = {}

    def client(i):
        results[i] = mb.submit(i).result(timeout=10)

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == {i: i + 1 for i in range(12)}
        assert max(sizes) >= 2  # coalescing actually happened
    finally:
        mb.shutdown()


# ---------------------------------------------------------------------------
# MaskGCTService end-to-end (tiny models, CPU)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_service():
    from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
    from amphion_tpu.models.codec.repcodec import RepCodec, RepCodecConfig
    from amphion_tpu.models.tts.maskgct.maskgct import (
        MaskGCTS2A, MaskGCTT2S, S2AConfig, T2SConfig,
    )
    from amphion_tpu.pipelines.maskgct_pipeline import MaskGCTPipeline
    from amphion_tpu.serving.service import MaskGCTService

    sem_dim = 8
    t2s_cfg = T2SConfig(hidden=32, num_layers=1, num_heads=4, codebook_size=24,
                        phone_vocab=64, max_position=256)
    s2a_cfg = S2AConfig(hidden=32, num_layers=1, num_heads=4, codebook_size=16,
                        num_quantizers=2, semantic_dim=24, max_position=256)
    sem_cfg = RepCodecConfig(feature_dim=sem_dim, hidden=24, codebook_size=24,
                             codebook_dim=4, num_blocks=1)
    ac_cfg = CodecConfig(sample_rate=8000, encoder_dim=4, latent_dim=8,
                         decoder_dim=4, strides=(2, 4), num_quantizers=2,
                         codebook_size=16, codebook_dim=4)
    t2s, s2a = MaskGCTT2S(t2s_cfg), MaskGCTS2A(s2a_cfg)
    sem, ac = RepCodec(sem_cfg), AmphionCodec(ac_cfg)
    params = {
        "t2s": t2s.init(
            jax.random.key(0), jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8)),
            jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4)), jax.random.key(1),
            method=MaskGCTT2S.compute_loss)["params"],
        "s2a": s2a.init(
            jax.random.key(0), jnp.zeros((1, 2, 8), jnp.int32),
            jnp.ones((1, 8)), jnp.zeros((1, 8, 24)), jax.random.key(1),
            method=MaskGCTS2A.compute_loss)["params"],
        "semantic_codec": sem.init(
            jax.random.key(0), jnp.zeros((1, 8, sem_dim)))["params"],
        "acoustic_codec": ac.init(
            jax.random.key(0), jnp.zeros((1, ac_cfg.hop * 4)))["params"],
    }

    def extractor(audio, sr):
        n = max(len(audio) // 8, 1)
        rng = np.random.default_rng(int(abs(audio[:10]).sum() * 1e4) % 2**31)
        return rng.standard_normal((n, sem_dim)).astype(np.float32)

    pipe = MaskGCTPipeline(
        t2s=t2s, s2a=s2a, semantic_codec=sem, acoustic_codec=ac,
        params=params, semantic_extractor=extractor, sample_rate=8000,
    )
    svc = MaskGCTService(
        pipe, max_batch=4, max_wait_ms=60.0, len_step=16,
        max_prompt_len=64, max_target_len=64, max_phone_len=64,
        t2s_kwargs={"n_steps": 4, "compute_dtype": "float32"},
        s2a_kwargs={"first_layer_steps": 3, "compute_dtype": "float32"},
    )
    yield svc
    svc.batcher.shutdown()


def test_service_single_request(tiny_service):
    rng = np.random.default_rng(0)
    prompt = (rng.standard_normal(8 * 32) * 0.2).astype(np.float32)
    wav = tiny_service.synthesize(prompt, "hi there", "hello world",
                                  target_len=12, seed=1)
    ac_hop = tiny_service.pipeline.acoustic_codec.cfg.hop
    assert wav.shape == (12 * ac_hop,)
    assert np.isfinite(wav).all()


def test_service_concurrent_requests_batch_and_stay_deterministic(tiny_service):
    """Concurrent mixed-length requests: each result must equal the result
    of the same request served alone (batch-composition invariance)."""
    rng = np.random.default_rng(1)
    prompt = (rng.standard_normal(8 * 32) * 0.2).astype(np.float32)
    reqs = [
        ("short text", 10, 7),
        ("a somewhat longer target text here", 14, 8),
        ("third request", 12, 9),
    ]
    # serve alone first (the fixture's batcher is idle → batch of 1)
    alone = [
        tiny_service.synthesize(prompt, "prompt words", txt,
                                target_len=tl, seed=seed)
        for txt, tl, seed in reqs
    ]
    results = {}

    def client(i, txt, tl, seed):
        results[i] = tiny_service.synthesize(prompt, "prompt words", txt,
                                             target_len=tl, seed=seed)

    threads = [
        threading.Thread(target=client, args=(i, *r)) for i, r in enumerate(reqs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, (txt, tl, seed) in enumerate(reqs):
        np.testing.assert_array_equal(
            results[i], alone[i],
            err_msg=f"request {i} changed when batched with others",
        )
    snap = tiny_service.stats()
    assert snap["completed"] >= 6 and snap["failed"] == 0


@pytest.fixture(scope="module")
def tiny_valle_service():
    from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
    from amphion_tpu.models.tts.valle.valle import VALLE, VALLEConfig
    from amphion_tpu.serving.service import VALLEService
    from amphion_tpu.text.g2p import G2PModule
    from amphion_tpu.utils.tokenizer import AudioTokenizer

    cfg = VALLEConfig(num_phones=300, audio_vocab=16, num_quantizers=2,
                      hidden=32, num_layers=1, num_heads=4, max_position=256)
    model = VALLE(cfg)
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.key(0),
        jnp.asarray(rng.integers(1, 20, (1, 5))), jnp.ones((1, 5)),
        jnp.asarray(rng.integers(0, 16, (1, cfg.num_quantizers, 8))),
        jnp.ones((1, 8)), jax.random.key(1), method=VALLE.train_loss,
    )["params"]
    ac_cfg = CodecConfig(sample_rate=8000, encoder_dim=4, latent_dim=8,
                         decoder_dim=4, strides=(2, 4), num_quantizers=2,
                         codebook_size=16, codebook_dim=4)
    codec = AmphionCodec(ac_cfg)
    codec_params = codec.init(
        jax.random.key(0), jnp.zeros((1, ac_cfg.hop * 4)))["params"]
    tok = AudioTokenizer(codec, codec_params, 8000)
    g2p = G2PModule("char")
    table = g2p.build_symbol_table(
        ["prompt words short text a somewhat longer target text here third"])
    svc = VALLEService(
        model, params, tok, g2p, table, max_batch=4, max_wait_ms=60.0,
        len_step=16, max_phone_len=64, max_prompt_len=32, max_new=8,
        temperature=1.0, top_k=4, compute_dtype="float32",
    )
    yield svc, ac_cfg.hop
    svc.batcher.shutdown()


def test_valle_service_concurrent_batch_invariance(tiny_valle_service):
    svc, hop = tiny_valle_service
    rng = np.random.default_rng(2)
    prompt = (rng.standard_normal(8 * 24) * 0.2).astype(np.float32)
    reqs = [("short text", 3), ("a longer target text here", 4),
            ("third", 5)]
    alone = [svc.synthesize(prompt, "prompt words", txt, seed=seed)
             for txt, seed in reqs]
    results = {}

    def client(i, txt, seed):
        results[i] = svc.synthesize(prompt, "prompt words", txt, seed=seed)

    threads = [threading.Thread(target=client, args=(i, *r))
               for i, r in enumerate(reqs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(len(reqs)):
        assert results[i].shape == alone[i].shape
        np.testing.assert_array_equal(
            results[i], alone[i],
            err_msg=f"request {i} changed when batched with others")
        assert results[i].ndim == 1 and results[i].shape[0] % hop == 0
        assert np.isfinite(results[i]).all()
    snap = svc.stats()
    assert snap["failed"] == 0


# ---------------------------------------------------------------------------
# HTTP server (bins/serve.py, sine backend)
# ---------------------------------------------------------------------------


def test_serve_http_concurrent_sine():
    import argparse
    import base64
    import io
    import json
    import urllib.request
    import wave

    from bins import serve as serve_mod

    args = argparse.Namespace(max_batch=4, max_wait_ms=40.0)
    synth, stats, input_sr = serve_mod._build_sine_service(args)
    httpd = serve_mod.serve(synth, stats, "sine", port=0, input_sr=input_sr)
    port = httpd.server_address[1]
    server_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    server_thread.start()
    try:
        # health + page
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/health", timeout=10
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["batching"] is True

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(24000)
            w.writeframes((np.zeros(2400, np.int16)).tobytes())
        body = json.dumps({
            "prompt_wav": base64.b64encode(buf.getvalue()).decode(),
            "prompt_text": "p", "target_text": "t", "target_sec": 0.25,
        }).encode()

        wavs = {}

        def post(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/synthesize", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                wavs[i] = r.read()

        threads = [threading.Thread(target=post, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(wavs) == 5
        for raw in wavs.values():
            with wave.open(io.BytesIO(raw)) as w:
                assert w.getframerate() == 24000
                assert w.getnframes() == int(0.25 * 24000)

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/stats", timeout=10
        ) as r:
            snap = json.loads(r.read())
        assert snap["completed"] == 5
        # tail-latency percentiles surface through the endpoint (r4)
        assert snap["latency_ms_p99"] >= snap["latency_ms_p95"] \
            >= snap["latency_ms_p50"] > 0
    finally:
        httpd.shutdown()

def test_batcher_latency_percentiles():
    """End-to-end per-request latency lands in stats with p50/p95/p99
    (VERDICT r3 #7)."""
    import time as _time

    def run_batch(bucket, payloads):
        _time.sleep(0.02)
        return payloads

    mb = MicroBatcher(run_batch, bucket_fn=lambda p: 0, max_batch=4,
                      max_wait_ms=5.0)
    futs = [mb.submit(i) for i in range(12)]
    for f in futs:
        f.result(timeout=10)
    snap = mb.stats.snapshot()
    mb.shutdown()
    assert snap["latency_ms_p50"] >= 20.0  # at least one 20 ms batch
    assert snap["latency_ms_p99"] >= snap["latency_ms_p95"] \
        >= snap["latency_ms_p50"]
    # 12 requests over >= 3 sequential 20 ms batches: p99 sees queueing
    assert snap["latency_ms_p99"] > snap["latency_ms_p50"]


def test_poisson_loadgen_tail_grows_with_load():
    """Open-loop Poisson drive: at a rate beyond service capacity the
    tail latency must grow (queueing delay) — the property the
    latency-vs-load table in docs/serving.md measures."""
    import time as _time

    from amphion_tpu.serving.loadgen import run_load

    def run_batch(bucket, payloads):
        _time.sleep(0.05)  # capacity: 20 req/s at max_batch=1
        return payloads

    mb = MicroBatcher(run_batch, bucket_fn=lambda p: 0, max_batch=1,
                      max_wait_ms=0.0)
    light = run_load(mb.submit, lambda i: i, qps=4.0, duration_s=1.5,
                     seed=0)
    heavy = run_load(mb.submit, lambda i: i, qps=40.0, duration_s=1.5,
                     seed=1)
    mb.shutdown()
    assert light.n_ok > 0 and heavy.n_ok > 0
    assert light.latency_ms_p50 >= 50.0
    # over capacity → queue builds → p95 far above the service time
    assert heavy.latency_ms_p95 > light.latency_ms_p95 * 2
    row = heavy.row()
    assert set(row) >= {"qps_target", "p50_ms", "p95_ms", "p99_ms"}
