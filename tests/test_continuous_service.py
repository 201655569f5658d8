"""Continuous-batching serving services (`serving/continuous_service.py`).

Contract: the continuous dispatcher is a drop-in for the window one —
a request served through `VevoContinuousService`/`ValleContinuousService`
returns the SAME result as the window service (token streams identical;
waveforms equal because the non-AR tail runs the same compiled shapes on
the same inputs), under concurrency, and through the HTTP server with
continuous metrics on `/api/stats`.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.ops.mel import MelConfig, mel_spectrogram

MEL = MelConfig(sample_rate=16000, n_fft=64, win_size=64, hop_size=32,
                n_mel=8, fmax=8000.0)


def _tiny_vevo_pipeline():
    from amphion_tpu.models.codec.repcodec import RepCodec, RepCodecConfig
    from amphion_tpu.models.vc.ar_transformer import (
        ARTransformer,
        ARTransformerConfig,
    )
    from amphion_tpu.models.vc.flow_matching_transformer import (
        FlowMatchingTransformer,
        FMTConfig,
    )
    from amphion_tpu.models.vocoders.vocos import VocosConfig, VocosGenerator
    from amphion_tpu.pipelines.vevo_pipeline import VevoPipeline

    r = jax.random.key(0)
    content_tok = RepCodec(RepCodecConfig(
        feature_dim=8, hidden=16, codebook_size=32, codebook_dim=4,
        num_blocks=1))
    style_tok = RepCodec(RepCodecConfig(
        feature_dim=8, hidden=16, codebook_size=64, codebook_dim=4,
        num_blocks=1))
    feats = jnp.zeros((1, 20, 8))
    ct_params = content_tok.init(r, feats)["params"]
    st_params = style_tok.init(r, feats)["params"]
    ar = ARTransformer(ARTransformerConfig(
        input_vocab=32, output_vocab=64, hidden=32, intermediate=64,
        num_layers=2, num_heads=2, max_position=2048))
    toks = jnp.zeros((1, 6), jnp.int32)
    m = jnp.ones((1, 6), jnp.float32)
    ar_params = ar.init(r, toks, m, toks, m,
                        method=ARTransformer.loss)["params"]
    fm = FlowMatchingTransformer(FMTConfig(
        token_vocab=64, n_mel=8, hidden=32, num_layers=2, num_heads=2,
        max_position=2048))
    tok = jnp.zeros((1, 10), jnp.int32)
    mel = jnp.zeros((1, 10, 8))
    pmask = jnp.concatenate([jnp.ones((1, 4)), jnp.zeros((1, 6))], axis=1)
    fm_params = fm.init(r, mel, tok, pmask, jnp.ones((1, 10)),
                        jax.random.key(1),
                        method=FlowMatchingTransformer.loss)["params"]
    voc = VocosGenerator(VocosConfig(
        n_mel=8, dim=16, intermediate_dim=32, num_layers=1, n_fft=64,
        hop_size=32))
    voc_params = voc.init(r, mel)["params"]

    def ssl(audio, sample_rate):
        t = max(len(audio) // MEL.hop_size * MEL.hop_size, MEL.hop_size)
        return np.asarray(mel_spectrogram(
            jnp.asarray(audio[:t])[None], MEL)).transpose(0, 2, 1)[0]

    return VevoPipeline(
        content_tokenizer=content_tok, style_tokenizer=style_tok,
        ar=ar, fm=fm, vocoder=voc,
        params={"content_tokenizer": ct_params, "style_tokenizer": st_params,
                "ar": ar_params, "fm": fm_params, "vocoder": voc_params},
        hubert_extractor=ssl, mel_cfg=MEL,
    )


SVC_KW = dict(len_step=32, max_content_len=256, max_prompt_len=128,
              max_new=32, flow_matching_steps=2, cfg_scale=1.0,
              compute_dtype="float32")


@pytest.fixture(scope="module")
def vevo_pair():
    from amphion_tpu.serving.continuous_service import VevoContinuousService
    from amphion_tpu.serving.service import VevoService

    pipe = _tiny_vevo_pipeline()
    window = VevoService(pipe, max_batch=4, max_wait_ms=30.0, **SVC_KW)
    cont = VevoContinuousService(pipe, slots=2, chunk=8, **SVC_KW)
    yield window, cont
    window.batcher.shutdown()
    cont.shutdown()


def _audio(seed, n=3200):
    return (np.random.default_rng(seed).standard_normal(n)
            .astype(np.float32) * 0.1)


@pytest.mark.parametrize("mode", ["voice", "timbre"])
def test_vevo_continuous_matches_window(vevo_pair, mode):
    """Same request, both dispatchers → same waveform (AR tokens are
    engine-exact vs the ragged decode; the FM tail then sees identical
    inputs and compiled shapes)."""
    window, cont = vevo_pair
    src, ref = _audio(1), _audio(2, 2400)
    a = window.synthesize(src, ref, mode=mode, seed=7)
    b = cont.synthesize(src, ref, mode=mode, seed=7)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_vevo_continuous_concurrent_invariance(vevo_pair):
    """Concurrent voice requests through the continuous service each
    reproduce their solo result."""
    _, cont = vevo_pair
    ref = _audio(2, 2400)
    reqs = [(3, 11), (4, 13), (5, 17)]
    solo = {s: cont.synthesize(_audio(a), ref, mode="voice", seed=s)
            for a, s in reqs}
    results = {}

    def client(aseed, seed):
        results[seed] = cont.synthesize(_audio(aseed), ref, mode="voice",
                                        seed=seed)

    threads = [threading.Thread(target=client, args=r) for r in reqs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for _, s in reqs:
        assert results[s].shape == solo[s].shape
        np.testing.assert_allclose(results[s], solo[s], atol=1e-5,
                                   err_msg=f"seed {s}")
    st = cont.stats()
    assert st["batcher"] == "continuous"
    # requests are served by the engine OR the solo fast path (a fast
    # tiny model can drain concurrent arrivals one-at-a-time solo)
    assert st["admitted"] + st["solo_served"] >= 6


def test_vevo_continuous_overlong_request_errors(vevo_pair):
    """Engine submit errors propagate to the calling thread (driver
    stays alive for later requests)."""
    _, cont = vevo_pair
    ref = _audio(2, 2400)
    # content tokens beyond max_content_len are truncated by the front
    # end, so drive the engine directly with an over-long prompt
    with pytest.raises(ValueError):
        cont.driver.submit_wait(np.zeros(4096, np.int32),
                                jax.random.key(0), max_new=8)
    # driver still serves
    out = cont.synthesize(_audio(9), ref, mode="voice", seed=23)
    assert out.ndim == 1 and len(out) > 0


@pytest.fixture(scope="module")
def valle_pair():
    from amphion_tpu.models.codec.amphion_codec import (
        AmphionCodec,
        CodecConfig,
    )
    from amphion_tpu.models.tts.valle.valle import VALLE, VALLEConfig
    from amphion_tpu.serving.continuous_service import ValleContinuousService
    from amphion_tpu.serving.service import VALLEService
    from amphion_tpu.text.g2p import G2PModule
    from amphion_tpu.utils.tokenizer import AudioTokenizer

    cfg = VALLEConfig(num_phones=300, audio_vocab=16, num_quantizers=2,
                      hidden=32, num_layers=1, num_heads=4,
                      max_position=256)
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
        ["prompt words short text a somewhat longer target text here"])
    kw = dict(len_step=16, max_phone_len=64, max_prompt_len=32, max_new=8,
              temperature=1.0, top_k=4, compute_dtype="float32")
    window = VALLEService(model, params, tok, g2p, table, max_batch=4,
                          max_wait_ms=30.0, **kw)
    cont = ValleContinuousService(model, params, tok, g2p, table,
                                  slots=2, chunk=4, **kw)
    yield window, cont
    window.batcher.shutdown()
    cont.shutdown()


def test_valle_continuous_matches_window(valle_pair):
    window, cont = valle_pair
    prompt = (np.random.default_rng(2).standard_normal(8 * 24)
              .astype(np.float32) * 0.2)
    for txt, seed in [("short text", 3), ("longer target text here", 4)]:
        a = window.synthesize(prompt, "prompt words", txt, seed=seed)
        b = cont.synthesize(prompt, "prompt words", txt, seed=seed)
        assert a.shape == b.shape, (txt, seed)
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=txt)
    st = cont.stats()
    assert st["batcher"] == "continuous"
    assert st["admitted"] + st["solo_served"] >= 2


def test_http_continuous_vevo():
    """The continuous service behind the real HTTP server: concurrent
    POSTs return audio; /api/stats exposes the continuous metrics."""
    import base64
    import io
    import json
    import urllib.request
    import wave

    from amphion_tpu.serving.continuous_service import VevoContinuousService
    from bins import serve as serve_mod

    pipe = _tiny_vevo_pipeline()
    svc = VevoContinuousService(pipe, slots=2, chunk=8, **SVC_KW)

    def synth(prompt_audio, prompt_text, target_text, target_sec, seed,
              src_audio=None):
        return svc.synthesize(src_audio, prompt_audio, mode="voice",
                              seed=seed), 16000

    httpd = serve_mod.serve(synth, svc.stats, "vevo", port=0,
                            input_sr=16000)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def wav_b64(seed, n):
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((_audio(seed, n) * 32767)
                              .astype(np.int16).tobytes())
            return base64.b64encode(buf.getvalue()).decode()

        def post(i):
            body = json.dumps({
                "prompt_wav": wav_b64(2, 2400),
                "src_wav": wav_b64(10 + i, 3200),
                "seed": i,
            }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/synthesize", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                wavs[i] = r.read()

        wavs = {}
        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(wavs) == 3
        for raw in wavs.values():
            with wave.open(io.BytesIO(raw)) as w:
                assert w.getnframes() > 0

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/stats", timeout=10) as r:
            st = json.loads(r.read())
        assert st["batcher"] == "continuous"
        assert st["admitted"] + st["solo_served"] >= 3
        assert st["ar_p99_s"] >= st["ar_p50_s"] > 0
    finally:
        httpd.shutdown()
        svc.shutdown()


def test_http_loadgen_trace_roundtrip():
    """`bins/loadgen.py` machinery against the sine backend: a fixed
    Poisson trace driven through HTTP returns per-request latencies and
    the server's stats snapshot."""
    import argparse

    from amphion_tpu.serving.loadgen import (
        http_synthesize_submit,
        poisson_arrivals,
        run_trace,
    )
    from bins import serve as serve_mod
    from bins.loadgen import make_request_factory

    args = argparse.Namespace(max_batch=4, max_wait_ms=20.0)
    synth, stats, input_sr = serve_mod._build_sine_service(args)
    httpd = serve_mod.serve(synth, stats, "sine", port=0, input_sr=input_sr)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        submit = http_synthesize_submit(f"http://127.0.0.1:{port}")
        make = make_request_factory("tts", 24000, seed=0,
                                    min_sec=0.2, max_sec=0.4)
        arrivals = poisson_arrivals(20.0, 6, seed=0)
        res = run_trace(submit, make, arrivals, drain_timeout_s=60.0)
        assert res.n_ok == 6 and res.n_err == 0
        assert len(res.lat_ms) == 6
        assert res.latency_ms_p99 >= res.latency_ms_p50 > 0
    finally:
        httpd.shutdown()


def test_prewarm_compiles_bucket_surface():
    """prewarm() drives every admission bucket pair, every occupancy
    rung, the solo fast-path programs, and the FM tail without error,
    and serving still works afterwards.

    Uses a DEDICATED small-ladder service (2 content x 1 style buckets)
    rather than the module fixture: prewarm compiles (admission + solo)
    per bucket pair, and the fixture's 8x4 ladder piles ~70 fresh XLA
    CPU programs onto a full-suite run's accumulated state — measured
    to segfault the CPU client deep into the suite (passes in
    isolation). Coverage is identical; the compile count is bounded."""
    from amphion_tpu.serving.continuous_service import VevoContinuousService

    pipe = _tiny_vevo_pipeline()
    svc = VevoContinuousService(
        pipe, slots=2, chunk=8, len_step=128, max_content_len=256,
        max_prompt_len=128, max_new=16, flow_matching_steps=2,
        cfg_scale=1.0, compute_dtype="float32")
    try:
        svc.prewarm()
        st = svc.stats()
        assert st["solo_served"] >= 1  # solo warms routed solo
        out = svc.synthesize(_audio(31), _audio(2, 2400), mode="voice",
                             seed=77)
        assert out.ndim == 1 and len(out) > 0
    finally:
        svc.shutdown()


def test_prewarm_valle(valle_pair):
    """VALL-E prewarm on the fixture's small ladder (2x1 pairs)."""
    _, cont = valle_pair
    cont.prewarm()
    prompt = (np.random.default_rng(4).standard_normal(8 * 24)
              .astype(np.float32) * 0.2)
    out = cont.synthesize(prompt, "prompt words", "short text", seed=78)
    assert out.ndim == 1 and len(out) > 0


def test_solo_fast_path_matches_engine(vevo_pair):
    """An idle engine serves a lone request through the one-shot solo
    path; the token stream (and waveform) is identical to the engine
    path, and stats count the solo service."""
    _, cont = vevo_pair
    ref = _audio(2, 2400)
    before = cont.driver._solo_served
    a = cont.synthesize(_audio(41), ref, mode="voice", seed=91)
    assert cont.driver._solo_served == before + 1
    # force the engine path for the same request
    cont.driver.solo_enabled = False
    try:
        b = cont.synthesize(_audio(41), ref, mode="voice", seed=91)
    finally:
        cont.driver.solo_enabled = True
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert cont.stats()["solo_served"] >= 1


def test_solo_fast_path_valle(valle_pair):
    window, cont = valle_pair
    prompt = (np.random.default_rng(2).standard_normal(8 * 24)
              .astype(np.float32) * 0.2)
    before = cont.driver._solo_served
    a = cont.synthesize(prompt, "prompt words", "short text", seed=93)
    assert cont.driver._solo_served == before + 1
    w = window.synthesize(prompt, "prompt words", "short text", seed=93)
    np.testing.assert_allclose(a, w, atol=1e-5)
