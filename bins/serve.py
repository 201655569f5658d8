"""Production zero-shot TTS serving: concurrent HTTP + micro-batched TPU.

The batching sibling of `bins/demo_server.py` (which is single-threaded,
one request per device dispatch — the reference's gradio-demo model,
`models/tts/maskgct/gradio_demo.py`). Here a `ThreadingHTTPServer` accepts
concurrent requests and `amphion_tpu.serving.MaskGCTService` coalesces
them into shape-bucketed batches: one compiled T2S/S2A/codec program per
batch, per-request RNG isolation (results don't depend on who shares the
batch — tests/test_serving.py).

API (same schema as the demo server, plus stats):
  GET  /            → HTML page
  GET  /api/health  → {"status": "ok", "backend": ...}
  GET  /api/stats   → batching stats (mean/max batch size, wait, counts)
  POST /api/synthesize
       {"prompt_wav": <base64 WAV>, "prompt_text": str, "target_text": str,
        "target_sec": float|null, "seed": int|null}
       → audio/wav bytes

Backends: ``--backend maskgct`` (batched real pipeline) and
``--backend sine`` (threads through a MicroBatcher too, so the batching
plumbing is smoke-testable without checkpoints).

Dispatchers (``--batcher``): the AR backends (valle, vevo) default to
**continuous batching** (`serving/continuous_service.py`) — requests
join a live per-slot decode at chunk boundaries instead of waiting for
a batch window; measured 1.7-2.5× better p50 than the static window
batcher at every load rung on the same Poisson trace, +17-50% req/s at
saturation (BENCHMARKS.md). ``--batcher window`` restores the static
micro-batcher. ``GET /api/stats`` reports the active dispatcher's
metrics (slot occupancy, admissions, AR latency percentiles for
continuous; batch-size/wait histograms for window).
"""

from __future__ import annotations

import argparse
import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from bins.demo_server import PAGE, _decode_wav_bytes, _encode_wav_bytes

_seed_lock = threading.Lock()
_seed_counter = [0]
_PREWARM = [None]  # set by builders whose service exposes prewarm()


def _next_seed() -> int:
    with _seed_lock:
        _seed_counter[0] += 1
        return _seed_counter[0]


def _build_sine_service(args):
    """Checkpoint-free backend that still exercises the MicroBatcher."""
    from amphion_tpu.serving.batcher import MicroBatcher

    sr = 24000

    def run_batch(bucket, payloads):
        out = []
        for (n,) in payloads:
            t = np.arange(n, dtype=np.float32) / sr
            out.append(0.3 * np.sin(2 * np.pi * 220.0 * t))
        return out

    mb = MicroBatcher(run_batch, bucket_fn=lambda p: p[0] // (sr // 2),
                      max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)

    def synth(prompt_audio, prompt_text, target_text, target_sec, seed,
              src_audio=None):
        if target_sec is None:
            ratio = max(len(target_text), 1) / max(len(prompt_text), 1)
            target_sec = min(max(len(prompt_audio) / sr * ratio, 0.2), 30.0)
        return mb((int(target_sec * sr),)), sr

    return synth, mb.stats.snapshot, sr


def _build_maskgct_service(args):
    from amphion_tpu.serving.service import MaskGCTService
    from amphion_tpu.utils.config import load_config
    from amphion_tpu.utils.logging import get_logger
    from bins.tts.inference import build_maskgct_pipeline

    cfg = load_config(args.config)
    pipe = build_maskgct_pipeline(args, cfg, get_logger("serve"))
    svc = MaskGCTService(
        pipe, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        len_step=args.len_step, max_prompt_len=args.max_prompt_len,
        max_target_len=args.max_target_len, max_phone_len=args.max_phone_len,
    )

    def synth(prompt_audio, prompt_text, target_text, target_sec, seed,
              src_audio=None):
        target_len = (None if target_sec is None
                      else int(target_sec * pipe.semantic_rate))
        wav = svc.synthesize(prompt_audio, prompt_text, target_text,
                             target_len=target_len, seed=seed)
        return wav, pipe.sample_rate

    return synth, svc.stats, pipe.sample_rate


def _build_valle_service(args):
    """Batched zero-shot VALL-E (assembly mirrors
    `bins/tts/inference.py:valle_inference`)."""
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
    from amphion_tpu.models.tts.valle.valle import VALLE, VALLEConfig
    from amphion_tpu.runtime.checkpoint import CheckpointManager
    from amphion_tpu.serving.service import VALLEService
    from amphion_tpu.text.g2p import G2PModule
    from amphion_tpu.text.symbol_table import SymbolTable
    from amphion_tpu.utils.config import load_config
    from amphion_tpu.utils.tokenizer import AudioTokenizer

    cfg = load_config(args.config)
    p = cfg.preprocess
    symbols = SymbolTable.from_file(
        Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict)
    g2p = G2PModule(p.get("g2p_backend", "char"),
                    p.get("lexicon_path") or None)
    mc = cfg.model.get("codec", None)
    codec_cfg = CodecConfig(
        sample_rate=p.sample_rate,
        strides=tuple(mc.strides) if mc else (2, 4, 5, 6),
        num_quantizers=mc.num_quantizers if mc else 8,
        codebook_size=mc.codebook_size if mc else 1024,
        codebook_dim=mc.codebook_dim if mc else 8,
        encoder_dim=mc.get("encoder_dim", 32) if mc else 32,
        latent_dim=mc.get("latent_dim", 256) if mc else 256,
        decoder_dim=mc.get("decoder_dim", 32) if mc else 32,
    )
    codec = AmphionCodec(codec_cfg)
    if args.codec_ckpt:
        ctree, _, _ = CheckpointManager(args.codec_ckpt).restore_raw()
        codec_params = ctree["g"]["params"] if "g" in ctree else ctree["params"]
    else:
        print("WARNING: no --codec_ckpt, RANDOM codec weights (smoke only)")
        codec_params = codec.init(
            jax.random.key(0), jnp.zeros((1, codec_cfg.hop * 4)))["params"]
    tok = AudioTokenizer(codec, codec_params, p.sample_rate)

    exp_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name
    tree, _, _ = CheckpointManager(exp_dir / "checkpoint").restore_raw()
    params = tree["params"] if "params" in tree else tree
    m = cfg.model.get("valle", None)
    model = VALLE(VALLEConfig(
        num_phones=max(len(symbols) + 1, 64),
        audio_vocab=m.audio_vocab if m else 1024,
        num_quantizers=m.num_quantizers if m else 8,
        hidden=m.hidden if m else 1024,
        num_layers=m.num_layers if m else 12,
        num_heads=m.num_heads if m else 16,
        max_position=m.get("max_position", 4096) if m else 4096,
    ))
    common = dict(
        len_step=args.len_step, max_phone_len=args.max_phone_len,
        max_prompt_len=args.max_prompt_len, max_new=args.max_new,
        compute_dtype=args.compute_dtype,
    )
    if args.batcher == "continuous":
        from amphion_tpu.serving.continuous_service import (
            ValleContinuousService,
        )

        svc = ValleContinuousService(
            model, params, tok, g2p, symbols, slots=args.slots,
            chunk=args.chunk, **common)
        _PREWARM[0] = svc.prewarm
    else:
        svc = VALLEService(
            model, params, tok, g2p, symbols, max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms, **common)

    def synth(prompt_audio, prompt_text, target_text, target_sec, seed,
              src_audio=None):
        wav = svc.synthesize(prompt_audio, prompt_text, target_text,
                             seed=seed)
        return wav, p.sample_rate

    return synth, svc.stats, p.sample_rate


def _build_vevo_service(args):
    """Batched zero-shot Vevo VC (assembly reuses
    `bins/vc/inference.py:build_pipeline`; ragged AR+FM serving —
    `amphion_tpu/serving/VevoService`). Requests carry BOTH waveforms:
    ``src_wav`` (content) and ``prompt_wav`` (timbre/style reference);
    ``--vevo_mode`` picks the product (timbre = FM only, voice = AR+FM)."""
    from amphion_tpu.serving.service import VevoService
    from amphion_tpu.utils.config import load_config
    from amphion_tpu.utils.logging import get_logger
    from bins.vc.inference import build_pipeline

    cfg = load_config(args.config)
    args.content_ckpt = args.content_ckpt or ""
    args.style_ckpt = args.style_ckpt or ""
    args.vocoder_ckpt = args.vocoder_ckpt or ""
    args.hubert = False
    pipe, has_vocoder = build_pipeline(args, cfg, get_logger("serve"))
    if not has_vocoder:
        print("WARNING: no vocoder ckpt, RANDOM Vocos weights (smoke only)")
        import jax
        import jax.numpy as jnp

        pipe.params["vocoder"] = pipe.vocoder.init(
            jax.random.key(0), jnp.zeros((1, 16, cfg.preprocess.n_mel))
        )["params"]
    mode = args.vevo_mode
    if mode == "voice" and pipe.params["ar"] is None:
        raise SystemExit("--vevo_mode voice needs AR weights "
                         "(--ar_exp or --weights_dir)")
    common = dict(
        len_step=args.len_step, max_prompt_len=args.max_prompt_len,
        max_new=args.max_new, flow_matching_steps=args.fm_steps,
        fm_solver=args.fm_solver, compute_dtype=args.compute_dtype,
    )
    if args.batcher == "continuous":
        from amphion_tpu.serving.continuous_service import (
            VevoContinuousService,
        )

        svc = VevoContinuousService(
            pipe, slots=args.slots, chunk=args.chunk, **common)
        _PREWARM[0] = svc.prewarm
    else:
        svc = VevoService(
            pipe, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            **common)

    def synth(prompt_audio, prompt_text, target_text, target_sec, seed,
              src_audio=None):
        if src_audio is None:
            raise ValueError("vevo backend needs 'src_wav' in the request")
        wav = svc.synthesize(src_audio, prompt_audio, mode=mode, seed=seed)
        return wav, cfg.preprocess.sample_rate

    return synth, svc.stats, cfg.preprocess.sample_rate


def make_handler(synth_fn, stats_fn, backend_name: str,
                 input_sr: int = 24000):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/api/health":
                self._send(200, json.dumps(
                    {"status": "ok", "backend": backend_name,
                     "batching": True}).encode(), "application/json")
            elif self.path == "/api/stats":
                self._send(200, json.dumps(stats_fn()).encode(),
                           "application/json")
            elif self.path in ("/", "/index.html"):
                self._send(200, PAGE.encode(), "text/html; charset=utf-8")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/api/synthesize":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n))
                # resample inbound audio to the pipeline's configured
                # rate (NOT a hardcoded 24 kHz)
                prompt = _decode_wav_bytes(
                    base64.b64decode(req["prompt_wav"]), input_sr)
                src = (_decode_wav_bytes(
                    base64.b64decode(req["src_wav"]), input_sr)
                    if "src_wav" in req else None)
                seed = req.get("seed")
                wav, sr = synth_fn(
                    prompt, req.get("prompt_text", ""),
                    req.get("target_text", ""), req.get("target_sec"),
                    _next_seed() if seed is None else int(seed),
                    src_audio=src,
                )
                self._send(200, _encode_wav_bytes(wav, sr), "audio/wav")
            except Exception as e:
                self._send(500, str(e).encode(), "text/plain")

    return Handler


def serve(synth_fn, stats_fn, backend_name="custom", port=7860,
          host="127.0.0.1", input_sr: int = 24000) -> ThreadingHTTPServer:
    return ThreadingHTTPServer(
        (host, port), make_handler(synth_fn, stats_fn, backend_name, input_sr)
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--backend", default="maskgct",
                    choices=["maskgct", "valle", "vevo", "sine"])
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--config", help="experiment config (maskgct backend)")
    ap.add_argument("--exp_name", default="maskgct")
    ap.add_argument("--semantic_ckpt", default=None)
    ap.add_argument("--codec_ckpt", default=None)
    ap.add_argument("--weights_dir", default=None)
    ap.add_argument("--batcher", default="continuous",
                    choices=["continuous", "window"],
                    help="AR-backend dispatcher (valle/vevo): "
                         "'continuous' (default) admits requests into a "
                         "live per-slot decode at chunk boundaries — "
                         "measured 1.7-2.5x better p50 than 'window' "
                         "at every load on the same Poisson trace "
                         "(BENCHMARKS.md); 'window' is the static "
                         "micro-batcher. maskgct/sine always use the "
                         "window batcher (mask-predict does not gain "
                         "from batching — measured)")
    ap.add_argument("--slots", type=int, default=4,
                    help="continuous engine decode slots")
    ap.add_argument("--prewarm", action="store_true",
                    help="compile the bucket surface before listening "
                         "(continuous backends): avoids tens-of-seconds "
                         "first-request compile latency per new bucket")
    ap.add_argument("--chunk", type=int, default=64,
                    help="continuous engine decode chunk (steps between "
                         "admission points)")
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=50.0)
    ap.add_argument("--len_step", type=int, default=64)
    ap.add_argument("--max_prompt_len", type=int, default=512)
    ap.add_argument("--max_target_len", type=int, default=1024)
    ap.add_argument("--max_phone_len", type=int, default=512)
    ap.add_argument("--max_new", type=int, default=768,
                    help="AR decode budget (valle/vevo backends)")
    ap.add_argument("--vevo_mode", default="timbre",
                    choices=["timbre", "voice"],
                    help="vevo backend product (ref models/vc/vevo/"
                         "README.md:16-21): timbre = FM re-render, "
                         "voice = AR style rewrite + FM")
    ap.add_argument("--fm_steps", type=int, default=32)
    ap.add_argument("--fm_solver", default="euler",
                    choices=["euler", "midpoint"],
                    help="FM ODE integrator (midpoint = RK2; see BENCHMARKS.md FM frontier)")
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "int8", "int4"],
                    help="AR-decode dtype (valle/vevo backends). Measured "
                         "guidance (BENCHMARKS.md): int4/int8 win "
                         "single-stream latency; bf16 wins batched "
                         "serving (the weight stream amortizes and "
                         "dequant work scales with batch)")
    ap.add_argument("--ar_exp", default="", help="vevo AR trainer exp_name")
    ap.add_argument("--fm_exp", default="", help="vevo FM trainer exp_name")
    ap.add_argument("--content_ckpt", default="")
    ap.add_argument("--style_ckpt", default="")
    ap.add_argument("--vocoder_ckpt", default="")
    args = ap.parse_args()

    if args.batcher == "continuous" and args.backend in ("maskgct", "sine"):
        print(f"NOTE: backend '{args.backend}' has no AR decode stage; "
              "falling back to the window batcher (continuous batching "
              "applies to the valle/vevo AR backends)")
        args.batcher = "window"
    build = {"sine": _build_sine_service,
             "maskgct": _build_maskgct_service,
             "valle": _build_valle_service,
             "vevo": _build_vevo_service}[args.backend]
    synth, stats, input_sr = build(args)
    if args.prewarm and _PREWARM[0] is not None:
        print("prewarming compile surface (one admission per bucket "
              "pair + decode chunk + tails)...")
        _PREWARM[0]()
        print("prewarm done")
    httpd = serve(synth, stats, args.backend, args.port, args.host,
                  input_sr=input_sr)
    print(f"batched serving on http://{args.host}:{args.port} "
          f"(backend={args.backend}, max_batch={args.max_batch}, "
          f"max_wait={args.max_wait_ms}ms)")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
