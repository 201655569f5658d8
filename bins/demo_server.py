"""Interactive zero-shot TTS demo server (stdlib HTTP, no gradio).

TPU-native equivalent of the reference's gradio demos
(`models/tts/maskgct/gradio_demo.py:412-433`,
`models/codec/dualcodec/dualcodec/infer/valle/gradio_valle_demo.py`):
a browser page with [prompt wav upload, prompt text, target text, target
seconds] → generated audio. gradio/soundfile don't exist in this
environment, so the UI is a single built-in HTML page talking JSON +
base64-WAV to a `http.server` endpoint — same approach as the SingVisio
rebuild (`amphion_tpu/visualization/singvisio/server.py`).

Backends:
- ``--backend maskgct`` (default): the full zero-shot MaskGCT pipeline via
  `bins.tts.inference.build_maskgct_pipeline` (same flags as the CLI:
  --config/--exp_name/--semantic_ckpt/--codec_ckpt).
- ``--backend sine``: a deterministic tone generator for smoke-testing the
  server plumbing without checkpoints.

API:
  GET  /            → HTML page
  GET  /api/health  → {"status": "ok", "backend": ...}
  POST /api/synthesize
       {"prompt_wav": <base64 of a WAV file>, "prompt_text": str,
        "target_text": str, "target_sec": float|null}
       → audio/wav bytes (24 kHz mono PCM16)
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import tempfile
import wave
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>Amphion-TPU zero-shot TTS</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:640px;margin:2rem auto;padding:0 1rem}
 label{display:block;margin:.8rem 0 .2rem;font-weight:600}
 input,textarea{width:100%;box-sizing:border-box;padding:.4rem}
 button{margin-top:1rem;padding:.5rem 1.5rem;font-size:1rem}
 #status{margin-top:1rem;color:#555}
</style></head><body>
<h1>Amphion-TPU zero-shot TTS</h1>
<label>Prompt WAV (3&ndash;10 s reference speech)</label>
<input type="file" id="wav" accept=".wav,audio/wav">
<label>Prompt text (transcript of the prompt)</label>
<textarea id="ptext" rows="2"></textarea>
<label>Target text</label>
<textarea id="ttext" rows="3"></textarea>
<label>Target length in seconds (blank = proportional estimate)</label>
<input type="number" id="tsec" step="0.1" min="0">
<button id="go">Synthesize</button>
<div id="status"></div>
<audio id="out" controls style="display:none;margin-top:1rem;width:100%"></audio>
<script>
const b64 = buf => btoa(new Uint8Array(buf).reduce((s,b)=>s+String.fromCharCode(b),""));
document.getElementById("go").onclick = async () => {
  const f = document.getElementById("wav").files[0];
  const status = document.getElementById("status");
  if (!f) { status.textContent = "pick a prompt wav first"; return; }
  status.textContent = "synthesizing…";
  const body = {
    prompt_wav: b64(await f.arrayBuffer()),
    prompt_text: document.getElementById("ptext").value,
    target_text: document.getElementById("ttext").value,
    target_sec: parseFloat(document.getElementById("tsec").value) || null,
  };
  const r = await fetch("/api/synthesize", {method:"POST",
    headers:{"Content-Type":"application/json"}, body: JSON.stringify(body)});
  if (!r.ok) { status.textContent = "error: " + await r.text(); return; }
  const url = URL.createObjectURL(await r.blob());
  const out = document.getElementById("out");
  out.src = url; out.style.display = "block"; out.play();
  status.textContent = "done";
};
</script></body></html>"""


def _decode_wav_bytes(data: bytes, target_sr: int) -> np.ndarray:
    """Decode an uploaded WAV through the library loader (handles PCM16/24/
    32/float + resampling via the native Kaiser-sinc resampler)."""
    from amphion_tpu.data.audio_io import load_wav

    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        f.write(data)
        f.flush()
        audio, _ = load_wav(f.name, sr=target_sr)
    return audio


def _encode_wav_bytes(x: np.ndarray, sr: int) -> bytes:
    x = np.clip(np.asarray(x, np.float32).reshape(-1), -1.0, 1.0)
    pcm = (x * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def sine_synth(prompt_audio, prompt_text, target_text, target_sec, rng_seed=0):
    """Checkpoint-free smoke backend: a 220 Hz tone whose length follows the
    request (or the prompt/target text ratio, like the real pipeline)."""
    sr = 24000
    if target_sec is None:
        ratio = max(len(target_text), 1) / max(len(prompt_text), 1)
        target_sec = min(max(len(prompt_audio) / sr * ratio, 0.2), 30.0)
    n = int(target_sec * sr)
    t = np.arange(n, dtype=np.float32) / sr
    return 0.3 * np.sin(2 * np.pi * 220.0 * t), sr


def make_handler(synth_fn, backend_name: str, input_sr: int = 24000):
    """``synth_fn(prompt_audio_f32, prompt_text, target_text, target_sec)
    -> (wav_f32, sr)``; prompt audio arrives resampled to ``input_sr``
    (the pipeline's configured rate)."""

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
                    {"status": "ok", "backend": backend_name}).encode(),
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
                prompt = _decode_wav_bytes(
                    base64.b64decode(req["prompt_wav"]), input_sr)
                wav, sr = synth_fn(
                    prompt,
                    req.get("prompt_text", ""),
                    req.get("target_text", ""),
                    req.get("target_sec"),
                )
                self._send(200, _encode_wav_bytes(wav, sr), "audio/wav")
            except Exception as e:  # surface errors to the page
                self._send(500, str(e).encode(), "text/plain")

    return Handler


def serve(synth_fn, backend_name: str = "custom", port: int = 7860,
          host: str = "127.0.0.1", input_sr: int = 24000) -> HTTPServer:
    httpd = HTTPServer((host, port),
                       make_handler(synth_fn, backend_name, input_sr))
    return httpd


def _build_maskgct_synth(args):
    import jax

    from amphion_tpu.utils.config import load_config
    from amphion_tpu.utils.logging import get_logger
    from bins.tts.inference import build_maskgct_pipeline

    cfg = load_config(args.config)
    pipe = build_maskgct_pipeline(args, cfg, get_logger("demo"))
    _build_maskgct_synth.sample_rate = pipe.sample_rate
    seed = [0]

    def synth(prompt_audio, prompt_text, target_text, target_sec):
        target_len = (None if target_sec is None
                      else int(target_sec * pipe.semantic_rate))
        seed[0] += 1
        wav = pipe(prompt_audio, prompt_text, target_text,
                   jax.random.key(seed[0]), target_len=target_len)
        return wav, pipe.sample_rate

    return synth


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--backend", default="maskgct",
                    choices=["maskgct", "sine"])
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--config", help="experiment config (maskgct backend)")
    ap.add_argument("--exp_name", default="maskgct")
    ap.add_argument("--semantic_ckpt", default=None)
    ap.add_argument("--codec_ckpt", default=None)
    args = ap.parse_args()

    if args.backend == "sine":
        synth, input_sr = sine_synth, 24000
    else:
        synth = _build_maskgct_synth(args)
        input_sr = _build_maskgct_synth.sample_rate
    httpd = serve(synth, args.backend, args.port, args.host,
                  input_sr=input_sr)
    print(f"demo server on http://{args.host}:{args.port} "
          f"(backend={args.backend})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
