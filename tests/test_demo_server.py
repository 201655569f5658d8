"""Demo server (stdlib-HTTP equivalent of the reference gradio demos,
`models/tts/maskgct/gradio_demo.py:412-433`): HTTP round-trip with the
checkpoint-free sine backend."""

from __future__ import annotations

import base64
import io
import json
import threading
import urllib.request
import wave

import numpy as np

from bins.demo_server import serve, sine_synth, _encode_wav_bytes


def _tiny_wav_bytes(sr=24000, sec=0.25):
    t = np.arange(int(sr * sec), dtype=np.float32) / sr
    return _encode_wav_bytes(0.5 * np.sin(2 * np.pi * 110.0 * t), sr)


def test_demo_server_roundtrip():
    httpd = serve(sine_synth, "sine", port=0)  # port 0 = ephemeral
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        # health
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/health"
        ) as r:
            assert json.load(r)["backend"] == "sine"
        # page
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert b"Amphion-TPU" in r.read()
        # synthesize
        body = json.dumps({
            "prompt_wav": base64.b64encode(_tiny_wav_bytes()).decode(),
            "prompt_text": "hello",
            "target_text": "hello world, longer text",
            "target_sec": 0.5,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/synthesize", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            with wave.open(io.BytesIO(r.read())) as w:
                assert w.getframerate() == 24000
                assert w.getnframes() == 12000  # 0.5 s honored
        # malformed request → 500 with the error text, not a hang
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/synthesize", data=b"{}",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad)
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        httpd.shutdown()


def test_sine_synth_proportional_length():
    sr = 24000
    prompt = np.zeros(sr)  # 1 s prompt
    wav, out_sr = sine_synth(prompt, "ab", "abcd", None)  # 2x text ratio
    assert out_sr == sr and abs(len(wav) / sr - 2.0) < 0.01
