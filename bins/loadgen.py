"""HTTP load generator for the serving stack (`bins/serve.py`).

Open-loop Poisson arrivals against a live server: each request POSTs a
synthetic WAV payload to ``/api/synthesize`` and the tool reports
end-to-end (client-observed) latency percentiles + achieved throughput,
plus the server's own ``/api/stats`` snapshot. Used to produce the
continuous-vs-window tables in `docs/serving.md` (drive the SAME
``--seed`` trace against a server started with each ``--batcher``).

    python -m bins.serve --backend vevo --batcher continuous ... &
    python -m bins.loadgen --url http://127.0.0.1:7860 --mode vevo \
        --qps 1.0 --n 100 --seed 0

Prints ONE JSON line with the results (the `bench.py` convention).

The reference has no serving layer (closest: one-shot
`models/vc/vevo/vevo_utils.py:403`); this is our-bar tooling.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import urllib.request
import wave

import numpy as np


def _wav_b64(audio: np.ndarray, sr: int) -> str:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(audio, -1, 1) * 32767)
                      .astype(np.int16).tobytes())
    return base64.b64encode(buf.getvalue()).decode()


def _synthetic(seed: int, seconds: float, sr: int) -> np.ndarray:
    """Speech-band test signal: harmonic tone + noise floor (length
    varies with seed so requests exercise different length buckets)."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n, dtype=np.float32) / sr
    f0 = 120.0 + 40.0 * rng.random()
    sig = sum(0.2 / k * np.sin(2 * np.pi * k * f0 * t) for k in (1, 2, 3))
    return (sig + 0.02 * rng.standard_normal(n)).astype(np.float32)


def make_request_factory(mode: str, sr: int, seed: int,
                         min_sec: float, max_sec: float,
                         grid_s: float = 0.5):
    """(i) -> JSON payload; request lengths drawn uniformly per index
    (real workloads are length-skewed — same convention as the
    `continuous` bench). Deterministic PER INDEX (so two servers can be
    driven with byte-identical request streams) and quantized to a
    ``grid_s`` length grid (matching the serving front end's
    audio-grid padding — bounded extractor compile surface)."""

    def make(i: int) -> dict:
        r = np.random.default_rng((seed << 20) ^ (i + 1))
        sec = float(r.uniform(min_sec, max_sec))
        if grid_s > 0:
            sec = min_sec + round((sec - min_sec) / grid_s) * grid_s
        if mode == "vevo":
            return {"prompt_wav": _wav_b64(_synthetic(1000 + seed, 2.0, sr), sr),
                    "src_wav": _wav_b64(_synthetic(i, sec, sr), sr),
                    "seed": i}
        # tts modes (maskgct / valle / sine)
        return {"prompt_wav": _wav_b64(_synthetic(i, 2.0, sr), sr),
                "prompt_text": "load test prompt",
                "target_text": "load test target " * max(1, int(sec)),
                "target_sec": sec, "seed": i}

    return make


def main():
    from amphion_tpu.serving.loadgen import (
        http_synthesize_submit,
        poisson_arrivals,
        run_trace,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--url", default="http://127.0.0.1:7860")
    ap.add_argument("--mode", default="vevo",
                    choices=["vevo", "tts"],
                    help="payload schema: vevo (src+prompt wav) or tts "
                         "(prompt wav + texts)")
    ap.add_argument("--qps", type=float, default=1.0)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0,
                    help="arrival-trace + payload seed (reuse across "
                         "servers for same-trace comparisons)")
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--min_sec", type=float, default=2.0)
    ap.add_argument("--max_sec", type=float, default=8.0)
    ap.add_argument("--timeout_s", type=float, default=600.0)
    args = ap.parse_args()

    submit = http_synthesize_submit(args.url, timeout_s=args.timeout_s)
    make = make_request_factory(args.mode, args.sr, args.seed,
                                args.min_sec, args.max_sec)
    arrivals = poisson_arrivals(args.qps, args.n, seed=args.seed)
    print(f"# firing {args.n} requests at ~{args.qps} qps "
          f"({arrivals[-1]:.1f}s trace) against {args.url}",
          file=sys.stderr)
    res = run_trace(submit, make, arrivals,
                    drain_timeout_s=args.timeout_s)
    row = res.row()
    try:
        with urllib.request.urlopen(
                args.url.rstrip("/") + "/api/stats", timeout=10) as r:
            row["server_stats"] = json.loads(r.read())
    except Exception as e:  # stats endpoint is best-effort
        row["server_stats_error"] = str(e)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
