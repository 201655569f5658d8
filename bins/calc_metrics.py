"""Objective metrics CLI (reference: `bins/calc_metrics.py:45-62` +
`egs/metrics/run.sh`): compute named metrics over paired ref/gen wav dirs,
dump a JSON report."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from amphion_tpu.data.audio_io import load_wav
from amphion_tpu.evaluation.metrics import METRIC_REGISTRY, calc_metric
from amphion_tpu.utils.logging import get_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ref_dir", required=True)
    parser.add_argument("--deg_dir", required=True)
    parser.add_argument("--metrics", nargs="+", required=True,
                        help=f"subset of {sorted(METRIC_REGISTRY)}")
    parser.add_argument("--fs", type=int, default=24000)
    parser.add_argument("--dump_dir", default="")
    args = parser.parse_args()
    logger = get_logger("metrics")

    ref_dir, deg_dir = Path(args.ref_dir), Path(args.deg_dir)
    pairs = []
    for deg in sorted(deg_dir.glob("*.wav")):
        ref = ref_dir / deg.name
        if ref.is_file():
            pairs.append((ref, deg))
    if not pairs:
        raise SystemExit(f"no paired wavs between {ref_dir} and {deg_dir}")
    logger.info(f"{len(pairs)} pairs")

    results: dict[str, list[float]] = {m: [] for m in args.metrics}
    for ref, deg in pairs:
        r, _ = load_wav(ref, sr=args.fs)
        d, _ = load_wav(deg, sr=args.fs)
        for m in args.metrics:
            if m in ("wer", "cer", "speaker_similarity", "fad"):
                continue  # need transcripts/embeddings; use the API directly
            results[m].append(calc_metric(m, r, d, args.fs)
                              if m not in ("si_sdr", "si_snr", "energy_rmse",
                                           "energy_pc")
                              else calc_metric(m, r, d))
    report = {
        m: {"mean": float(np.mean(v)), "std": float(np.std(v)), "n": len(v)}
        for m, v in results.items() if v
    }
    print(json.dumps(report, indent=2))
    if args.dump_dir:
        Path(args.dump_dir).mkdir(parents=True, exist_ok=True)
        with open(Path(args.dump_dir) / "metrics.json", "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
