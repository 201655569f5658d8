"""Emilia-style in-the-wild preprocessing CLI (reference:
`preprocessors/Emilia/main.py:391` + batch runner `main_multi.py`)."""

from __future__ import annotations

import argparse
import json

from amphion_tpu.data.emilia.pipeline import EmiliaPipeline
from amphion_tpu.utils.logging import get_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True,
                        help="directory of raw in-the-wild wavs")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--sample_rate", type=int, default=24000)
    parser.add_argument("--min_snr_db", type=float, default=10.0)
    parser.add_argument("--min_duration", type=float, default=1.0)
    parser.add_argument("--max_duration", type=float, default=30.0)
    parser.add_argument("--transcribe", action="store_true",
                        help="run the frozen Whisper transcriber per segment")
    parser.add_argument("--native_stages", action="store_true",
                        help="fill separation/diarization/DNSMOS slots with "
                             "the native signal-processing stages")
    parser.add_argument("--min_dnsmos", type=float, default=3.0,
                        help="quality floor when a scorer runs (ref OVRL>=3)")
    parser.add_argument("--speaker_ckpt", default="",
                        help="converted WavLM-SV ckpt dir: diarization "
                             "upgrades to neural-embedding spectral "
                             "clustering (with --native_stages)")
    args = parser.parse_args()
    logger = get_logger("emilia")

    transcriber = None
    if args.transcribe:
        from amphion_tpu.evaluation.metrics.intelligibility import (
            whisper_transcriber,
        )

        transcriber = whisper_transcriber()

    builder = (EmiliaPipeline.with_native_stages if args.native_stages
               else EmiliaPipeline)
    extra = ({"speaker_ckpt": args.speaker_ckpt}
             if args.native_stages and args.speaker_ckpt else {})
    pipe = builder(
        **extra,
        sample_rate=args.sample_rate,
        transcriber=transcriber,
        min_snr_db=args.min_snr_db,
        min_dnsmos=args.min_dnsmos if args.native_stages else 0.0,
        min_duration_s=args.min_duration,
        max_duration_s=args.max_duration,
    )
    records = pipe.process_dir(args.input_dir, args.output_dir)
    hours = sum(r["duration"] for r in records) / 3600.0
    logger.info(f"{len(records)} segments, {hours:.2f} h -> {args.output_dir}")
    print(json.dumps({"segments": len(records), "hours": round(hours, 3)}))


if __name__ == "__main__":
    main()
