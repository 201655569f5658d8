"""Objective metrics CLI (reference: `bins/calc_metrics.py:45-62` +
`egs/metrics/run.sh`): compute named metrics over paired ref/gen wav dirs,
dump a JSON report. ALL 16 reference metrics dispatch offline:

- DSP metrics (f0/energy/mcd/mstft/pesq/stoi/si-sdr/si-snr): no weights.
- wer/cer: native flax Whisper (`--whisper_dir` = local HF checkpoint dir).
  Reference text comes from `--transcripts` (TSV `name<TAB>text`), else
  ASR-vs-ASR (the reference wav is transcribed too).
- speaker_similarity: any of the reference's three backends, all native
  flax — `--speaker_model wavlm_sv|rawnet3|ge2e` with `--speaker_ckpt` =
  checkpoint converted with `bins/convert_checkpoint.py --model <same>`
  (or env AMPHION_SPEAKER_CKPT + AMPHION_SPEAKER_MODEL).
- fad: corpus-level Fréchet distance over `--fad_embedder` embeddings:
  `vggish` (native flax VGGish, the reference's embedder — comparable to
  published FAD numbers; `--vggish_ckpt` = torchvggish .pth or a dir
  converted with `--model vggish`) | `mel` (native log-mel statistics,
  no weights — NOT comparable to published FAD) | `speaker` (WavLM-SV
  embeddings via --speaker_ckpt).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from amphion_tpu.data.audio_io import load_wav
from amphion_tpu.evaluation.metrics import METRIC_REGISTRY, calc_metric
from amphion_tpu.utils.logging import get_logger

_PAIR_SR_ARG = ("fpc", "f0rmse", "f0_periodicity_rmse", "v_uv_f1", "mcd",
                "mstft", "pesq", "stoi")
_PAIR_NO_SR = ("si_sdr", "si_snr", "energy_rmse", "energy_pc")
_CORPUS = ("fad",)
_ASR = ("wer", "cer")
_SPEAKER = ("speaker_similarity",)


def _mel_embedding(audio: np.ndarray, fs: int) -> np.ndarray:
    """Weight-free FAD embedding: per-band log-mel mean ‖ std (captures
    long-term spectral statistics; calibrate against a model-based FAD
    before cross-paper comparisons)."""
    import jax.numpy as jnp

    from amphion_tpu.ops.mel import MelConfig, mel_spectrogram

    cfg = MelConfig(sample_rate=fs)
    t = max(len(audio) // cfg.hop_size, 1) * cfg.hop_size
    m = np.asarray(mel_spectrogram(jnp.asarray(audio[:t])[None], cfg))[0]
    return np.concatenate([m.mean(axis=1), m.std(axis=1)])


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--ref_dir", required=True)
    parser.add_argument("--deg_dir", required=True)
    parser.add_argument("--metrics", nargs="+", required=True,
                        help=f"subset of {sorted(METRIC_REGISTRY)}")
    parser.add_argument("--fs", type=int, default=24000)
    parser.add_argument("--dump_dir", default="")
    parser.add_argument("--whisper_dir", default="",
                        help="local HF Whisper dir for wer/cer (native "
                             "flax decode)")
    parser.add_argument("--language", default="en")
    parser.add_argument("--transcripts", default="",
                        help="TSV name<TAB>text reference transcripts; "
                             "else ASR-vs-ASR")
    parser.add_argument("--speaker_ckpt", default="",
                        help="converted speaker-embedder ckpt dir for "
                             "speaker_similarity / fad=speaker")
    parser.add_argument("--speaker_model", default="wavlm_sv",
                        choices=["wavlm_sv", "rawnet3", "ge2e",
                                 "resemblyzer"],
                        help="embedder family for --speaker_ckpt (ref "
                             "similarity zoo: RawNet3/Resemblyzer/WavLM)")
    parser.add_argument("--fad_embedder", default="mel",
                        choices=["mel", "speaker", "vggish"])
    parser.add_argument("--vggish_ckpt", default="",
                        help="torchvggish .pth or converted ckpt dir for "
                             "--fad_embedder vggish (env "
                             "AMPHION_VGGISH_CKPT)")
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

    transcriber = None
    if any(m in args.metrics for m in _ASR):
        if not args.whisper_dir:
            raise SystemExit("wer/cer need --whisper_dir (local HF Whisper "
                             "checkpoint dir; runs natively in flax)")
        from amphion_tpu.evaluation.metrics.intelligibility import (
            whisper_native_transcriber,
        )

        transcriber = whisper_native_transcriber(args.whisper_dir,
                                                 language=args.language)
    texts = {}
    if args.transcripts:
        for line in Path(args.transcripts).read_text().splitlines():
            name, _, text = line.partition("\t")
            texts[name] = text
    vggish_embed = None
    if "fad" in args.metrics and args.fad_embedder == "vggish":
        import os

        from amphion_tpu.models.vggish import vggish_fad_embedder

        vggish_embed = vggish_fad_embedder(
            args.vggish_ckpt or os.environ.get("AMPHION_VGGISH_CKPT", ""))
    embedder = None
    if (any(m in args.metrics for m in _SPEAKER)
            or ("fad" in args.metrics and args.fad_embedder == "speaker")):
        from amphion_tpu.evaluation.metrics.similarity import (
            _NATIVE_EMBEDDERS,
            default_embedder,
        )

        embedder = (_NATIVE_EMBEDDERS[args.speaker_model](args.speaker_ckpt)
                    if args.speaker_ckpt else default_embedder())

    results: dict[str, list[float]] = {m: [] for m in args.metrics}
    fad_ref, fad_gen = [], []
    for ref, deg in pairs:
        r, _ = load_wav(ref, sr=args.fs)
        d, _ = load_wav(deg, sr=args.fs)
        for m in args.metrics:
            if m in _PAIR_SR_ARG:
                results[m].append(calc_metric(m, r, d, args.fs))
            elif m in _PAIR_NO_SR:
                results[m].append(calc_metric(m, r, d))
            elif m in _ASR:
                ref_text = texts.get(deg.stem) or transcriber(r, args.fs)
                hyp_text = transcriber(d, args.fs)
                results[m].append(calc_metric(m, ref_text, hyp_text))
            elif m in _SPEAKER:
                results[m].append(calc_metric(m, r, d, args.fs,
                                              embedder=embedder))
        if "fad" in args.metrics:
            if args.fad_embedder == "vggish":
                # (n_patches, 128) per clip — FAD pools ALL patches
                # across the corpus (published VGGish-FAD protocol)
                fad_ref.extend(vggish_embed(r, args.fs))
                fad_gen.extend(vggish_embed(d, args.fs))
            elif args.fad_embedder == "speaker":
                fad_ref.append(embedder(r, args.fs))
                fad_gen.append(embedder(d, args.fs))
            else:
                fad_ref.append(_mel_embedding(r, args.fs))
                fad_gen.append(_mel_embedding(d, args.fs))
    if "fad" in args.metrics:
        results["fad"].append(calc_metric("fad", np.stack(fad_ref),
                                          np.stack(fad_gen)))

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
