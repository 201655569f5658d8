"""Emilia-style in-the-wild data pipeline.

Reference: `preprocessors/Emilia/main.py:35-391` — standardization → source
separation (UVR-MDX) → speaker diarization (pyannote) → VAD segmentation
(silero) → ASR (whisperX) → quality filtering (DNSMOS); batch runner
`main_multi.py`.

TPU-environment re-design with the same stage contract:
- standardization: resample to 24 kHz mono, loudness-normalize;
- separation / diarization: pluggable callables (the reference's UVR/pyannote
  checkpoints are torch models a user can wire in; a passthrough default
  keeps the pipeline runnable);
- VAD: native energy+hangover VAD (no silero dependency), producing the same
  [start, end] segment records;
- ASR: the framework's frozen Whisper wrapper;
- filtering: SNR estimate + duration/language rules (DNSMOS proxy).
Each stage writes the same JSON metadata the reference emits.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

import numpy as np

from amphion_tpu.data.audio_io import load_wav, resample, save_wav


def loudness_normalize(x: np.ndarray, target_dbfs: float = -20.0) -> np.ndarray:
    rms = np.sqrt(np.mean(x**2) + 1e-12)
    gain = 10 ** (target_dbfs / 20.0) / max(rms, 1e-8)
    return np.clip(x * gain, -1.0, 1.0).astype(np.float32)


def energy_vad(
    x: np.ndarray,
    sr: int,
    frame_ms: float = 30.0,
    threshold_db: float = -40.0,
    min_speech_s: float = 0.5,
    max_segment_s: float = 30.0,
    hangover_frames: int = 8,
) -> list[tuple[float, float]]:
    """Energy VAD with hangover; returns [(start_s, end_s)] segments."""
    frame = int(sr * frame_ms / 1000)
    n = len(x) // frame
    if n == 0:
        return []
    e = 20 * np.log10(
        np.sqrt(np.mean(x[: n * frame].reshape(n, frame) ** 2, axis=1)) + 1e-8
    )
    ref = np.percentile(e, 95)
    active = e > max(ref + threshold_db, -60.0)
    # hangover smoothing
    segs = []
    start = None
    quiet = 0
    for i, a in enumerate(active):
        if a:
            if start is None:
                start = i
            quiet = 0
        elif start is not None:
            quiet += 1
            if quiet > hangover_frames:
                segs.append((start, i - quiet))
                start, quiet = None, 0
    if start is not None:
        segs.append((start, n))
    out = []
    for s, t in segs:
        dur = (t - s) * frame / sr
        if dur < min_speech_s:
            continue
        # split long segments
        s_t = s * frame / sr
        e_t = t * frame / sr
        while e_t - s_t > max_segment_s:
            out.append((s_t, s_t + max_segment_s))
            s_t += max_segment_s
        out.append((s_t, e_t))
    return out


def estimate_snr(x: np.ndarray, sr: int, frame_ms: float = 32.0) -> float:
    """Spectral noise-floor SNR estimate.

    Noise power per frequency bin = 10th percentile of |STFT|^2 over time
    (minimum-statistics style — robust even for clips with no pauses);
    signal power = mean. Harmonic signals get a high SNR, broadband-noisy
    clips a low one. A DNSMOS-style model can replace this via the
    pipeline's pluggable slots.
    """
    frame = int(sr * frame_ms / 1000)
    n = len(x) // frame
    if n < 4:
        return 0.0
    frames = x[: n * frame].reshape(n, frame) * np.hanning(frame)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n, F)
    f_bins = spec.shape[1]
    # broadband noise floor per frame = median across frequency; harmonic
    # (speech/tone) energy pokes far above it, white noise does not
    noise_psd = np.median(spec, axis=1, keepdims=True)
    signal_p = np.maximum(spec - noise_psd, 0.0).sum(axis=1)
    noise_p = (noise_psd[:, 0] * f_bins)
    ratio = signal_p.mean() / max(noise_p.mean(), 1e-12)
    return float(np.clip(10 * np.log10(max(ratio, 1e-6)), 0.0, 60.0))


@dataclass
class EmiliaPipeline:
    sample_rate: int = 24000
    separator: Callable | None = None  # audio -> vocals (UVR slot)
    diarizer: Callable | None = None  # audio -> [(start, end, speaker)]
    transcriber: Callable | None = None  # (audio, sr) -> text
    scorer: Callable | None = None  # (audio, sr) -> quality (DNSMOS slot)
    min_snr_db: float = 10.0
    min_dnsmos: float = 0.0  # ref filters at OVRL >= 3.0 when a scorer is set
    min_duration_s: float = 1.0
    max_duration_s: float = 30.0

    @classmethod
    def with_native_stages(cls, speaker_ckpt: str = "", mdx_ckpt: str = "",
                           dnsmos_ckpt: str = "",
                           **kw) -> "EmiliaPipeline":
        """All model slots filled with native stages
        (amphion_tpu.data.emilia.stages) — runnable with zero checkpoints.
        With ``speaker_ckpt`` (a WavLM-SV checkpoint converted via
        `bins/convert_checkpoint.py --model wavlm_sv`) diarization upgrades
        to spectral clustering over neural speaker embeddings. With
        ``mdx_ckpt`` / ``dnsmos_ckpt`` (flax checkpoint dirs, or .onnx
        files ingested via `--model mdx_net|dnsmos`) the separation and
        quality-gate slots upgrade from DSP to the reference's model
        stages (UVR-MDX Conv-TDF, DNSMOS P.835 CNN)."""
        from amphion_tpu.data.emilia.stages import (dnsmos_proxy,
                                                    make_mdx_separator,
                                                    neural_diarizer,
                                                    spectral_diarizer,
                                                    spectral_gate_separator)

        sr = kw.get("sample_rate", 24000)
        if mdx_ckpt:
            kw.setdefault("separator",
                          make_mdx_separator(ckpt_dir=mdx_ckpt, sr=sr))
        else:
            kw.setdefault("separator",
                          lambda x: spectral_gate_separator(x, sr))
        if dnsmos_ckpt:
            from amphion_tpu.models.dnsmos import make_dnsmos_gate

            if dnsmos_ckpt.endswith(".onnx"):
                kw.setdefault("scorer",
                              make_dnsmos_gate(onnx_path=dnsmos_ckpt))
            else:
                kw.setdefault("scorer",
                              make_dnsmos_gate(ckpt_dir=dnsmos_ckpt))
        if speaker_ckpt:
            from amphion_tpu.evaluation.metrics.similarity import (
                native_wavlm_embedder,
            )

            emb = native_wavlm_embedder(speaker_ckpt)
            kw.setdefault(
                "diarizer", lambda x: neural_diarizer(x, sr, embedder=emb))
        else:
            kw.setdefault("diarizer", lambda x: spectral_diarizer(x, sr))
        kw.setdefault("scorer", dnsmos_proxy)
        kw.setdefault("min_dnsmos", 3.0)
        return cls(**kw)

    def process_file(self, path: str | Path, output_dir: str | Path) -> list[dict]:
        """Run all stages on one raw file → segment wavs + metadata records."""
        out = Path(output_dir)
        (out / "wavs").mkdir(parents=True, exist_ok=True)
        x, sr = load_wav(path)
        if sr != self.sample_rate:
            x = resample(x, sr, self.sample_rate)
            sr = self.sample_rate
        x = loudness_normalize(x)
        if self.separator is not None:
            x = self.separator(x)
        if self.diarizer is not None:
            turns = self.diarizer(x)
        else:
            turns = [(0.0, len(x) / sr, "spk0")]

        records = []
        stem = Path(path).stem
        idx = 0
        for t_start, t_end, speaker in turns:
            seg_audio = x[int(t_start * sr) : int(t_end * sr)]
            for v_start, v_end in energy_vad(seg_audio, sr):
                clip = seg_audio[int(v_start * sr) : int(v_end * sr)]
                dur = len(clip) / sr
                if not (self.min_duration_s <= dur <= self.max_duration_s):
                    continue
                snr = estimate_snr(clip, sr)
                if snr < self.min_snr_db:
                    continue
                quality = self.scorer(clip, sr) if self.scorer else None
                if quality is not None and quality < self.min_dnsmos:
                    continue
                uid = f"{stem}_{idx:04d}"
                idx += 1
                wav_path = out / "wavs" / f"{uid}.wav"
                save_wav(wav_path, clip, sr)
                rec = {
                    "uid": uid,
                    "path": str(wav_path),
                    "speaker": speaker,
                    "start": round(t_start + v_start, 3),
                    "end": round(t_start + v_end, 3),
                    "duration": round(dur, 3),
                    "snr_db": round(snr, 2),
                }
                if quality is not None:
                    rec["dnsmos"] = round(quality, 2)
                if self.transcriber is not None:
                    rec["text"] = self.transcriber(clip, sr)
                records.append(rec)
        with open(out / f"{stem}.json", "w") as f:
            json.dump(records, f, indent=2, ensure_ascii=False)
        return records

    def process_dir(self, input_dir: str | Path, output_dir: str | Path) -> list[dict]:
        all_records = []
        for wav in sorted(Path(input_dir).rglob("*.wav")):
            all_records.extend(self.process_file(wav, output_dir))
        return all_records
