"""Audio utility tools: silence slicing, VAD cutting, MFA prep, ASR hook.

Native counterparts of the reference's aux utilities:
- ``Slicer`` / ``slice_audio_file``  <- utils/audio_slicer.py (RMS-silence
  slicing with the same knobs: threshold dB, min_length / min_interval /
  max_sil_kept in ms, hop in ms),
- ``cut_by_vad``                     <- utils/cut_by_vad.py (stitch VAD
  segments into ~target-length utterances; accepts precomputed VAD
  [start,end] second pairs or computes them with our energy VAD),
- ``prepare_mfa_corpus``             <- utils/mfa_prepare.py (speaker-dir
  corpus layout with .lab transcripts for Montreal Forced Aligner),
- ``whisper_transcribe``             <- utils/whisper_transcription.py
  (gated on local HF weights; no network).

All I/O goes through the native loader (amphion_tpu.data.audio_io), no
soundfile/librosa.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import numpy as np

from amphion_tpu.data.audio_io import load_wav, save_wav


def frame_rms(y: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """Per-frame RMS of a 1-D signal, centered (constant padding)."""
    pad = frame_length // 2
    y = np.pad(y, (pad, pad), mode="constant")
    n = 1 + (len(y) - frame_length) // hop_length
    idx = np.arange(frame_length)[None, :] + hop_length * np.arange(n)[:, None]
    frames = y[idx]
    return np.sqrt(np.mean(frames.astype(np.float64) ** 2, axis=-1))


class Slicer:
    """RMS-silence audio slicer (ref utils/audio_slicer.py:52, same knobs).

    Scans frame RMS for silent runs; a run longer than ``min_interval`` ms
    that leaves the preceding clip at least ``min_length`` ms long becomes a
    cut. The cut lands on the minimum-RMS frame of the run; at most
    ``max_sil_kept`` ms of silence is retained on each side of a cut.
    """

    def __init__(self, sr: int, threshold: float = -40.0,
                 min_length: int = 5000, min_interval: int = 300,
                 hop_size: int = 10, max_sil_kept: int = 5000):
        if not min_length >= min_interval >= hop_size:
            raise ValueError("need min_length >= min_interval >= hop_size")
        if not max_sil_kept >= hop_size:
            raise ValueError("need max_sil_kept >= hop_size")
        self.sr = sr
        self.threshold = 10 ** (threshold / 20.0)
        self.hop = round(sr * hop_size / 1000)
        self.win = min(round(sr * min_interval / 1000), 4 * self.hop)
        self.min_length = round(min_length / hop_size)  # frames
        self.min_interval = round(min_interval / hop_size)
        self.max_sil_kept = round(max_sil_kept / hop_size)

    def slice(self, waveform: np.ndarray, return_positions: bool = False):
        """Return a list of non-silent chunks (and sample positions)."""
        mono = waveform.mean(axis=0) if waveform.ndim > 1 else waveform
        if len(mono) <= self.min_length * self.hop:
            return ([waveform], [(0, len(mono))]) if return_positions else [waveform]

        rms = frame_rms(mono, self.win, self.hop)
        silent = rms < self.threshold
        # cut ranges (frame start, frame end) whose samples get dropped
        cuts: list[tuple[int, int]] = []
        clip_start = 0
        run_start = None
        for i in range(len(silent)):
            if silent[i]:
                if run_start is None:
                    run_start = i
                continue
            if run_start is None:
                continue
            run_len = i - run_start
            leading = run_start == 0 and run_len > self.max_sil_kept
            splittable = (run_len >= self.min_interval
                          and i - clip_start >= self.min_length)
            if leading or splittable:
                lo = run_start + int(np.argmin(rms[run_start:i + 1]))
                if run_start == 0:
                    cuts.append((0, lo))
                elif run_len <= self.max_sil_kept:
                    cuts.append((lo, lo))
                else:
                    # keep <= max_sil_kept on each side of the silence
                    left = run_start + int(
                        np.argmin(rms[run_start:run_start + self.max_sil_kept + 1]))
                    right = (i - self.max_sil_kept
                             + int(np.argmin(rms[i - self.max_sil_kept:i + 1])))
                    cuts.append((min(left, lo), max(right, lo)))
                clip_start = cuts[-1][1]
            run_start = None
        # trailing silence
        if run_start is not None and len(silent) - run_start >= self.min_interval:
            end = min(len(rms), run_start + self.max_sil_kept)
            lo = run_start + int(np.argmin(rms[run_start:end + 1]))
            cuts.append((lo, len(rms) + 1))

        if not cuts:
            return ([waveform], [(0, len(mono))]) if return_positions else [waveform]

        def _take(b_frame: int, e_frame: int):
            b = b_frame * self.hop
            e = min((waveform.shape[-1]), e_frame * self.hop)
            chunk = waveform[..., b:e]
            return chunk, (b, e)

        chunks, positions = [], []
        if cuts[0][0] > 0:
            c, p = _take(0, cuts[0][0])
            chunks.append(c); positions.append(p)
        for (a, b) in zip(cuts[:-1], cuts[1:]):
            c, p = _take(a[1], b[0])
            chunks.append(c); positions.append(p)
        if cuts[-1][1] < len(rms):
            c, p = _take(cuts[-1][1], len(rms) + 1)
            chunks.append(c); positions.append(p)
        chunks = [c for c in chunks if c.shape[-1] > 0]
        positions = [p for p, c in zip(positions, chunks) if c.shape[-1] > 0]
        return (chunks, positions) if return_positions else chunks


def slice_audio_file(path: str | Path, output_dir: str | Path,
                     **slicer_kwargs) -> list[Path]:
    """Slice one file into silence-separated utterances on disk."""
    path, output_dir = Path(path), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    y, sr = load_wav(path)
    chunks = Slicer(sr=sr, **slicer_kwargs).slice(y)
    out = []
    for i, chunk in enumerate(chunks):
        p = output_dir / f"{path.stem}_{i:04d}.wav"
        save_wav(p, chunk, sr)
        out.append(p)
    return out


def cut_by_vad(input_dir: str | Path, output_dir: str | Path,
               target_len_sec: float = 30.0,
               vad_from_json: bool = True) -> list[Path]:
    """Stitch VAD speech segments into ~target-length clips (ref
    utils/cut_by_vad.py, libri-light style).

    For each audio file: use ``<stem>.json`` ``{"voice_activity": [[s,e],..]}``
    next to it when present (and ``vad_from_json``), else run the native
    energy VAD. Segments accumulate until ``target_len_sec`` then flush to
    ``<stem>_{i:04d}.wav`` under ``output_dir``.
    """
    from amphion_tpu.data.emilia.pipeline import energy_vad

    input_dir, output_dir = Path(input_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    for wav_path in sorted(input_dir.rglob("*.wav")):
        y, sr = load_wav(wav_path)
        meta = wav_path.with_suffix(".json")
        if vad_from_json and meta.exists():
            vad = json.loads(meta.read_text())["voice_activity"]
        else:
            vad = energy_vad(y, sr)
        pieces: list[np.ndarray] = []
        acc = 0.0
        idx = 0

        def _flush():
            nonlocal pieces, acc, idx
            if not pieces:
                return
            out = output_dir / f"{wav_path.stem}_{idx:04d}.wav"
            save_wav(out, np.concatenate(pieces), sr)
            written.append(out)
            pieces, acc, idx = [], 0.0, idx + 1

        for start, end in vad:
            if acc + (end - start) > target_len_sec and acc > 0:
                _flush()
            pieces.append(y[int(start * sr):int(end * sr)])
            acc += end - start
        _flush()
    return written


def prepare_mfa_corpus(metadata: list[dict] | str | Path,
                       output_dir: str | Path,
                       text_key: str = "text") -> Path:
    """Lay out a Montreal-Forced-Aligner corpus (ref utils/mfa_prepare.py).

    ``metadata`` is a list of utterance dicts (or a path to a train.json from
    the preprocessors) with keys uid/path/speaker/text. Produces
    ``output_dir/<speaker>/<uid>.{wav,lab}``.
    """
    if isinstance(metadata, (str, Path)):
        metadata = json.loads(Path(metadata).read_text())
    output_dir = Path(output_dir)
    for utt in metadata:
        speaker = str(utt.get("speaker") or utt.get("singer") or "spk0")
        uid = utt["uid"].replace("/", "_")
        spk_dir = output_dir / speaker
        spk_dir.mkdir(parents=True, exist_ok=True)
        src = Path(utt.get("path") or utt.get("wav_path"))
        dst = spk_dir / f"{uid}.wav"
        if not dst.exists():
            if src.suffix.lower() == ".wav":
                shutil.copyfile(src, dst)
            else:
                y, sr = load_wav(src)
                save_wav(dst, y, sr)
        (spk_dir / f"{uid}.lab").write_text(str(utt.get(text_key, "")).strip())
    return output_dir


def whisper_transcribe(paths: list[str | Path], model_dir: str | Path,
                       language: str | None = None,
                       batch_size: int = 4) -> list[str]:
    """Transcribe with a *local* HF Whisper checkpoint (no network).

    Ref utils/whisper_transcription.py pulls openai/whisper from the Hub;
    offline we require ``model_dir`` to contain the converted weights.
    """
    try:
        import torch
        from transformers import (WhisperForConditionalGeneration,
                                  WhisperProcessor)
    except ImportError as e:  # pragma: no cover
        raise ImportError("whisper_transcribe needs torch+transformers") from e
    model_dir = Path(model_dir)
    if not model_dir.exists():
        raise FileNotFoundError(
            f"no local whisper weights at {model_dir}; this environment has "
            "no network access — provide a converted checkpoint directory")
    processor = WhisperProcessor.from_pretrained(model_dir)
    model = WhisperForConditionalGeneration.from_pretrained(model_dir).eval()
    texts: list[str] = []
    for i in range(0, len(paths), batch_size):
        batch = []
        for p in paths[i:i + batch_size]:
            y, sr = load_wav(p, sr=16000)
            batch.append(y)
        feats = processor(batch, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            gen = model.generate(feats.input_features, language=language)
        texts.extend(t.strip() for t in
                     processor.batch_decode(gen, skip_special_tokens=True))
    return texts
