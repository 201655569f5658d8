"""Intelligibility metrics: WER/CER (reference: `evaluation/metrics/
intelligibility/` — Whisper transcription + edit distance).

The edit distance is native; transcription wraps a frozen `transformers`
Whisper checkpoint on the host (same approach as the reference's torch
Whisper), injectable for tests.
"""

from __future__ import annotations

import numpy as np


def edit_distance(ref: list, hyp: list) -> int:
    """Levenshtein distance over token lists."""
    m, n = len(ref), len(hyp)
    dp = np.arange(n + 1)
    for i in range(1, m + 1):
        prev = dp.copy()
        dp[0] = i
        for j in range(1, n + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1, prev[j - 1] + cost)
    return int(dp[n])


def _normalize(text: str) -> str:
    import re

    text = text.lower()
    text = re.sub(r"[^\w\s']", "", text)
    return re.sub(r"\s+", " ", text).strip()


def word_error_rate(ref_text: str, hyp_text: str | None = None, *,
                    audio=None, sample_rate=16000, transcriber=None) -> float:
    """WER between reference text and hypothesis (or transcribed audio)."""
    if hyp_text is None:
        assert audio is not None
        transcriber = transcriber or whisper_transcriber()
        hyp_text = transcriber(audio, sample_rate)
    r = _normalize(ref_text).split()
    h = _normalize(hyp_text).split()
    if not r:
        return 0.0 if not h else 1.0
    return edit_distance(r, h) / len(r)


def character_error_rate(ref_text: str, hyp_text: str | None = None, *,
                         audio=None, sample_rate=16000, transcriber=None) -> float:
    if hyp_text is None:
        assert audio is not None
        transcriber = transcriber or whisper_transcriber()
        hyp_text = transcriber(audio, sample_rate)
    r = list(_normalize(ref_text).replace(" ", ""))
    h = list(_normalize(hyp_text).replace(" ", ""))
    if not r:
        return 0.0 if not h else 1.0
    return edit_distance(r, h) / len(r)


_WHISPER_CACHE: dict = {}


def whisper_native_transcriber(model_dir: str, language: str = "en"):
    """(audio, sr) -> text from a LOCAL HF Whisper checkpoint dir, running
    our flax encoder + decoder jitted on the accelerator
    (`models/whisper_asr.py`) — no torch, no network."""
    key = ("native", model_dir, language)
    if key not in _WHISPER_CACHE:
        from amphion_tpu.models.whisper_asr import (
            whisper_native_transcriber as build,
        )

        _WHISPER_CACHE[key] = build(model_dir, language=language)
    return _WHISPER_CACHE[key]


def whisper_transcriber(model_name: str = "openai/whisper-base"):
    """Build a (audio, sr) -> text callable from a frozen Whisper checkpoint."""
    if model_name in _WHISPER_CACHE:
        return _WHISPER_CACHE[model_name]
    import torch
    from transformers import WhisperForConditionalGeneration, WhisperProcessor

    processor = WhisperProcessor.from_pretrained(model_name)
    model = WhisperForConditionalGeneration.from_pretrained(model_name).eval()

    def transcribe(audio, sample_rate=16000) -> str:
        if sample_rate != 16000:
            from amphion_tpu.data.audio_io import resample

            audio = resample(np.asarray(audio, np.float32), sample_rate, 16000)
        inputs = processor(audio, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            ids = model.generate(inputs.input_features, max_new_tokens=200)
        return processor.batch_decode(ids, skip_special_tokens=True)[0]

    _WHISPER_CACHE[model_name] = transcribe
    return transcribe
