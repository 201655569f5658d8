"""Speaker similarity (reference: `evaluation/metrics/similarity/` —
RawNet3 / Resemblyzer / WavLM cosine similarity).

Wraps a frozen `transformers` speaker-verification checkpoint (WavLM-family)
on the host; the embedder is injectable so tests and alternative models
(RawNet3-style) plug in the same way.
"""

from __future__ import annotations

import numpy as np

_EMBEDDER_CACHE: dict = {}


def wavlm_embedder(model_name: str = "microsoft/wavlm-base-sv"):
    if model_name in _EMBEDDER_CACHE:
        return _EMBEDDER_CACHE[model_name]
    import torch
    from transformers import AutoFeatureExtractor, WavLMForXVector

    fe = AutoFeatureExtractor.from_pretrained(model_name)
    model = WavLMForXVector.from_pretrained(model_name).eval()

    def embed(audio, sample_rate=16000) -> np.ndarray:
        if sample_rate != 16000:
            from amphion_tpu.data.audio_io import resample

            audio = resample(np.asarray(audio, np.float32), sample_rate, 16000)
        inputs = fe(audio, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            return model(**inputs).embeddings[0].numpy()

    _EMBEDDER_CACHE[model_name] = embed
    return embed


def speaker_similarity(ref, gen, sample_rate=16000, embedder=None) -> float:
    """Cosine similarity of speaker embeddings (SIM-O style)."""
    embedder = embedder or wavlm_embedder()
    e_r = embedder(ref, sample_rate)
    e_g = embedder(gen, sample_rate)
    return float(
        np.dot(e_r, e_g)
        / max(np.linalg.norm(e_r) * np.linalg.norm(e_g), 1e-12)
    )
