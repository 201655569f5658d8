"""Speaker similarity (reference: `evaluation/metrics/similarity/` —
RawNet3 / Resemblyzer / WavLM cosine similarity).

Default path is the NATIVE flax WavLM-SV x-vector embedder
(`models/speaker_embedder.py`, checkpoint-compatible with
microsoft/wavlm-base-(plus-)sv via `bins/convert_checkpoint.py --model
wavlm_sv`); point it at a converted checkpoint dir explicitly or through
``AMPHION_SPEAKER_CKPT``. A frozen torch `transformers` embedder remains
available as an explicit opt-in oracle.
"""

from __future__ import annotations

import os

import numpy as np

_EMBEDDER_CACHE: dict = {}


def native_wavlm_embedder(ckpt_dir: str, cfg=None):
    """(audio, sr) -> (D,) embedding from a converted WavLM-SV checkpoint,
    running the native flax model jitted on the accelerator."""
    key = ("native", ckpt_dir)
    if key in _EMBEDDER_CACHE:
        return _EMBEDDER_CACHE[key]
    import jax
    import jax.numpy as jnp

    from amphion_tpu.models.speaker_embedder import (
        WavLMForSpeakerVerification,
        WavLMSVConfig,
    )
    from amphion_tpu.runtime.checkpoint import CheckpointManager

    model = WavLMForSpeakerVerification(cfg or WavLMSVConfig())
    tree, _, _ = CheckpointManager(ckpt_dir).restore_raw()
    params = tree["params"] if "params" in tree else tree
    fwd = jax.jit(lambda au: model.apply({"params": params}, au))

    def embed(audio, sample_rate=16000) -> np.ndarray:
        audio = np.asarray(audio, np.float32)
        if sample_rate != 16000:
            from amphion_tpu.data.audio_io import resample

            audio = resample(audio, sample_rate, 16000)
        # HF Wav2Vec2FeatureExtractor(do_normalize=True) semantics
        audio = (audio - audio.mean()) / max(float(audio.std()), 1e-7)
        return np.asarray(fwd(jnp.asarray(audio)[None]))[0]

    _EMBEDDER_CACHE[key] = embed
    return embed


def rawnet3_embedder(ckpt_dir: str, cfg=None):
    """(audio, sr) -> (256,) RawNet3 embedding (ref
    `similarity/speaker_similarity.py:22-76`: 10 x 3 s crops, mean) from a
    checkpoint converted with `bins/convert_checkpoint.py --model rawnet3`."""
    key = ("rawnet3", ckpt_dir)
    if key in _EMBEDDER_CACHE:
        return _EMBEDDER_CACHE[key]
    import jax

    from amphion_tpu.models.rawnet3 import (RawNet3, RawNet3Config,
                                            embed_utterance)
    from amphion_tpu.runtime.checkpoint import CheckpointManager

    model = RawNet3(cfg or RawNet3Config())
    tree, _, _ = CheckpointManager(ckpt_dir).restore_raw()
    variables = {"params": tree["params"],
                 "batch_stats": tree["batch_stats"]}
    fwd = jax.jit(lambda au: model.apply(variables, au))

    def embed(audio, sample_rate=16000) -> np.ndarray:
        audio = np.asarray(audio, np.float32)
        if sample_rate != 16000:
            from amphion_tpu.data.audio_io import resample

            audio = resample(audio, sample_rate, 16000)
        return embed_utterance(fwd, audio)

    _EMBEDDER_CACHE[key] = embed
    return embed


def ge2e_embedder(ckpt_dir: str, cfg=None):
    """(audio, sr) -> (256,) Resemblyzer-family GE2E d-vector from a
    checkpoint converted with `bins/convert_checkpoint.py --model ge2e`."""
    key = ("ge2e", ckpt_dir)
    if key in _EMBEDDER_CACHE:
        return _EMBEDDER_CACHE[key]
    import jax

    from amphion_tpu.models.ge2e import (GE2EConfig, GE2EEncoder,
                                         embed_utterance, normalize_volume)
    from amphion_tpu.runtime.checkpoint import CheckpointManager

    config = cfg or GE2EConfig()
    model = GE2EEncoder(config)
    tree, _, _ = CheckpointManager(ckpt_dir).restore_raw()
    params = tree["params"] if "params" in tree else tree
    fwd = jax.jit(lambda m: model.apply({"params": params}, m))

    def embed(audio, sample_rate=16000) -> np.ndarray:
        audio = np.asarray(audio, np.float32)
        if sample_rate != config.sample_rate:
            from amphion_tpu.data.audio_io import resample

            audio = resample(audio, sample_rate, config.sample_rate)
        return embed_utterance(fwd, normalize_volume(audio), config)

    _EMBEDDER_CACHE[key] = embed
    return embed


def wavlm_embedder(model_name: str = "microsoft/wavlm-base-sv"):
    """Torch oracle embedder (explicit opt-in; needs the HF checkpoint)."""
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


_NATIVE_EMBEDDERS = {
    "wavlm_sv": lambda ckpt: native_wavlm_embedder(ckpt),
    "rawnet3": lambda ckpt: rawnet3_embedder(ckpt),
    "ge2e": lambda ckpt: ge2e_embedder(ckpt),
    "resemblyzer": lambda ckpt: ge2e_embedder(ckpt),  # reference alias
}


def default_embedder():
    """Native embedder from ``AMPHION_SPEAKER_CKPT`` (a converted
    checkpoint dir); model family from ``AMPHION_SPEAKER_MODEL``
    (wavlm_sv | rawnet3 | ge2e/resemblyzer, default wavlm_sv). Raises
    with guidance if unset."""
    ckpt = os.environ.get("AMPHION_SPEAKER_CKPT", "")
    if not ckpt:
        raise RuntimeError(
            "speaker similarity needs an embedder: pass embedder=..., set "
            "AMPHION_SPEAKER_CKPT to a checkpoint converted with "
            "`bins/convert_checkpoint.py --model "
            "{wavlm_sv|rawnet3|ge2e}` (+ AMPHION_SPEAKER_MODEL), or use "
            "wavlm_embedder() for the torch oracle")
    family = os.environ.get("AMPHION_SPEAKER_MODEL", "wavlm_sv")
    if family not in _NATIVE_EMBEDDERS:
        raise ValueError(f"unknown AMPHION_SPEAKER_MODEL={family!r}; "
                         f"one of {sorted(_NATIVE_EMBEDDERS)}")
    return _NATIVE_EMBEDDERS[family](ckpt)


def speaker_similarity(ref, gen, sample_rate=16000, embedder=None) -> float:
    """Cosine similarity of speaker embeddings (SIM-O style)."""
    embedder = embedder or default_embedder()
    e_r = embedder(ref, sample_rate)
    e_g = embedder(gen, sample_rate)
    return float(
        np.dot(e_r, e_g)
        / max(np.linalg.norm(e_r) * np.linalg.norm(e_g), 1e-12)
    )
