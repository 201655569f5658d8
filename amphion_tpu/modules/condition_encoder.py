"""SVC condition encoder: fuse content, melody, loudness, and singer identity.

Checkpoint-compatible with the reference
(`modules/encoder/condition_encoder.py:147` `ConditionEncoder`): each
enabled stream — whisper / contentvec / wenet / mert SSL features
(`ContentEncoder:15`, a Linear), quantized F0 + UV embeddings
(`MelodyEncoder:47`), loudness bucketized on stored exp-spaced bins
(`LoudnessEncoder:85`), singer-ID embedding (`SingerEncoder:128`) — is
mapped to a shared dimension and merged by sum ("add") or concatenation
("concat") in the reference's stream order (`forward:181`).

Not carried over: the optional torchaudio-Conformer content branch
(`use_conformer_for_content_features` — off in every shipped config).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.ops.f0 import f0_to_coarse


@dataclass(frozen=True)
class ConditionEncoderConfig:
    output_dim: int = 384
    merge_mode: str = "add"  # "add" | "concat"
    use_whisper: bool = False
    whisper_dim: int = 1024
    use_contentvec: bool = False
    contentvec_dim: int = 256
    use_wenet: bool = False
    wenet_dim: int = 512
    use_mert: bool = False
    mert_dim: int = 256
    use_f0: bool = True
    pitch_bin: int = 256
    f0_min: float = 50.0
    f0_max: float = 1100.0
    use_uv: bool = True
    use_loudness: bool = True
    loudness_bins: int = 256
    use_singer: bool = True
    num_singers: int = 512


class MelodyEncoder(nn.Module):
    """Quantized-F0 embedding (+UV embedding) (ref `:47-81`)."""

    cfg: ConditionEncoderConfig

    @nn.compact
    def __call__(self, f0, uv=None):
        c = self.cfg
        coarse = f0_to_coarse(f0, c.pitch_bin, c.f0_min, c.f0_max)
        out = nn.Embed(c.pitch_bin, c.output_dim, name="f0_embed")(coarse)
        if c.use_uv and uv is not None:
            out = out + nn.Embed(2, c.output_dim, name="uv_embed")(uv.astype(jnp.int32))
        return out


def _default_loudness_bins(n_bins: int) -> np.ndarray:
    """ref `LoudnessEncoder.__init__:100`: exp-spaced boundaries between
    loudness 1e-30 and 1.5 (n_bins - 1 of them)."""
    return np.exp(np.linspace(math.log(1e-30), math.log(1.5),
                              n_bins - 1)).astype(np.float32)


class ConditionEncoder(nn.Module):
    cfg: ConditionEncoderConfig

    @nn.compact
    def __call__(self, features: dict):
        """features keys (all optional per config): 'whisper'/'contentvec'/
        'wenet'/'mert' (B, T, D), 'f0' (B, T), 'uv' (B, T), 'loudness'
        (B, T), 'singer' (B,). Returns (B, T, output_dim) for "add" or
        (B, T, sum-of-dims) for "concat"."""
        c = self.cfg
        outputs = []

        # --- prosody streams (ref forward:181 order) ---
        if c.use_f0 and "f0" in features:
            outputs.append(
                MelodyEncoder(c, name="melody")(features["f0"], features.get("uv")))
        if c.use_loudness and "loudness" in features:
            bins = self.param(
                "energy_bins",
                lambda k: jnp.asarray(_default_loudness_bins(c.loudness_bins)))
            # torch.bucketize(right=False) == searchsorted side='right'
            ql = jnp.searchsorted(bins, features["loudness"].reshape(-1),
                                  side="right").reshape(features["loudness"].shape)
            outputs.append(
                nn.Embed(c.loudness_bins, c.output_dim, name="loudness_embed")(ql))

        # --- semantic streams ---
        for name, use in [("whisper", c.use_whisper),
                          ("contentvec", c.use_contentvec),
                          ("mert", c.use_mert),
                          ("wenet", c.use_wenet)]:
            if use and name in features:
                outputs.append(
                    nn.Dense(c.output_dim, name=f"{name}_proj")(features[name]))

        # --- speaker stream ---
        if c.use_singer and "singer" in features:
            emb = nn.Embed(c.num_singers, c.output_dim, name="singer_embed")(
                features["singer"].astype(jnp.int32))
            seq_len = outputs[-1].shape[1]
            outputs.append(jnp.broadcast_to(
                emb[:, None, :], (emb.shape[0], seq_len, emb.shape[-1])))

        if c.merge_mode == "concat":
            return jnp.concatenate(outputs, axis=-1)
        out = outputs[0]
        for o in outputs[1:]:
            out = out + o
        return out
