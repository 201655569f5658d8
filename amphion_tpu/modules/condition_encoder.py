"""SVC condition encoder: fuse content, melody, loudness, and singer identity.

Reference: `modules/encoder/condition_encoder.py:147` (`ConditionEncoder`) +
`:47` (`MelodyEncoder`): each enabled feature stream (whisper / contentvec /
wenet / mert SSL features, quantized F0 + UV, quantized loudness, singer ID)
is embedded/projected to a shared dimension and summed.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.ops.f0 import f0_to_coarse


@dataclass(frozen=True)
class ConditionEncoderConfig:
    output_dim: int = 384
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
    """Quantized-F0 embedding (+UV embedding) (ref `:47-100`)."""

    cfg: ConditionEncoderConfig

    @nn.compact
    def __call__(self, f0, uv=None):
        c = self.cfg
        coarse = f0_to_coarse(f0, c.pitch_bin, c.f0_min, c.f0_max)
        out = nn.Embed(c.pitch_bin, c.output_dim, name="f0_embed")(coarse)
        if c.use_uv and uv is not None:
            out = out + nn.Embed(2, c.output_dim, name="uv_embed")(uv.astype(jnp.int32))
        return out


class ConditionEncoder(nn.Module):
    cfg: ConditionEncoderConfig

    @nn.compact
    def __call__(self, features: dict):
        """features keys (all optional per config): 'whisper'/'contentvec'/
        'wenet'/'mert' (B, T, D), 'f0' (B, T), 'uv' (B, T), 'loudness'
        (B, T), 'singer' (B,). Returns (B, T, output_dim)."""
        c = self.cfg
        out = None

        def add(x):
            nonlocal out
            out = x if out is None else out + x

        for name, use, dim in [
            ("whisper", c.use_whisper, c.whisper_dim),
            ("contentvec", c.use_contentvec, c.contentvec_dim),
            ("wenet", c.use_wenet, c.wenet_dim),
            ("mert", c.use_mert, c.mert_dim),
        ]:
            if use and name in features:
                add(nn.Dense(c.output_dim, name=f"{name}_proj")(features[name]))
        if c.use_f0 and "f0" in features:
            add(MelodyEncoder(c, name="melody")(features["f0"], features.get("uv")))
        if c.use_loudness and "loudness" in features:
            loud = features["loudness"]
            # log-quantize loudness into bins
            ql = jnp.clip(
                (jnp.log1p(jnp.maximum(loud, 0.0) * 1000.0) / jnp.log(1001.0))
                * (c.loudness_bins - 1),
                0,
                c.loudness_bins - 1,
            ).astype(jnp.int32)
            add(nn.Embed(c.loudness_bins, c.output_dim, name="loudness_embed")(ql))
        if c.use_singer and "singer" in features:
            emb = nn.Embed(c.num_singers, c.output_dim, name="singer_embed")(
                features["singer"].astype(jnp.int32)
            )
            add(emb[:, None, :] * jnp.ones_like(out[..., :1]))
        return out
