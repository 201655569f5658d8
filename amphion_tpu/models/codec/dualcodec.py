"""DualCodec: dual-stream low-frame-rate codec with semantic distillation.

Reference: `models/codec/dualcodec/` (vendored pip package, 16k LoC with its
own Hydra config/trainer) — operating points 12.5 Hz (<=8 RVQ, 16384/4096)
and 25 Hz (<=12 RVQ) at 24 kHz, first stream distilled toward w2v-bert
semantic features (`dualcodec/model_codec/`). The TPU re-design keeps the
capability: a SEANet encoder at very low frame rate whose FIRST RVQ layer is
trained to be predictable from SSL semantic features (distillation loss),
the remaining layers capturing acoustics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.models.codec.amphion_codec import CodecConfig, CodecDecoder, CodecEncoder
from amphion_tpu.modules.quantize import FactorizedVectorQuantize, ResidualVQ


@dataclass(frozen=True)
class DualCodecConfig:
    codec: CodecConfig = field(
        default_factory=lambda: CodecConfig(
            sample_rate=24000, strides=(4, 5, 6, 8),  # hop 960 → 25 Hz
            num_quantizers=12, codebook_size=16384, codebook_dim=16,
        )
    )
    semantic_dim: int = 1024  # w2v-bert feature dim
    semantic_codebook_size: int = 16384
    distill_weight: float = 1.0


class DualCodec(nn.Module):
    cfg: DualCodecConfig

    def setup(self):
        c = self.cfg
        self.encoder = CodecEncoder(c.codec)
        self.decoder = CodecDecoder(c.codec)
        d = c.codec.latent_dim
        # stream 1: semantic quantizer (single FVQ codebook)
        self.q_semantic = FactorizedVectorQuantize(
            c.semantic_codebook_size, c.codec.codebook_dim, d, name="q_semantic"
        )
        # stream 2: residual acoustic quantizers
        self.q_acoustic = ResidualVQ(
            num_quantizers=c.codec.num_quantizers - 1,
            codebook_size=c.codec.codebook_size,
            codebook_dim=c.codec.codebook_dim,
            input_dim=d, name="q_acoustic",
        )
        self.sem_predict = nn.Dense(c.semantic_dim)

    def __call__(self, audio, semantic_feats=None, rng=None, train=False):
        """audio (B, T); semantic_feats (B, N, semantic_dim) frame-aligned.

        Returns (recon, (sem_tokens, acoustic_tokens), losses)."""
        c = self.cfg
        h = self.encoder(audio)
        z_sem, sem_tokens, l_sem = self.q_semantic(h)
        z_ac, ac_tokens, l_ac = self.q_acoustic(
            h - jax.lax.stop_gradient(z_sem), train=train, rng=rng
        )
        recon = self.decoder(z_sem + z_ac)
        losses = {f"sem_{k}": v for k, v in l_sem.items()}
        losses.update({f"ac_{k}": v for k, v in l_ac.items()})
        if semantic_feats is not None:
            pred = self.sem_predict(z_sem)
            n = min(pred.shape[1], semantic_feats.shape[1])
            losses["distill"] = c.distill_weight * jnp.mean(
                (pred[:, :n] - semantic_feats[:, :n]) ** 2
            )
        return recon, (sem_tokens, ac_tokens), losses

    def encode(self, audio):
        h = self.encoder(audio)
        z_sem, sem_tokens, _ = self.q_semantic(h)
        _, ac_tokens, _ = self.q_acoustic(h - z_sem)
        return sem_tokens, ac_tokens

    def decode_tokens(self, sem_tokens, ac_tokens=None):
        z = self.q_semantic.decode(sem_tokens)
        if ac_tokens is not None:
            z = z + self.q_acoustic.decode(ac_tokens)
        return self.decoder(z)
