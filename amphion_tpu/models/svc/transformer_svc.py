"""TransformerSVC: plain transformer encoder → mel regression SVC.

Reference: `models/svc/transformer/` — condition encoder features through a
transformer encoder to mel, trained with masked L1/MSE
(`models/svc/base/svc_trainer.py:202`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.condition_encoder import (
    ConditionEncoder,
    ConditionEncoderConfig,
)
from amphion_tpu.modules.transformer import TransformerEncoder


@dataclass(frozen=True)
class TransformerSVCConfig:
    n_mel: int = 100
    hidden: int = 384
    num_layers: int = 6
    num_heads: int = 4
    ffn_hidden: int = 1536
    condition: ConditionEncoderConfig = field(
        default_factory=lambda: ConditionEncoderConfig(output_dim=384)
    )


class TransformerSVC(nn.Module):
    cfg: TransformerSVCConfig

    @nn.compact
    def __call__(self, features: dict, mask=None):
        c = self.cfg
        x = ConditionEncoder(c.condition, name="condition")(features)
        x = TransformerEncoder(
            c.hidden, c.num_heads, c.num_layers, c.ffn_hidden,
            window_size=None, name="encoder",
        )(x, mask)
        return nn.Dense(c.n_mel, name="mel_out")(x)


def transformer_svc_loss(pred, target, mask):
    """Masked L1 + MSE (ref `svc_trainer.py:202`)."""
    w = mask[..., None]
    denom = jnp.maximum(jnp.sum(w) * target.shape[-1], 1.0)
    l1 = jnp.sum(jnp.abs(pred - target) * w) / denom
    mse = jnp.sum(((pred - target) ** 2) * w) / denom
    return l1 + mse, {"l1": l1, "mse": mse}
