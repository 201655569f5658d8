"""TransformerSVC: plain transformer encoder → mel regression SVC,
checkpoint-compatible with the reference
(`models/svc/transformer/transformer.py:12` — interleaved sinusoidal PE,
stock torch TransformerEncoderLayer stack at d_model = condition dim with
the torch-default 2048 FFN, output Linear; composed with the
ConditionEncoder in `transformer_trainer.py:23-30`), trained with masked
L1/MSE (`models/svc/base/svc_trainer.py:202`).
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
from amphion_tpu.modules.transformer import (
    TorchEncoderLayer,
    sinusoidal_positions,
)


@dataclass(frozen=True)
class TransformerSVCConfig:
    n_mel: int = 100
    hidden: int = 384  # must equal condition.output_dim (ref d_model)
    num_layers: int = 6
    num_heads: int = 4
    ffn_hidden: int = 2048  # torch TransformerEncoderLayer default
    condition: ConditionEncoderConfig = field(
        default_factory=lambda: ConditionEncoderConfig(output_dim=384)
    )


class TransformerSVC(nn.Module):
    cfg: TransformerSVCConfig

    @nn.compact
    def __call__(self, features: dict, mask=None):
        c = self.cfg
        x = ConditionEncoder(c.condition, name="condition")(features)
        x = x + jnp.asarray(sinusoidal_positions(x.shape[1], c.hidden))[None]
        for i in range(c.num_layers):
            x = TorchEncoderLayer(c.hidden, c.num_heads, c.ffn_hidden,
                                  name=f"layer_{i}")(x, mask)
        return nn.Dense(c.n_mel, name="mel_out")(x)


def transformer_svc_loss(pred, target, mask):
    """Masked L1 + MSE (ref `svc_trainer.py:202`)."""
    w = mask[..., None]
    denom = jnp.maximum(jnp.sum(w) * target.shape[-1], 1.0)
    l1 = jnp.sum(jnp.abs(pred - target) * w) / denom
    mse = jnp.sum(((pred - target) ** 2) * w) / denom
    return l1 + mse, {"l1": l1, "mse": mse}
