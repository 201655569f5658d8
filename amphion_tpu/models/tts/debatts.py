"""DebaTTS: rebuttal/debate-speech TTS.

Reference: `models/tts/debatts/` (6.5k LoC: `t2s_model.py` + `s2a_egs/` +
`t2s_egs/` with private hparam/util copies) — architecturally the same
two-stage masked-generative t2s/s2a design as MaskGCT, specialized for
expressive debate speech via (a) a debate-speech fine-tuning corpus and
(b) a prompt that includes the *opponent's* utterance as additional context.

The TPU build therefore expresses DebaTTS as configured MaskGCT stages plus
the opponent-context conditioning: the opponent's semantic tokens are
prepended to the prompt stream.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from amphion_tpu.models.tts.maskgct.maskgct import (
    MaskGCTS2A,
    MaskGCTT2S,
    S2AConfig,
    T2SConfig,
    t2s_sample,
)


@dataclass(frozen=True)
class DebaTTSConfig:
    t2s: T2SConfig = field(default_factory=T2SConfig)
    s2a: S2AConfig = field(default_factory=S2AConfig)


class DebaTTS:
    """Thin assembly: MaskGCT stages + opponent-context prompting."""

    def __init__(self, cfg: DebaTTSConfig, params: dict):
        self.cfg = cfg
        self.t2s = MaskGCTT2S(cfg.t2s)
        self.s2a = MaskGCTS2A(cfg.s2a)
        self.params = params

    def synthesize_semantic(
        self,
        opponent_semantic: jax.Array,  # (B, Lo) the utterance being rebutted
        prompt_semantic: jax.Array,  # (B, Lp) target-speaker prompt
        phone_id: jax.Array,
        target_len: int,
        rng: jax.Array,
        **kw,
    ) -> jax.Array:
        """Rebuttal prompting: [opponent context; speaker prompt] → target."""
        prompt = jnp.concatenate([opponent_semantic, prompt_semantic], axis=1)
        return t2s_sample(
            self.t2s, self.params["t2s"], prompt, phone_id, target_len, rng, **kw
        )
