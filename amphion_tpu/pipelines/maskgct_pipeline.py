"""MaskGCT zero-shot TTS pipeline: text + 3-second prompt → 24 kHz speech.

Assembly equivalent of the reference pipeline (reference:
`models/tts/maskgct/maskgct_utils.py:75` `MaskGCT_Inference_Pipeline` +
entry `maskgct_inference.py:11-90`): semantic model (w2v-bert-2.0) →
semantic codec (RepCodec) → T2S → S2A → acoustic codec decode. Components
take explicit params pytrees — load from orbax checkpoints trained here or
from converted torch safetensors (`amphion_tpu/utils/convert.py`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
from amphion_tpu.models.codec.repcodec import RepCodec, RepCodecConfig
from amphion_tpu.models.tts.maskgct.maskgct import (
    MaskGCTS2A,
    MaskGCTT2S,
    S2AConfig,
    T2SConfig,
    s2a_sample,
    t2s_sample,
)
from amphion_tpu.text.g2p import G2PModule
from amphion_tpu.text.symbol_table import SymbolTable


@dataclass
class MaskGCTPipeline:
    t2s: MaskGCTT2S
    s2a: MaskGCTS2A
    semantic_codec: RepCodec
    acoustic_codec: AmphionCodec
    params: dict  # {"t2s","s2a","semantic_codec","acoustic_codec"}
    semantic_extractor: object = None  # (audio, sr) -> (T, D) w2v-bert feats
    g2p: G2PModule = field(default_factory=lambda: G2PModule("char"))
    symbol_table: SymbolTable | None = None
    sample_rate: int = 24000
    semantic_rate: int = 50  # Hz

    @classmethod
    def build(cls, t2s_cfg: T2SConfig, s2a_cfg: S2AConfig,
              sem_cfg: RepCodecConfig, ac_cfg: CodecConfig, params: dict, **kw):
        return cls(
            t2s=MaskGCTT2S(t2s_cfg), s2a=MaskGCTS2A(s2a_cfg),
            semantic_codec=RepCodec(sem_cfg), acoustic_codec=AmphionCodec(ac_cfg),
            params=params, **kw,
        )

    # -- component wrappers (ref maskgct_utils.py:111-235) -------------------

    def extract_semantic_code(self, audio: np.ndarray) -> jax.Array:
        feats = self.semantic_extractor(audio, self.sample_rate)
        return self.semantic_codec.apply(
            {"params": self.params["semantic_codec"]},
            jnp.asarray(feats)[None], method=RepCodec.encode,
        )

    def extract_acoustic_code(self, audio: np.ndarray) -> jax.Array:
        return self.acoustic_codec.apply(
            {"params": self.params["acoustic_codec"]},
            jnp.asarray(audio)[None], method=AmphionCodec.encode,
        )

    def text2semantic(self, prompt_semantic, phone_ids, target_len, rng,
                      n_steps=25, cfg=2.5, schedule="sin"):
        """`n_steps`/`schedule` trade latency for refinement quality — see
        the measured T2S frontier in BENCHMARKS.md (16 steps ≈ 1.38× RTF
        for ~1 point of 50-step agreement; the step count is config in the
        reference too, maskgct_t2s.py:226)."""
        return t2s_sample(
            self.t2s, self.params["t2s"], prompt_semantic,
            jnp.asarray(phone_ids)[None], target_len, rng, n_steps=n_steps,
            cfg=cfg, schedule=schedule,
        )

    def semantic2acoustic(self, semantic_tokens, prompt_acoustic, rng,
                          prompt_semantic=None, first_layer_steps=16):
        """semantic_tokens: generated target ids (B, T). With
        ``prompt_semantic`` the S2A conditions on the full token stream
        through its cond_emb (the reference path, maskgct_utils.py:188 —
        cond = s2a.cond_emb(prompt ++ target)); otherwise it falls back to
        the semantic codec's quantized latents with zero prompt frames.

        Conditioning must match how the restored S2A was trained: a model
        trained on float semantic latents (the mel-proxy path) has no
        `cond_emb` parameters, so token conditioning is only used when the
        checkpoint actually contains it."""
        lp = prompt_acoustic.shape[2]
        target_len = semantic_tokens.shape[1]
        token_cond = prompt_semantic is not None and "cond_emb" in self.params["s2a"]
        if token_cond:
            sem_full = jnp.concatenate(
                [prompt_semantic[:, :lp], semantic_tokens], axis=1
            ).astype(jnp.int32)
        else:
            tok_full = (
                jnp.concatenate([prompt_semantic[:, :lp], semantic_tokens], axis=1)
                if prompt_semantic is not None
                else semantic_tokens
            )
            sem_latent = self.semantic_codec.apply(
                {"params": self.params["semantic_codec"]}, tok_full,
                method=RepCodec.decode_tokens,
            )
            if prompt_semantic is None:
                pad = jnp.zeros((sem_latent.shape[0], lp, sem_latent.shape[2]))
                sem_latent = jnp.concatenate([pad, sem_latent], axis=1)
            sem_full = sem_latent
        codes = s2a_sample(
            self.s2a, self.params["s2a"], sem_full, prompt_acoustic,
            target_len, rng, first_layer_steps=first_layer_steps,
        )
        return codes

    def codec_decode(self, codes) -> np.ndarray:
        # (B, Q, T) → (Q, B, T) for the RVQ decoder
        wav = self.acoustic_codec.apply(
            {"params": self.params["acoustic_codec"]},
            jnp.transpose(codes, (1, 0, 2)), method=AmphionCodec.decode_codes,
        )
        return np.asarray(wav)[0]

    # -- full pipeline (ref maskgct_utils.py:237-330) ------------------------

    def __call__(self, prompt_audio: np.ndarray, prompt_text: str,
                 target_text: str, rng: jax.Array,
                 target_len: int | None = None) -> np.ndarray:
        assert self.semantic_extractor is not None, "wire a w2v-bert extractor"
        if self.symbol_table is None:
            self.symbol_table = self.g2p.build_symbol_table(
                [prompt_text, target_text]
            )
        phones_prompt = self.g2p.to_ids(prompt_text, self.symbol_table)
        phones_target = self.g2p.to_ids(target_text, self.symbol_table)
        phone_ids = phones_prompt + phones_target

        prompt_semantic = self.extract_semantic_code(prompt_audio)
        prompt_acoustic = jnp.transpose(
            self.extract_acoustic_code(prompt_audio), (1, 0, 2)
        )  # (B, Q, T)
        if target_len is None:
            # proportional length estimate (ref: duration from text ratio)
            ratio = max(len(phones_target), 1) / max(len(phones_prompt), 1)
            target_len = int(prompt_semantic.shape[1] * ratio) + 1

        r1, r2 = jax.random.split(rng)
        semantic = self.text2semantic(
            prompt_semantic, phone_ids, target_len, r1
        )
        codes = self.semantic2acoustic(
            semantic, prompt_acoustic, r2, prompt_semantic=prompt_semantic
        )
        return self.codec_decode(codes)
