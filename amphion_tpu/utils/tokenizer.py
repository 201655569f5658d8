"""Audio tokenizer facade (reference: `utils/tokenizer.py:18` — EnCodec
wrapper feeding VALL-E).

Uniform encode/decode over any of the framework's codecs — the VALL-E /
codec-LM trainers consume this interface instead of a specific model.
For the reference's exact token space use
`models.codec.encodec.EncodecModel` with weights ingested via
`bins/convert_checkpoint.py --model encodec` (token-exactness oracle:
tests/test_encodec.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass
class AudioTokenizer:
    """codec: AmphionCodec | DualCodec | RepCodec-like module with params."""

    codec: object
    params: dict
    sample_rate: int = 24000

    def __post_init__(self):
        import jax

        # jitted closures (unjitted apply dispatches op-by-op on TPU)
        self._encode = jax.jit(
            lambda p, x: self.codec.apply({"params": p}, x,
                                          method=type(self.codec).encode)
        )
        decode_fn = getattr(type(self.codec), "decode_codes", None) or getattr(
            type(self.codec), "decode_tokens"
        )
        self._decode = jax.jit(
            lambda p, c: self.codec.apply({"params": p}, c, method=decode_fn)
        )
        # ragged decode (per-row valid frame counts) where supported
        import inspect

        self._decode_ragged = None
        if "frame_lengths" in inspect.signature(decode_fn).parameters:
            self._decode_ragged = jax.jit(
                lambda p, c, fl: self.codec.apply(
                    {"params": p}, c, fl, method=decode_fn)
            )

    def encode(self, audio: np.ndarray) -> np.ndarray:
        """(T,) or (B, T) waveform → (B, Q, N) codes."""
        x = jnp.asarray(audio)
        if x.ndim == 1:
            x = x[None]
        codes = np.asarray(self._encode(self.params, x))
        if codes.ndim == 2:  # single-stream codecs → (B, 1, N)
            codes = codes[:, None, :]
        elif codes.ndim == 3 and codes.shape[0] != x.shape[0]:
            codes = np.transpose(codes, (1, 0, 2))  # (Q, B, N) → (B, Q, N)
        return codes

    def decode(self, codes: np.ndarray, lengths: np.ndarray | None = None
               ) -> np.ndarray:
        """(B, Q, N) codes → (B, T) waveform.

        ``lengths`` (B,): per-row valid frame counts for a padded batch —
        length-masked decode (no pad bleed into shorter rows' tails) when
        the codec supports it, else ignored."""
        c = jnp.asarray(codes)
        arg = jnp.transpose(c, (1, 0, 2)) if c.ndim == 3 else c
        if lengths is not None and self._decode_ragged is not None:
            return np.asarray(self._decode_ragged(
                self.params, arg, jnp.asarray(lengths, jnp.int32)))
        return np.asarray(self._decode(self.params, arg))
