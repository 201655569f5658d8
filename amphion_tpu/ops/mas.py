"""Monotonic Alignment Search — on-device, batched.

The reference's only native kernel: a Cython Viterbi max-path DP over the
(text x mel) lattice with a CPU round-trip every VITS training step
(reference: `modules/monotonic_align/core.pyx:38-45`, numpy<->torch wrapper
`modules/monotonic_align/__init__.py:8-24`). The TPU-native version keeps the
whole DP on device as a `lax.scan` over mel frames: each scan step is a
vectorized O(T_text) column update (max of stay/advance), and the backtrack is
a reverse scan recovering the hard alignment as a one-hot matrix. No host
transfer, fully batched; used under stop_gradient like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e9


@jax.jit
def maximum_path(value: jax.Array, mask: jax.Array) -> jax.Array:
    """Monotonic max-path through a similarity lattice.

    Args:
        value: (B, T_text, T_mel) log-likelihood lattice.
        mask: (B, T_text, T_mel) valid-region mask (outer product of text and
            mel padding masks).
    Returns:
        path: (B, T_text, T_mel) one-hot alignment (float), zero in padding.
    """
    b, t_text, t_mel = value.shape
    value = jnp.where(mask > 0, value, _NEG)
    text_idx = jnp.arange(t_text)
    text_len = jnp.maximum(jnp.sum(mask[:, :, 0] > 0, axis=1).astype(jnp.int32), 1)
    mel_len = jnp.maximum(jnp.sum(mask[:, 0, :] > 0, axis=1).astype(jnp.int32), 1)

    # ---- forward DP over mel frames 1..T-1 ----
    # q_t[j] = value[j, t] + max(q_{t-1}[j], q_{t-1}[j-1])
    q_init = jnp.where(text_idx[None, :] == 0, value[:, :, 0], _NEG)

    def fwd(q, v_t):
        q_prev = jnp.concatenate([jnp.full_like(q[:, :1], _NEG), q[:, :-1]], axis=1)
        stay = q >= q_prev  # best predecessor keeps the same text index
        return v_t + jnp.maximum(q, q_prev), stay

    _, stay_tb = jax.lax.scan(
        fwd, q_init, jnp.moveaxis(value[:, :, 1:], 2, 0)
    )  # stay_tb: (T_mel-1, B, T_text) for frames t = 1..T_mel-1

    # ---- backtrack from (text_len-1, mel_len-1) ----
    def bwd(j, inp):
        stay_t, t = inp  # stay for frame t; t runs T_mel-1 .. 1
        in_range = (t >= 1) & (t <= mel_len - 1)
        stay_here = jnp.take_along_axis(stay_t, j[:, None], axis=1)[:, 0]
        j_next = jnp.where(in_range & ~stay_here, jnp.maximum(j - 1, 0), j)
        rec = jnp.where(t <= mel_len - 1, j, -1)
        return j_next, rec

    ts = jnp.arange(t_mel - 1, 0, -1)
    stay_rev = jnp.flip(stay_tb, axis=0)  # frames T-1 .. 1
    j0 = text_len - 1
    j_last, recs = jax.lax.scan(bwd, j0, (stay_rev, ts))
    # recs[i] is the alignment at frame t = T_mel-1-i; frame 0 aligns to j_last
    j_path = jnp.concatenate([j_last[None], jnp.flip(recs, axis=0)], axis=0).T

    path = (text_idx[None, :, None] == j_path[:, None, :]).astype(value.dtype)
    return path * (mask > 0)
