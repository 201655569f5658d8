"""Ragged-batch packing utilities for serving (shared by NAR and AR paths).

Static-shape TPU programs can serve a batch of requests with different
lengths by packing each sample's segments into a shared buffer with
per-sample gather index maps — no ragged shapes inside jit, no
per-request programs. Two layouts:

- `pack_segments` (left-aligned): ``[seg0_i | seg1_i | … | pad]`` — exact
  RoPE positions for encoder/NAR models whose single-request runs start at
  position 0 (MaskGCT mask-predict, ragged_sampling.py).
- `pack_segments_right` (right-aligned): ``[pad | seg0_i | seg1_i | …]``
  — every sample ENDS at the same position, so an AR decode loop can
  append at one shared scalar ``cache_index`` for the whole batch. Exact
  for rotary-position models: RoPE attention scores depend only on the
  relative distance m−n, so a uniform per-sample shift changes nothing
  (the pad prefix is masked via ``kv_valid``). NOT exact for absolute
  positional embeddings (e.g. `valle_ref.py`) — keep those on the
  fixed-shape path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_segments(segments: list[jax.Array],
                  lengths: list[jax.Array]) -> jax.Array:
    """Left-aligned per-sample concatenation of right-padded segments.

    segments[k] (B, Lk_max, ...) right-padded; lengths[k] (B,). Returns
    (B, ΣLk_max, ...) laid out ``[seg0_i[:l0_i] | seg1_i[:l1_i] | … | pad]``.
    """
    total = sum(s.shape[1] for s in segments)
    b = segments[0].shape[0]
    pos = jnp.arange(total)[None, :]
    expand = (...,) + (None,) * (segments[0].ndim - 2)
    out = None
    offset = jnp.zeros((b, 1), lengths[0].dtype)
    for seg, ln in zip(segments, lengths):
        idx = jnp.clip(pos - offset, 0, seg.shape[1] - 1)
        gathered = jnp.take_along_axis(seg, idx[expand], axis=1)
        if out is None:
            out = gathered
        else:
            out = jnp.where((pos >= offset)[expand], gathered, out)
        offset = offset + ln[:, None]
    return out


def pack_segments_right(segments: list[jax.Array],
                        lengths: list[jax.Array]) -> jax.Array:
    """Right-aligned per-sample concatenation: ``[pad | seg0_i | seg1_i…]``,
    all samples ending at the buffer's last position. Same contract as
    `pack_segments` otherwise. The pad prefix holds clamped segment-0
    content — mask it (`right_pack_valid`) rather than reading it."""
    total = sum(s.shape[1] for s in segments)
    b = segments[0].shape[0]
    start = total - sum(lengths)  # (B,) left-pad amount per sample
    pos = jnp.arange(total)[None, :]
    expand = (...,) + (None,) * (segments[0].ndim - 2)
    out = None
    offset = start[:, None]
    for seg, ln in zip(segments, lengths):
        idx = jnp.clip(pos - offset, 0, seg.shape[1] - 1)
        gathered = jnp.take_along_axis(seg, idx[expand], axis=1)
        if out is None:
            out = gathered
        else:
            out = jnp.where((pos >= offset)[expand], gathered, out)
        offset = offset + ln[:, None]
    return out


def right_pack_valid(lengths: list[jax.Array], total: int,
                     n_slots: int) -> jax.Array:
    """(B, n_slots) bool: slot s holds real content under the right-aligned
    layout of ``total`` packed positions (slots ≥ total — e.g. AR decode
    appends — are always valid)."""
    start = total - sum(lengths)
    return jnp.arange(n_slots)[None, :] >= start[:, None]


def unpack_target(full: jax.Array, prefix_len: jax.Array,
                  t_max: int) -> jax.Array:
    """Gather ``full[i, prefix_len_i : prefix_len_i + t_max]`` per sample."""
    pos = jnp.arange(t_max)[None, :]
    idx = jnp.clip(prefix_len[:, None] + pos, 0, full.shape[1] - 1)
    expand = (...,) + (None,) * (full.ndim - 2)
    return jnp.take_along_axis(full, idx[expand], axis=1)


def masked_std(x: jax.Array, valid: jax.Array) -> jax.Array:
    """Per-sample std over valid (B, T) positions of x (B, T, D) → (B, 1, 1)."""
    w = valid.astype(jnp.float32)[..., None]
    xf = x.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w, axis=(1, 2)) * x.shape[-1], 1.0)
    mean = jnp.sum(xf * w, axis=(1, 2)) / n
    var = jnp.sum(jnp.square(xf - mean[:, None, None]) * w, axis=(1, 2)) / n
    return jnp.sqrt(var)[:, None, None]


def split_each(rngs: jax.Array, n: int) -> list[jax.Array]:
    """Split each key in a (B,) key array into n per-sample streams."""
    parts = jax.vmap(lambda k: jax.random.split(k, n))(rngs)
    return [parts[:, i] for i in range(n)]
