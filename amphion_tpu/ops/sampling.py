"""Token sampling: top-k / top-p (nucleus) filtering + categorical draw.

Behavioral parity with the reference sampler (reference:
`utils/topk_sampling.py` — logits filtering with -inf masking, then
multinomial), written as pure jit-safe functions with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k largest logits per row, set the rest to -inf.

    lax.top_k, not a full sort — full-vocab sorts are ~10x a transformer
    forward on the TPU VPU."""
    if k <= 0 or k >= logits.shape[-1]:  # no-op when k covers the vocab
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def top_p_filter(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering: keep the smallest set of logits with cum prob >= p."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < p; always keep top-1
    keep_sorted = (cum - probs) < p
    # threshold = smallest kept logit
    masked = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    thresh = jnp.min(masked, axis=-1, keepdims=True)
    return jnp.where(logits < thresh, -jnp.inf, logits)


def sample_logits(
    rng: jax.Array,
    logits: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    """Draw token ids (..., V) → (...) with temperature + top-k/p filtering."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    logits = top_k_filter(logits, top_k)
    logits = top_p_filter(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1)
