"""JETS alignment learning, checkpoint-compatible with the reference
(`models/tts/jets/alignments.py` — `AlignmentModule:15`, beta-binomial
prior `:86`, `_monotonic_alignment_search:126`, `viterbi_decode:160`,
`average_by_duration:212`; forward-sum loss `jets_loss.py:181`).

TPU-first differences in *implementation only* (semantics match):

- the Viterbi max-path runs fully on device through `ops/mas.maximum_path`
  (a `lax.scan` DP) instead of the reference's numba CPU round-trip;
- the beta-binomial log-pmf prior is computed with `gammaln` on device
  instead of scipy on host (the reference caches host arrays per length
  pair; here it is just math inside the jitted step);
- the forward-sum (CTC) loss uses `optax.ctc_loss` batched over the pad
  mask instead of a Python loop of per-utterance `F.ctc_loss` calls.
  The reference log-softmaxes the blank-padded matrix and hands it to
  CTC as log-probs; `optax.ctc_loss` log-softmaxes its input, which is
  idempotent on already-normalized rows, so the two agree exactly;
- `average_by_duration` is a one-hot segment mean (matmul) instead of a
  numba loop.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.scipy.special import gammaln

from amphion_tpu.ops.mas import maximum_path

_NEG = -1e9


def _conv(feats, k, name):
    return nn.Conv(feats, (k,), padding=[((k - 1) // 2, (k - 1) // 2)],
                   name=name)


def beta_binomial_prior(text_mask, feat_mask, w: float = 1.0):
    """Batched beta-binomial alignment prior (ref `alignments.py:86`).

    For an item with N text tokens and T frames the reference sets
    ``alpha_t = w * t`` (t = 1..T), ``beta_t = w * (T - alpha_t + 1)`` and
    fills ``prior[t-1, k] = BetaBinom(k; N, alpha_t, beta_t).logpmf`` for
    k = 0..N-1, -inf outside the valid region (here a large negative so
    gradients stay finite).

    Args:
        text_mask: (B, L) 1/0 validity of text tokens.
        feat_mask: (B, T) 1/0 validity of frames.
    Returns:
        (B, T, L) log-prior.
    """
    text_mask = text_mask.astype(jnp.float32)
    feat_mask = feat_mask.astype(jnp.float32)
    n = jnp.sum(text_mask, axis=1)  # (B,) N per item
    t_len = jnp.sum(feat_mask, axis=1)  # (B,) T per item
    t = jnp.arange(1, feat_mask.shape[1] + 1, dtype=jnp.float32)[None]  # 1..T
    k = jnp.arange(text_mask.shape[1], dtype=jnp.float32)[None]  # 0..L-1

    alpha = w * t  # (B, T) via broadcast
    beta = w * (t_len[:, None] - alpha + 1.0)
    # clamp to keep gammaln finite in padded region (masked out below)
    alpha = jnp.maximum(alpha, 1e-3)[:, :, None]  # (B, T, 1)
    beta = jnp.maximum(beta, 1e-3)[:, :, None]
    nn_ = n[:, None, None]  # (B, 1, 1)
    kk = jnp.minimum(k, jnp.maximum(n[:, None] - 1.0, 0.0))[:, None, :]

    log_comb = gammaln(nn_ + 1.0) - gammaln(kk + 1.0) - gammaln(nn_ - kk + 1.0)
    log_beta_num = (gammaln(kk + alpha) + gammaln(nn_ - kk + beta)
                    - gammaln(nn_ + alpha + beta))
    log_beta_den = gammaln(alpha) + gammaln(beta) - gammaln(alpha + beta)
    prior = log_comb + log_beta_num - log_beta_den
    valid = feat_mask[:, :, None] * text_mask[:, None, :]
    return jnp.where(valid > 0, prior, _NEG)


class AlignmentModule(nn.Module):
    """Text/feature conv towers → -L2 score → masked log-softmax over the
    text axis, plus the beta-binomial prior (ref `alignments.py:15-83`)."""

    adim: int
    odim: int
    prior_w: float = 1.0

    @nn.compact
    def __call__(self, text, feats, text_mask, feat_mask):
        """text (B, L, adim), feats (B, T, odim) → log_p_attn (B, T, L)."""
        h_t = _conv(self.adim, 1, "t_conv2")(
            nn.relu(_conv(self.adim, 3, "t_conv1")(text)))
        h_f = nn.relu(_conv(self.adim, 3, "f_conv1")(feats))
        h_f = _conv(self.adim, 1, "f_conv3")(
            nn.relu(_conv(self.adim, 3, "f_conv2")(h_f)))
        # score[b, t, l] = -||h_f[b,t] - h_t[b,l]||_2
        sq = (jnp.sum(h_f**2, -1)[:, :, None]
              - 2.0 * jnp.einsum("btd,bld->btl", h_f, h_t)
              + jnp.sum(h_t**2, -1)[:, None, :])
        score = -jnp.sqrt(jnp.maximum(sq, 1e-12))
        score = jnp.where(text_mask[:, None, :] > 0, score, _NEG)
        log_p_attn = jax.nn.log_softmax(score, axis=-1)
        return log_p_attn + beta_binomial_prior(
            text_mask, feat_mask, self.prior_w)


def viterbi_decode(log_p_attn, text_mask, feat_mask):
    """Hard durations + binarization loss (ref `alignments.py:160`).

    Returns (durations (B, L) int32, bin_loss scalar): durations count the
    frames each token claims on the max-probability monotonic path;
    bin_loss is -mean over valid frames of log_p_attn on the path,
    averaged over the batch.
    """
    attn_mask = text_mask[:, :, None] * feat_mask[:, None, :]  # (B, L, T)
    lattice = jnp.transpose(log_p_attn, (0, 2, 1))  # (B, L, T)
    path = jax.lax.stop_gradient(maximum_path(lattice, attn_mask))
    durations = jnp.sum(path, axis=-1).astype(jnp.int32)
    t_len = jnp.maximum(jnp.sum(feat_mask, axis=1), 1.0)  # (B,)
    per_item = -jnp.sum(path * lattice, axis=(1, 2)) / t_len
    return durations, jnp.mean(per_item)


def forward_sum_loss(log_p_attn, text_mask, feat_mask,
                     blank_prob: float = math.exp(-1.0)):
    """CTC forward-sum alignment loss (ref `jets_loss.py:181`): prepend a
    blank column at log(blank_prob), log-softmax over text+blank, CTC to
    the target sequence 1..N; per-item loss normalized by N (torch
    `F.ctc_loss` 'mean' semantics), averaged over the batch."""
    b, t, l = log_p_attn.shape
    blank = jnp.full((b, t, 1), jnp.log(blank_prob), log_p_attn.dtype)
    logits = jnp.concatenate([blank, log_p_attn], axis=-1)
    logits = jax.nn.log_softmax(logits, axis=-1)
    labels = jnp.broadcast_to(jnp.arange(1, l + 1, dtype=jnp.int32)[None],
                              (b, l))
    loss = optax.ctc_loss(
        logits, 1.0 - feat_mask.astype(jnp.float32), labels,
        1.0 - text_mask.astype(jnp.float32), blank_id=0)
    n = jnp.maximum(jnp.sum(text_mask, axis=1), 1.0)
    return jnp.mean(loss / n)


def average_by_duration(ds, xs, text_mask, feat_mask):
    """Token-level mean of a frame-level feature (ref `alignments.py:212`):
    frame t belongs to token ``searchsorted(cumsum(d), t, 'right')``; empty
    tokens get 0. ds (B, L) int, xs (B, T) → (B, L)."""
    ds = ds * text_mask.astype(ds.dtype)
    cum = jnp.cumsum(ds, axis=1)  # (B, L) segment ends
    t = jnp.arange(xs.shape[1])[None]  # (B, T) frame index
    tok = jax.vmap(lambda c, tt: jnp.searchsorted(c, tt, side="right"))(
        cum, jnp.broadcast_to(t, (xs.shape[0], xs.shape[1])))
    onehot = jax.nn.one_hot(tok, ds.shape[1], dtype=xs.dtype)  # (B, T, L)
    onehot = onehot * feat_mask.astype(xs.dtype)[:, :, None]
    sums = jnp.einsum("bt,btl->bl", xs, onehot)
    counts = jnp.sum(onehot, axis=1)
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)
