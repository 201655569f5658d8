"""Device-native F0 (pitch) tracking.

The reference extracts F0 on CPU through external C libraries (pyin /
parselmouth / pyworld dio+harvest / torchcrepe — reference `utils/f0.py:73-230`,
dispatch `get_f0` at `utils/f0.py:232`). None of those run on TPU, so the
TPU-native front end implements the YIN algorithm (de Cheveigné & Kawahara
2002 — the same algorithm underlying librosa's pyin candidate stage) directly
in JAX: the difference function is computed from an FFT autocorrelation, the
cumulative-mean-normalized difference (CMND) is thresholded with parabolic
refinement, all batched and jit-compiled with static shapes.

Frame alignment matches the mel front end: ``(frame_length - hop)/2`` reflect
padding → exactly ``T // hop_size`` frames.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from amphion_tpu.ops.stft import frame_signal


@dataclass(frozen=True)
class F0Config:
    sample_rate: int = 24000
    hop_size: int = 120
    f0_min: float = 50.0
    f0_max: float = 1100.0
    frame_length: int = 1024
    threshold: float = 0.15  # CMND voicing threshold

    @classmethod
    def from_preprocess_cfg(cls, p) -> "F0Config":
        return cls(
            sample_rate=p.sample_rate,
            hop_size=p.hop_size,
            f0_min=float(p.get("f0_min", 50)),
            f0_max=float(p.get("f0_max", 1100)),
        )


def _cmnd_frames(y: jax.Array, cfg: F0Config):
    """Frame a batch of waveforms and compute the YIN cumulative-mean-
    normalized difference. Returns (cmnd (B, N, W/2+1), tau_min, tau_max,
    band mask (W/2+1,))."""
    if y.ndim == 1:
        y = y[None]
    y = y.astype(jnp.float32)
    w = cfg.frame_length
    pad = (w - cfg.hop_size) // 2
    ypad = jnp.pad(y, [(0, 0), (pad, w - cfg.hop_size - pad)], mode="reflect")
    frames = frame_signal(ypad, w, cfg.hop_size)  # (B, N, W)

    tau_min = max(2, int(cfg.sample_rate / cfg.f0_max))
    tau_max = min(w // 2, int(cfg.sample_rate / cfg.f0_min) + 1)

    # Difference function d(tau) = sum_{n<W-tau} (x_n - x_{n+tau})^2 via
    # linear autocorrelation (zero-padded FFT) + cumulative energy terms.
    nfft = 2 * w
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[..., : w // 2 + 1]
    sq = frames * frames
    csum = jnp.concatenate(
        [jnp.zeros_like(sq[..., :1]), jnp.cumsum(sq, axis=-1)], axis=-1
    )  # C[k] = sum_{n<k} x_n^2, (B, N, W+1)
    tau = jnp.arange(w // 2 + 1)
    total = csum[..., w : w + 1]  # C[W]
    term1 = jnp.take(csum, w - tau, axis=-1)  # sum_{n<W-tau} x_n^2
    term2 = total - jnp.take(csum, tau, axis=-1)  # sum_{tau<=n<W} x_n^2
    d = term1 + term2 - 2.0 * acf  # (B, N, W/2+1)

    # CMND: d'(tau) = d(tau) * tau / cumsum(d)(tau), d'(0) = 1
    dcum = jnp.cumsum(d[..., 1:], axis=-1)
    cmnd = d[..., 1:] * jnp.arange(1, w // 2 + 1) / jnp.maximum(dcum, 1e-8)
    cmnd = jnp.concatenate([jnp.ones_like(d[..., :1]), cmnd], axis=-1)
    # digital-silence frames make the CMND 0/0 → 0 ("perfectly periodic");
    # force them to the unvoiced side with an energy floor
    energy = total[..., 0] / w  # mean square per frame (B, N)
    cmnd = jnp.where((energy < 1e-9)[..., None], jnp.ones_like(cmnd), cmnd)
    band = (tau >= tau_min) & (tau <= tau_max)
    return cmnd, tau_min, tau_max, band


@functools.partial(jax.jit, static_argnums=(1,))
def yin_f0(y: jax.Array, cfg: F0Config) -> tuple[jax.Array, jax.Array]:
    """YIN pitch track of a batch of waveforms.

    Args:
        y: (B, T) or (T,) waveform; T a multiple of hop_size.
    Returns:
        f0: (B, T // hop) Hz, 0 where unvoiced.
        voiced: (B, T // hop) bool voicing decision.
    """
    w = cfg.frame_length
    cmnd, tau_min, tau_max, band = _cmnd_frames(y, cfg)
    cmnd_b = jnp.where(band, cmnd, jnp.inf)

    below = cmnd_b < cfg.threshold
    any_below = jnp.any(below, axis=-1)
    first_below = jnp.argmax(below, axis=-1)  # first tau under threshold
    # extend to the local minimum following the threshold crossing: walk
    # forward while the function keeps decreasing (vectorized: among
    # taus >= first_below, take the first local minimum).
    idx = jnp.arange(w // 2 + 1)
    after = idx[None, None, :] >= first_below[..., None]
    rising = jnp.concatenate(
        [cmnd_b[..., 1:] >= cmnd_b[..., :-1], jnp.ones_like(cmnd_b[..., :1], bool)],
        axis=-1,
    )
    cand = after & rising & band[None, None, :]
    local_min = jnp.argmax(cand, axis=-1)
    best_tau = jnp.where(any_below, local_min, jnp.argmin(cmnd_b, axis=-1))

    # parabolic interpolation around best_tau
    t0 = jnp.clip(best_tau, tau_min, tau_max)
    dm = jnp.take_along_axis(cmnd, (t0 - 1)[..., None], axis=-1)[..., 0]
    d0 = jnp.take_along_axis(cmnd, t0[..., None], axis=-1)[..., 0]
    dp = jnp.take_along_axis(cmnd, (t0 + 1)[..., None], axis=-1)[..., 0]
    denom = 2.0 * (dm - 2.0 * d0 + dp)
    shift = jnp.where(jnp.abs(denom) > 1e-12, (dm - dp) / jnp.maximum(jnp.abs(denom), 1e-12) * jnp.sign(denom), 0.0)
    shift = jnp.clip(shift, -0.5, 0.5)
    period = t0.astype(jnp.float32) + shift

    voiced = any_below
    f0 = jnp.where(voiced, cfg.sample_rate / jnp.maximum(period, 1.0), 0.0)
    f0 = jnp.where((f0 >= cfg.f0_min) & (f0 <= cfg.f0_max), f0, 0.0)
    voiced = f0 > 0
    return f0, voiced


@dataclass(frozen=True)
class PyinConfig:
    """pYIN-style tracker (Mauch & Dixon 2014 — the algorithm behind the
    reference's `get_f0_features_using_pyin`, `utils/f0.py:73`): YIN CMND
    troughs become probabilistic pitch candidates and an HMM Viterbi pass
    over log-spaced pitch states + an unvoiced state smooths the track
    (octave-error and dropout resistant)."""

    base: F0Config = F0Config()
    bins_per_semitone: int = 4
    switch_prob: float = 0.01  # voiced <-> unvoiced transition
    max_semitones_per_frame: float = 3.0  # pitch slew limit
    trough_threshold: float = 0.6  # CMND ceiling for candidacy


@functools.partial(jax.jit, static_argnums=(1,))
def pyin_f0(y: jax.Array, cfg: PyinConfig) -> tuple[jax.Array, jax.Array]:
    """Viterbi-smoothed pitch track.

    Returns (f0 (B, N) Hz with 0 where unvoiced, voiced_prob (B, N)).
    """
    c = cfg.base
    cmnd, tau_min, tau_max, band = _cmnd_frames(y, cfg.base)
    b, n, _ = cmnd.shape

    # log-spaced pitch grid
    import math

    n_bins = int(12.0 * math.log2(c.f0_max / c.f0_min)
                 * cfg.bins_per_semitone) + 1
    bin_freqs = c.f0_min * 2.0 ** (jnp.arange(n_bins)
                                   / (12.0 * cfg.bins_per_semitone))

    # trough candidates: local minima of CMND inside the band. pYIN's
    # threshold sweep: for threshold t the FIRST trough below t is the
    # candidate; integrating over a Beta(2,18) threshold prior gives each
    # trough the probability mass between its own depth and the shallowest
    # earlier trough (favouring early/deep troughs — this is what kills
    # subharmonic octave errors that plain clarity weighting keeps).
    cmnd_b = jnp.where(band, cmnd, jnp.inf)
    left = jnp.concatenate([jnp.full_like(cmnd_b[..., :1], jnp.inf),
                            cmnd_b[..., :-1]], axis=-1)
    right = jnp.concatenate([cmnd_b[..., 1:],
                             jnp.full_like(cmnd_b[..., :1], jnp.inf)], axis=-1)
    is_trough = (cmnd_b <= left) & (cmnd_b < right) & band

    def beta_cdf(x):  # Beta(2, 18) CDF, closed form for integer params
        x = jnp.clip(x, 0.0, 1.0)
        return 1.0 - (1.0 - x) ** 19 - 19.0 * x * (1.0 - x) ** 18

    v = jnp.where(is_trough, cmnd_b, jnp.inf)
    prefix_min = jax.lax.associative_scan(jnp.minimum, v, axis=-1)
    prev_min = jnp.concatenate(
        [jnp.full_like(v[..., :1], jnp.inf), prefix_min[..., :-1]], axis=-1)
    weight = jnp.clip(beta_cdf(prev_min) - beta_cdf(v), 0.0, 1.0)
    weight = jnp.where(is_trough, weight, 0.0)  # (B, N, W/2+1)

    tau_idx = jnp.arange(cmnd.shape[-1])
    freqs = c.sample_rate / jnp.maximum(tau_idx, 1)
    bin_of_tau = jnp.clip(jnp.round(
        12.0 * cfg.bins_per_semitone
        * jnp.log2(jnp.maximum(freqs, 1e-3) / c.f0_min)), 0, n_bins - 1
    ).astype(jnp.int32)
    obs = jnp.zeros((b, n, n_bins)).at[..., bin_of_tau].add(weight)
    voiced_strength = jnp.clip(jnp.sum(obs, axis=-1), 0.0, 1.0)

    # observation log-probs over [n_bins voiced states, 1 unvoiced state]
    obs_v = obs / jnp.maximum(jnp.sum(obs, axis=-1, keepdims=True), 1e-8)
    p_voiced = voiced_strength[..., None] * obs_v
    p_unv = (1.0 - voiced_strength)[..., None]
    log_obs = jnp.log(jnp.concatenate([p_voiced, p_unv], -1) + 1e-8)

    # banded transition: triangular window over +-max_jump bins
    max_jump = max(1, int(cfg.max_semitones_per_frame
                          * cfg.bins_per_semitone))
    di = jnp.arange(n_bins)[:, None] - jnp.arange(n_bins)[None, :]
    tri = jnp.maximum(0.0, 1.0 - jnp.abs(di) / (max_jump + 1.0))
    tri = tri / jnp.maximum(jnp.sum(tri, axis=-1, keepdims=True), 1e-8)
    sw = cfg.switch_prob
    trans = jnp.zeros((n_bins + 1, n_bins + 1))
    trans = trans.at[:n_bins, :n_bins].set((1.0 - sw) * tri)
    trans = trans.at[:n_bins, n_bins].set(sw)
    trans = trans.at[n_bins, :n_bins].set(sw / n_bins)
    trans = trans.at[n_bins, n_bins].set(1.0 - sw)
    log_trans = jnp.log(trans + 1e-10)  # (S, S)

    # Viterbi over frames (lax.scan forward, backtrack on the stored argmax)
    def fwd(carry, lo):
        score = carry  # (B, S)
        cand = score[:, :, None] + log_trans[None]  # (B, S_prev, S)
        best_prev = jnp.argmax(cand, axis=1)  # (B, S)
        score = jnp.max(cand, axis=1) + lo
        return score, best_prev

    log_obs_t = jnp.moveaxis(log_obs, 1, 0)  # (N, B, S)
    score0 = log_obs_t[0]
    final, back = jax.lax.scan(fwd, score0, log_obs_t[1:])

    def bwd(state, bp):
        prev = jnp.take_along_axis(bp, state[:, None], axis=1)[:, 0]
        return prev, state

    last = jnp.argmax(final, axis=-1)  # (B,)
    _, states_rev = jax.lax.scan(bwd, last, back, reverse=True)
    states = jnp.concatenate([states_rev, last[None]], axis=0)  # (N, B)
    states = jnp.moveaxis(states, 0, 1)  # (B, N)

    voiced = states < n_bins
    f0 = jnp.where(voiced,
                   jnp.take(bin_freqs, jnp.clip(states, 0, n_bins - 1)), 0.0)

    # refine the bin-quantized pitch: parabolic interpolation of the CMND
    # around the best candidate trough within ±1 bin of the Viterbi state
    near = jnp.abs(bin_of_tau[None, None, :]
                   - jnp.clip(states, 0, n_bins - 1)[..., None]) <= 1
    w_near = jnp.where(near, weight, 0.0)
    has_cand = jnp.any(w_near > 0, axis=-1)
    t0 = jnp.clip(jnp.argmax(w_near, axis=-1), tau_min, tau_max)
    dm = jnp.take_along_axis(cmnd, (t0 - 1)[..., None], axis=-1)[..., 0]
    d0 = jnp.take_along_axis(cmnd, t0[..., None], axis=-1)[..., 0]
    dp = jnp.take_along_axis(cmnd, (t0 + 1)[..., None], axis=-1)[..., 0]
    denom = 2.0 * (dm - 2.0 * d0 + dp)
    shift = jnp.where(jnp.abs(denom) > 1e-12,
                      (dm - dp) / jnp.maximum(jnp.abs(denom), 1e-12)
                      * jnp.sign(denom), 0.0)
    period = t0.astype(jnp.float32) + jnp.clip(shift, -0.5, 0.5)
    f0_fine = c.sample_rate / jnp.maximum(period, 1.0)
    f0 = jnp.where(voiced & has_cand, f0_fine, f0)
    return f0, voiced_strength


def interpolate_f0(f0: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Linearly interpolate F0 through unvoiced regions (ref `utils/f0.py:49`).

    Fully vectorized (jit-safe): forward/backward fill of the nearest voiced
    values with distance-weighted blending. Input/output (..., T); also
    returns the unvoiced mask.
    """
    uv = f0 == 0
    t = f0.shape[-1]
    idx = jnp.arange(t)
    voiced = ~uv

    # forward fill: index of the most recent voiced frame at or before i
    prev_idx = jnp.where(voiced, idx, -1)
    prev_idx = jax.lax.associative_scan(jnp.maximum, prev_idx, axis=-1)
    # backward fill: index of the next voiced frame at or after i
    next_idx = jnp.where(voiced, idx, t)
    next_idx = jnp.flip(
        jax.lax.associative_scan(jnp.minimum, jnp.flip(next_idx, -1), axis=-1), -1
    )

    prev_val = jnp.take_along_axis(f0, jnp.clip(prev_idx, 0, t - 1), axis=-1)
    next_val = jnp.take_along_axis(f0, jnp.clip(next_idx, 0, t - 1), axis=-1)
    has_prev = prev_idx >= 0
    has_next = next_idx < t
    # linear weight by distance
    dist_p = (idx - prev_idx).astype(jnp.float32)
    dist_n = (next_idx - idx).astype(jnp.float32)
    denom = jnp.maximum(dist_p + dist_n, 1.0)
    interp = prev_val * (dist_n / denom) + next_val * (dist_p / denom)
    interp = jnp.where(has_prev & ~has_next, prev_val, interp)
    interp = jnp.where(~has_prev & has_next, next_val, interp)
    out = jnp.where(voiced, f0, interp)
    return out, uv


def f0_to_coarse(f0: jax.Array, pitch_bin: int, f0_min: float, f0_max: float) -> jax.Array:
    """Quantize Hz F0 to mel-scale bins in [1, pitch_bin-1] (ref `utils/f0.py:14`)."""
    f0_mel_min = 1127.0 * jnp.log(1.0 + f0_min / 700.0)
    f0_mel_max = 1127.0 * jnp.log(1.0 + f0_max / 700.0)
    f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    scaled = (f0_mel - f0_mel_min) * (pitch_bin - 2) / (f0_mel_max - f0_mel_min) + 1.0
    f0_mel = jnp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = jnp.clip(f0_mel, 1.0, pitch_bin - 1)
    # torch path rounds with floor(x + 0.5) (`(f0_mel + 0.5).long()`)
    return jnp.floor(f0_mel + 0.5).astype(jnp.int32)


def get_log_f0(f0: jax.Array) -> jax.Array:
    """log(F0) with unvoiced frames mapped to 0 (ref `utils/f0.py:67`)."""
    return jnp.where(f0 > 0, jnp.log(jnp.maximum(f0, 1e-5)), 0.0)
