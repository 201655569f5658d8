"""Additional DSP: Griffin-Lim, preemphasis, amplitude/phase extraction,
audio slicing (reference: `utils/dsp.py`, `utils/audio_slicer.py`,
amplitude/phase features in `processors/acoustic_extractor.py`)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.ops.stft import istft, stft, stft_magnitude


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def griffin_lim(
    magnitude: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    n_iters: int = 32,
) -> jax.Array:
    """Griffin-Lim phase reconstruction from |STFT| (B, F, N) → (B, T).

    The iteration is a lax.scan (one compiled program); the reference uses
    librosa's CPU implementation.
    """
    b, f, n = magnitude.shape
    length = hop_size * (n - 1)

    def project(sig):
        re, im = stft(sig, n_fft, hop_size, win_size, center=True)
        phase = jnp.arctan2(im, re)
        return phase

    key = jax.random.key(0)
    init_phase = jax.random.uniform(key, magnitude.shape) * 2 * jnp.pi

    def body(phase, _):
        sig = istft(
            magnitude * jnp.cos(phase), magnitude * jnp.sin(phase),
            n_fft, hop_size, win_size, length=length,
        )
        return project(sig), None

    phase, _ = jax.lax.scan(body, init_phase, None, length=n_iters)
    return istft(
        magnitude * jnp.cos(phase), magnitude * jnp.sin(phase),
        n_fft, hop_size, win_size, length=length,
    )


def preemphasis(x: jax.Array, coef: float = 0.97) -> jax.Array:
    return jnp.concatenate([x[..., :1], x[..., 1:] - coef * x[..., :-1]], axis=-1)


def deemphasis(x: jax.Array, coef: float = 0.97) -> jax.Array:
    def body(prev, xt):
        y = xt + coef * prev
        return y, y

    _, y = jax.lax.scan(body, jnp.zeros(x.shape[:-1]), jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(y, 0, -1)


def amplitude_phase(y: jax.Array, n_fft: int, hop_size: int, win_size: int):
    """Log-amplitude + wrapped phase + (real, imag) features (APNet targets,
    ref `acoustic_extractor.py` extract_amplitude_phase)."""
    re, im = stft(y, n_fft, hop_size, win_size, center=True)
    log_amp = 0.5 * jnp.log(re**2 + im**2 + 1e-8)
    phase = jnp.arctan2(im, re)
    return log_amp, phase, re, im


def slice_audio(
    x: np.ndarray,
    sr: int,
    threshold_db: float = -40.0,
    min_length_s: float = 5.0,
    min_interval_s: float = 0.3,
    hop_s: float = 0.01,
    max_sil_kept_s: float = 0.5,
) -> list[tuple[int, int]]:
    """Silence-based slicing (ref `utils/audio_slicer.py`): returns sample
    ranges of non-silent chunks, keeping at most max_sil_kept of silence."""
    hop = max(1, int(sr * hop_s))
    n = len(x) // hop
    if n == 0:
        return [(0, len(x))]
    frames = x[: n * hop].reshape(n, hop)
    db = 20 * np.log10(np.sqrt(np.mean(frames**2, axis=1)) + 1e-8)
    silent = db < threshold_db
    min_len = int(min_length_s / hop_s)
    min_int = int(min_interval_s / hop_s)
    keep = int(max_sil_kept_s / hop_s)

    chunks = []
    start = 0
    i = 0
    while i < n:
        if silent[i]:
            j = i
            while j < n and silent[j]:
                j += 1
            if j - i >= min_int and i - start >= min_len:
                end = min(i + keep, j)
                chunks.append((start * hop, end * hop))
                start = max(j - keep, end)
            i = j
        else:
            i += 1
    if n - start >= min_int:
        chunks.append((start * hop, len(x)))
    return chunks or [(0, len(x))]


def ssim(x: jax.Array, y: jax.Array, window: int = 7, c1: float = 0.01**2,
         c2: float = 0.03**2) -> jax.Array:
    """Structural similarity over spectrogram 'images' (ref `utils/util.py`
    SSIM used for mel evaluation). x, y: (B, T, F) in [0, 1]; returns (B,)."""
    def _avg_pool(img):
        return jax.lax.reduce_window(
            img, 0.0, jax.lax.add, (1, window, window), (1, 1, 1), "VALID"
        ) / (window * window)

    mu_x, mu_y = _avg_pool(x), _avg_pool(y)
    sigma_x = _avg_pool(x * x) - mu_x**2
    sigma_y = _avg_pool(y * y) - mu_y**2
    sigma_xy = _avg_pool(x * y) - mu_x * mu_y
    s = ((2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    )
    return jnp.mean(s, axis=(1, 2))


def mel_to_audio(
    log_mel: jax.Array,
    cfg,
    n_iters: int = 32,
) -> jax.Array:
    """Invert log-mel to waveform via filterbank pseudo-inverse + Griffin-Lim
    (the reference's vocoder-free fallback; `utils/dsp.py` Griffin-Lim path).

    log_mel: (B, n_mel, N); cfg: MelConfig. Returns (B, N * hop).
    """
    from amphion_tpu.ops.mel import mel_filterbank

    fb = np.asarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mel, cfg.fmin, cfg.fmax)
    )
    pinv = jnp.asarray(np.linalg.pinv(fb))  # (F, n_mel)
    log_mel = jnp.clip(log_mel, -12.0, 6.0)  # guard exp overflow
    mag = jnp.maximum(jnp.einsum("fm,bmn->bfn", pinv, jnp.exp(log_mel)), 1e-8)
    return griffin_lim(mag, cfg.n_fft, cfg.hop_size, cfg.win_size, n_iters)
