"""Batched, device-resident STFT / iSTFT for TPU.

The reference computes STFT on CPU via ``torch.stft`` one utterance at a time
(reference: `utils/stft.py:115`, `utils/mel.py:55-170`). Here the transform is
expressed as a strided convolution with a windowed-DFT kernel, so the whole
front end (framing + windowing + DFT) lowers to a single MXU matmul per hop —
the idiomatic TPU formulation — and is batched over utterances.

Conventions match the reference exactly (center=False, reflect padding of
``(n_fft - hop)/2``, periodic Hann window of ``win_size`` zero-padded to
``n_fft``), so mel features agree with the PyTorch pipeline within float
tolerance (validated in tests/test_stft.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_size: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (identical to ``torch.hann_window``).

    Pure numpy on purpose: window/basis construction happens at trace time,
    so it must stay concrete (not staged into the jaxpr).
    """
    n = np.arange(win_size, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)
    return w.astype(dtype)


def _padded_window(win_size: int, n_fft: int) -> np.ndarray:
    """Window zero-padded symmetrically to n_fft (torch.stft convention)."""
    w = hann_window(win_size)
    if n_fft == win_size:
        return w
    left = (n_fft - win_size) // 2
    return np.pad(w, (left, n_fft - win_size - left))


@functools.partial(jax.jit, static_argnums=(1, 2))
def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Frame a signal (..., T) into (..., n_frames, frame_length)."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_length)[None, :]
    return x[..., idx]


@functools.lru_cache(maxsize=8)
def _dft_kernel(n_fft: int, win_size: int) -> np.ndarray:
    """Windowed real-DFT conv kernel: (n_fft taps, 2*(n_fft//2+1) channels).

    Channel layout: [real_0..real_K, imag_0..imag_K] with K = n_fft//2.
    Built in float64 numpy then cast, so the basis itself is exact.
    """
    k = np.arange(n_fft // 2 + 1)[:, None]  # (K+1, 1)
    n = np.arange(n_fft)[None, :]  # (1, n_fft)
    ang = 2.0 * np.pi * k * n / n_fft
    real = np.cos(ang)
    imag = -np.sin(ang)
    w = np.asarray(_padded_window(win_size, n_fft))
    basis = np.concatenate([real, imag], axis=0) * w[None, :]  # (2K+2, n_fft)
    return basis.astype(np.float32)


def _reflect_pad(y: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def stft(
    y: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    center: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """STFT of a batch of signals (B, T) → (real, imag), each (B, F, N).

    With ``center=False`` the caller is expected to have applied the
    reference's ``(n_fft - hop)/2`` reflect padding (see
    :func:`amphion_tpu.ops.mel.mel_spectrogram`); with ``center=True`` the
    usual ``n_fft/2`` reflect padding is applied here.
    """
    if y.ndim == 1:
        y = y[None]
    if center:
        y = _reflect_pad(y, n_fft // 2)
    kernel = jnp.asarray(_dft_kernel(n_fft, win_size))  # (2F, n_fft)
    # conv: (B, 1, T) * (2F, 1, n_fft) stride hop → (B, 2F, N)
    out = jax.lax.conv_general_dilated(
        y[:, None, :].astype(jnp.float32),
        kernel[:, None, :],
        window_strides=(hop_size,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    f = n_fft // 2 + 1
    return out[:, :f, :], out[:, f:, :]


def stft_magnitude(
    y: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    center: bool = False,
    eps: float = 1e-6,
) -> jax.Array:
    """|STFT| with the reference's ``sqrt(re^2 + im^2 + eps)`` floor."""
    re, im = stft(y, n_fft, hop_size, win_size, center)
    return jnp.sqrt(re * re + im * im + eps)


@functools.lru_cache(maxsize=8)
def _idft_kernel(n_fft: int, win_size: int) -> np.ndarray:
    """Inverse real-DFT basis producing windowed time frames from (re, im).

    Returns (n_fft, 2*(n_fft//2+1)): frames = spec_ri @ basis.T
    x[n] = (1/N) * Σ_k c_k * (re_k cos(2π k n/N) - im_k sin(2π k n/N)),
    c_k = 1 for k in {0, N/2}, else 2.
    """
    k = np.arange(n_fft // 2 + 1)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full(n_fft // 2 + 1, 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    cos_b = np.cos(ang) * c / n_fft
    sin_b = -np.sin(ang) * c / n_fft
    basis = np.concatenate([cos_b, sin_b], axis=1)  # (n_fft, 2F)
    w = np.asarray(_padded_window(win_size, n_fft))
    return (basis * w[:, None]).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def istft(
    real: jax.Array,
    imag: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    length: int | None = None,
    padding: str = "center",
    frame_lengths: jax.Array | None = None,
) -> jax.Array:
    """Inverse STFT with overlap-add + window-sum normalization.

    ``padding="center"`` matches ``torch.istft(center=True)`` (APNet head,
    reference `models/vocoders/gan/generator/apnet.py`); ``"same"`` matches
    the Vocos custom ISTFT that trims ``(win - hop) // 2`` per side
    (reference `models/codec/amphion_codec/vocos.py:84-168`), giving
    exactly ``n_frames * hop`` samples. Input (B, F, N) real/imag.

    ``frame_lengths`` (B,) makes a ragged batch exact: frames beyond each
    row's length are zeroed AND excluded from that row's window-sum
    normalization, so row ``i``'s first ``frame_lengths[i] * hop`` samples
    equal an unpadded ``frame_lengths[i]``-frame decode (otherwise the
    shared window envelope over-normalizes the tail of shorter rows).
    """
    b, f, n_frames = real.shape
    spec_ri = jnp.concatenate([real, imag], axis=1)  # (B, 2F, N)
    basis = jnp.asarray(_idft_kernel(n_fft, win_size))  # (n_fft, 2F)
    # frames: (B, N, n_fft) — windowed time-domain frames
    frames = jnp.einsum(
        "bcn,tc->bnt", spec_ri, basis, precision=jax.lax.Precision.HIGHEST
    )
    total = n_fft + hop_size * (n_frames - 1)
    w = _padded_window(win_size, n_fft)
    fmask = None
    if frame_lengths is not None:
        fmask = (jnp.arange(n_frames)[None, :]
                 < frame_lengths[:, None]).astype(frames.dtype)  # (B, N)
        frames = frames * fmask[:, :, None]
    if n_fft % hop_size == 0:
        # Scatter-free overlap-add (every vocoder geometry here divides):
        # each frame splits into K = n_fft/hop chunks of hop samples; chunk
        # k of frame i lands at output chunk i+k, so the OLA is K shifted
        # DENSE adds over (B, N, hop) slabs — static slicing instead of a
        # duplicate-index scatter, which TPUs execute far less efficiently.
        # (Both forms are numerically verified on-chip; an earlier suspicion
        # that axon miscomputed the scatter traced to a test-script
        # center-pairing bug, not the backend.)
        k_chunks = n_fft // hop_size
        ch = frames.reshape(b, n_frames, k_chunks, hop_size)
        sig = jnp.zeros((b, n_frames + k_chunks - 1, hop_size), frames.dtype)
        w2 = (w * w).reshape(k_chunks, hop_size)
        if fmask is not None:
            wch = fmask[:, :, None, None] * w2[None, None, :, :]
            wsq = jnp.zeros((b, n_frames + k_chunks - 1, hop_size), w.dtype)
        else:
            wsq = jnp.zeros((n_frames + k_chunks - 1, hop_size), w.dtype)
        for k in range(k_chunks):
            sig = sig.at[:, k:k + n_frames].add(ch[:, :, k])
            if fmask is not None:
                wsq = wsq.at[:, k:k + n_frames].add(wch[:, :, k])
            else:
                wsq = wsq.at[k:k + n_frames].add(
                    jnp.broadcast_to(w2[k], (n_frames, hop_size)))
        sig = sig.reshape(b, total)
        wsq = wsq.reshape(b if fmask is not None else 1, total)[
            slice(None) if fmask is not None else 0]
    else:
        # general geometry: duplicate-index scatter-add
        frame_idx = (jnp.arange(n_frames)[:, None] * hop_size
                     + jnp.arange(n_fft)[None, :])
        if fmask is not None:
            wtile = (fmask[:, :, None] * (w * w)[None, None, :]).reshape(b, -1)
            wsq = jnp.zeros((b, total), w.dtype).at[
                :, frame_idx.reshape(-1)].add(wtile)
        else:
            wsq = jnp.zeros((total,), w.dtype).at[frame_idx.reshape(-1)].add(
                jnp.tile(w * w, n_frames))
        sig = jnp.zeros((b, total), frames.dtype)
        sig = sig.at[:, frame_idx.reshape(-1)].add(frames.reshape(b, -1))
    sig = sig / jnp.maximum(wsq, 1e-11)
    # center=True trimming: with an explicit length, torch trims only the
    # leading n_fft//2 and cuts to length (the symmetric end-trim would zero
    # the last partial-overlap samples); without it, trim both ends.
    start = n_fft // 2 if padding == "center" else (win_size - hop_size) // 2
    if length is None and padding == "same":
        length = n_frames * hop_size
    if length is not None:
        sig = sig[:, start:]
        if sig.shape[-1] < length:
            sig = jnp.pad(sig, [(0, 0), (0, length - sig.shape[-1])])
        return sig[:, :length]
    return sig[:, start : total - n_fft // 2]
