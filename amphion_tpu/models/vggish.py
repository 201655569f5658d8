"""Native VGGish: the FAD embedding model, in flax.

Reference capability: FAD in the reference is computed with the VGGish
embedder via the `frechet_audio_distance` package
(`/root/reference/evaluation/metrics/spectrogram/frechet_distance.py:19-27`,
`model_name="vggish"`). VGGish is Google's audio VGG (Hershey et al.,
CNN architectures for large-scale audio classification, ICASSP 2017):
0.96 s log-mel patches → VGG-style conv stack → 128-d embedding. This
module re-implements, from the published specification:

- `vggish_log_mel`: the exact AudioSet front end (16 kHz, 25 ms symmetric
  hann frames at 10 ms hop, no centering, |STFT| with n_fft=512, a
  64-band HTK-mel matrix between 125-7500 Hz WITHOUT slaney area
  normalization, `log(mel + 0.01)`) framed into non-overlapping
  96-frame x 64-band examples.
- `VGGish`: conv 64 → pool → conv 128 → pool → conv 256 x2 → pool →
  conv 512 x2 → pool → flatten (NHWC, matching torchvggish's
  transpose-before-flatten) → fc 4096 → fc 4096 → fc 128.
- `torch_vggish_to_flax`: ingest the torchvggish/harritaylor state dict
  (`features.{0,3,6,8,11,13}`, `embeddings.{0,2,4}`) —
  `bins/convert_checkpoint.py --model vggish`.
- `vggish_fad_embedder`: per-clip (n_patches, 128) embeddings for
  `bins/calc_metrics.py --fad_embedder vggish` (FAD statistics pool all
  patches across a corpus, as published).

The MXU-friendly bit: every patch in a batch runs through one jitted
forward; the front end is two matmuls (windowed DFT + mel) like
`ops/mel.py`.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
STFT_WINDOW = 400  # 25 ms
STFT_HOP = 160  # 10 ms
N_FFT = 512  # 2^ceil(log2(400))
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_FRAMES = 96  # 0.96 s at 10 ms hop
EMBEDDING_SIZE = 128


def _hertz_to_mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def _spectrogram_to_mel_matrix() -> np.ndarray:
    """AudioSet mel matrix (mel_features.spectrogram_to_mel_matrix):
    HTK mel scale, triangular weights on spectrogram-bin centers, NO
    area normalization, DC bin forced to zero. (F=257, 64)."""
    num_bins = N_FFT // 2 + 1
    nyquist = SAMPLE_RATE / 2.0
    spec_hz = np.linspace(0.0, nyquist, num_bins)
    spec_mel = _hertz_to_mel(spec_hz)
    band_edges = np.linspace(_hertz_to_mel(MEL_MIN_HZ),
                             _hertz_to_mel(MEL_MAX_HZ), NUM_MEL_BINS + 2)
    weights = np.zeros((num_bins, NUM_MEL_BINS))
    for i in range(NUM_MEL_BINS):
        lo, center, hi = band_edges[i: i + 3]
        lower = (spec_mel - lo) / (center - lo)
        upper = (hi - spec_mel) / (hi - center)
        weights[:, i] = np.maximum(0.0, np.minimum(lower, upper))
    weights[0, :] = 0.0  # DC
    return weights.astype(np.float32)


def vggish_log_mel(audio: np.ndarray, sample_rate: int) -> jax.Array:
    """waveform → (n_examples, 96, 64) log-mel examples (AudioSet front
    end; vggish_input.waveform_to_examples semantics)."""
    from amphion_tpu.data.audio_io import resample

    x = np.asarray(audio, np.float32)
    if x.ndim == 2:  # stereo → mono mean
        x = x.mean(axis=0 if x.shape[0] <= 2 else 1)
    if sample_rate != SAMPLE_RATE:
        x = resample(x, sample_rate, SAMPLE_RATE)
    if len(x) < STFT_WINDOW:
        x = np.pad(x, (0, STFT_WINDOW - len(x)))
    n_frames = 1 + (len(x) - STFT_WINDOW) // STFT_HOP
    xj = jnp.asarray(x)
    idx = (jnp.arange(n_frames)[:, None] * STFT_HOP
           + jnp.arange(STFT_WINDOW)[None, :])
    frames = xj[idx]  # (N, 400) — no padding/centering
    win = jnp.asarray(np.hanning(STFT_WINDOW).astype(np.float32))  # symmetric
    fw = frames * win
    fw = jnp.pad(fw, ((0, 0), (0, N_FFT - STFT_WINDOW)))
    k = np.arange(N_FFT // 2 + 1)
    t = np.arange(N_FFT)
    ang = 2.0 * np.pi * k[:, None] * t[None, :] / N_FFT
    cos = jnp.asarray(np.cos(ang).T.astype(np.float32))
    sin = jnp.asarray((-np.sin(ang)).T.astype(np.float32))
    mag = jnp.sqrt((fw @ cos) ** 2 + (fw @ sin) ** 2)  # (N, 257)
    mel = mag @ jnp.asarray(_spectrogram_to_mel_matrix())
    logmel = jnp.log(mel + LOG_OFFSET)  # (N, 64)
    n_ex = n_frames // EXAMPLE_FRAMES
    if n_ex == 0:  # short clip: pad one example with the log floor
        pad = EXAMPLE_FRAMES - n_frames
        logmel = jnp.pad(logmel, ((0, pad), (0, 0)),
                         constant_values=float(np.log(LOG_OFFSET)))
        n_ex = 1
    return logmel[: n_ex * EXAMPLE_FRAMES].reshape(
        n_ex, EXAMPLE_FRAMES, NUM_MEL_BINS)


@dataclass(frozen=True)
class VGGishConfig:
    channels: tuple = (64, 128, (256, 256), (512, 512))
    fc: tuple = (4096, 4096)
    embedding: int = EMBEDDING_SIZE


class VGGish(nn.Module):
    """(B, 96, 64) log-mel examples → (B, 128) embeddings."""

    cfg: VGGishConfig = VGGishConfig()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x[..., None]  # (B, 96, 64, 1)
        ci = 0
        for group in self.cfg.channels:
            for ch in (group if isinstance(group, tuple) else (group,)):
                h = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"conv_{ci}")(h)
                h = nn.relu(h)
                ci += 1
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        # torchvggish flattens after NCHW→NHWC transpose — our layout
        # is already NHWC, so a plain flatten matches its fc ordering
        h = h.reshape(h.shape[0], -1)  # (B, 6*4*512)
        for i, d in enumerate(self.cfg.fc):
            h = nn.relu(nn.Dense(d, name=f"fc_{i}")(h))
        return nn.Dense(self.cfg.embedding, name="embedding")(h)


def vggish_fad_embedder(ckpt_dir: str = "", params=None):
    """(audio, sr) → (n_patches, 128) — the `--fad_embedder vggish` slot.

    ``ckpt_dir``: dir converted with `--model vggish`, or a raw
    torchvggish .pt/.pth file (converted on the fly)."""
    if params is None:
        if not ckpt_dir:
            raise ValueError("vggish embedder needs a checkpoint "
                             "(--vggish_ckpt / AMPHION_VGGISH_CKPT)")
        from pathlib import Path

        p = Path(ckpt_dir)
        if p.is_file():
            from amphion_tpu.utils.convert import (
                load_torch_checkpoint,
                torch_vggish_to_flax,
            )

            params = torch_vggish_to_flax(load_torch_checkpoint(p))
        else:
            from amphion_tpu.runtime.checkpoint import CheckpointManager

            tree, _, _ = CheckpointManager(p).restore_raw()
            params = tree["params"] if "params" in tree else tree
    model = VGGish()
    fwd = jax.jit(lambda pr, ex: model.apply({"params": pr}, ex))

    def embed(audio: np.ndarray, sample_rate: int) -> np.ndarray:
        examples = vggish_log_mel(audio, sample_rate)
        return np.asarray(fwd(params, examples))  # (n_patches, 128)

    return embed
