"""Native GE2E voice encoder (the Resemblyzer model family).

Reference capability: `evaluation/metrics/similarity/speaker_similarity.py:149-164`
uses `resemblyzer.VoiceEncoder` — a 3-layer LSTM(40 mel -> 256) + Linear
+ ReLU + L2-norm GE2E d-vector encoder with 1.6 s partial-utterance
windows averaged into one utterance embedding. This is a
checkpoint-compatible flax re-implementation (converter
`torch_ge2e_to_flax` maps the published `pretrained.pt` layout:
`lstm.weight_ih_l{0..2}`/`weight_hh`/`bias_*`, `linear.{weight,bias}`).

TPU notes: all partial windows of an utterance are stacked and run as ONE
batched `nn.RNN` scan (static 160-frame length); the 40-mel front end is
a windowed-DFT conv (librosa power-mel semantics: center=True reflect
pad, hann 400/160, slaney filterbank, power 2, NO log — resemblyzer
`audio.py:wav_to_mel_spectrogram`). The silence-trim step of
`preprocess_wav` (webrtcvad there) maps to our native hybrid VAD
(`data/emilia/stages.py`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.ops.mel import mel_filterbank
from amphion_tpu.ops.stft import _dft_kernel


@dataclass(frozen=True)
class GE2EConfig:
    n_mel: int = 40
    hidden: int = 256
    num_layers: int = 3
    embed_dim: int = 256
    sample_rate: int = 16000
    n_fft: int = 400           # 25 ms window
    hop: int = 160             # 10 ms step
    partial_frames: int = 160  # 1.6 s partial utterances
    overlap: float = 0.5
    min_coverage: float = 0.75


class GE2EEncoder(nn.Module):
    """mels (B, T, 40) -> L2-normalized (B, 256) d-vectors.

    The d-vector is the LAST layer's final hidden state (== its output at
    the final step) -> Linear -> ReLU -> L2 normalize (resemblyzer
    `voice_encoder.py:60-66`).
    """

    cfg: GE2EConfig = GE2EConfig()

    @nn.compact
    def __call__(self, mels):
        h = mels
        for i in range(self.cfg.num_layers):
            # name the CELL (params bind at the cell's scope; nn.RNN is
            # just the scan driver)
            h = nn.RNN(nn.OptimizedLSTMCell(self.cfg.hidden,
                                            name=f"lstm_{i}"))(h)
        raw = jax.nn.relu(
            nn.Dense(self.cfg.embed_dim, name="linear")(h[:, -1, :]))
        return raw / jnp.maximum(
            jnp.linalg.norm(raw, axis=-1, keepdims=True), 1e-12)


@functools.partial(jax.jit, static_argnums=(1,))
def ge2e_mel(y: jax.Array, cfg: GE2EConfig) -> jax.Array:
    """librosa.feature.melspectrogram(..., n_fft=400, hop=160, n_mels=40)
    on (B, T) audio -> (B, frames, 40) POWER mel (no log), center=True."""
    if y.ndim == 1:
        y = y[None]
    pad = cfg.n_fft // 2
    y = jnp.pad(y.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    kernel = jnp.asarray(_dft_kernel(cfg.n_fft, cfg.n_fft))
    out = jax.lax.conv_general_dilated(
        y[:, None, :], kernel[:, None, :], window_strides=(cfg.hop,),
        padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    f = cfg.n_fft // 2 + 1
    power = out[:, :f, :] ** 2 + out[:, f:, :] ** 2
    basis = jnp.asarray(mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.n_mel, 0.0, cfg.sample_rate / 2.0))
    mel = jnp.einsum("mf,bfn->bmn", basis, power,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.transpose(mel, (0, 2, 1))


def compute_partial_slices(n_samples: int, cfg: GE2EConfig = GE2EConfig()):
    """resemblyzer `voice_encoder.py:compute_partial_slices`: (wav_slices,
    mel_slices) of 160-frame windows stepping 80 frames; the last window
    is kept only if it covers >= min_coverage of real samples."""
    spf = cfg.hop
    n_frames = int(np.ceil((n_samples + 1) / spf))
    step = max(int(np.round(cfg.partial_frames * (1.0 - cfg.overlap))), 1)
    wav_slices, mel_slices = [], []
    steps = max(1, n_frames - cfg.partial_frames + step + 1)
    for i in range(0, steps, step):
        mel_range = np.array([i, i + cfg.partial_frames])
        wav_range = mel_range * spf
        mel_slices.append(slice(*mel_range))
        wav_slices.append(slice(*wav_range))
    last = wav_slices[-1]
    coverage = (n_samples - last.start) / (last.stop - last.start)
    if coverage < cfg.min_coverage and len(mel_slices) > 1:
        mel_slices, wav_slices = mel_slices[:-1], wav_slices[:-1]
    return wav_slices, mel_slices


def normalize_volume(wav: np.ndarray, target_dbfs: float = -30.0,
                     increase_only: bool = True) -> np.ndarray:
    """resemblyzer `audio.py:normalize_volume` (increase_only default of
    preprocess_wav)."""
    rms = float(np.sqrt(np.mean(wav ** 2) + 1e-12))
    dbfs_change = target_dbfs - 20.0 * np.log10(max(rms, 1e-12))
    if dbfs_change < 0 and increase_only:
        return wav
    return wav * (10.0 ** (dbfs_change / 20.0))


def embed_utterance(apply_fn, audio: np.ndarray,
                    cfg: GE2EConfig = GE2EConfig()) -> np.ndarray:
    """resemblyzer `VoiceEncoder.embed_utterance`: zero-pad to the last
    window, mel the whole utterance once, batch every partial window into
    ONE device call, mean the partial d-vectors, renormalize."""
    audio = np.asarray(audio, np.float32)
    wav_slices, mel_slices = compute_partial_slices(len(audio), cfg)
    max_end = wav_slices[-1].stop
    if max_end >= len(audio):
        audio = np.pad(audio, (0, max_end - len(audio)), "constant")
    mel = np.asarray(ge2e_mel(jnp.asarray(audio), cfg))[0]
    batch = np.stack([mel[s] for s in mel_slices])
    partials = np.asarray(apply_fn(jnp.asarray(batch)))
    raw = partials.mean(axis=0)
    return raw / max(float(np.linalg.norm(raw)), 1e-12)
