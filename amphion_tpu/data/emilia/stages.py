"""Native default implementations of the Emilia pipeline's model stages.

The reference pipeline (preprocessors/Emilia/main.py) relies on pretrained
torch checkpoints: UVR-MDX source separation, pyannote diarization, and a
DNSMOS ONNX quality model — none of which can be downloaded here. These
are signal-processing equivalents with the same stage contracts, so the
pipeline is useful out of the box; checkpoint-backed callables can still
be plugged into the same ``EmiliaPipeline`` slots.

- ``spectral_gate_separator``: vocal/noise separation by spectral gating —
  a minimum-statistics noise PSD estimate per frequency bin, a soft
  time-frequency mask, and overlap-add resynthesis (the classic
  noisereduce/Audacity algorithm). Fills the UVR-MDX slot for denoising
  in-the-wild audio (it does not split overlapping music stems).
- ``spectral_diarizer``: single-channel speaker-turn detection — mel
  embeddings over 1 s windows, agglomerative 2..K clustering chosen by a
  BIC-style penalty, merged into contiguous turns. Fills the pyannote slot.
- ``dnsmos_proxy``: [1, 5] quality score from SNR, spectral flatness,
  clipping ratio, and silence ratio. Fills the DNSMOS filter slot
  (ref main.py:338-371 filters segments by DNSMOS P.835 OVRL).
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-10


def _stft(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n)[:, None]
    frames = x[idx] * np.hanning(n_fft)
    return np.fft.rfft(frames, axis=1)  # (T, F)


def _istft(spec: np.ndarray, n_fft: int, hop: int, length: int) -> np.ndarray:
    win = np.hanning(n_fft)
    frames = np.fft.irfft(spec, n=n_fft, axis=1) * win
    out = np.zeros(hop * (len(frames) - 1) + n_fft)
    norm = np.zeros_like(out)
    for i, f in enumerate(frames):
        out[i * hop:i * hop + n_fft] += f
        norm[i * hop:i * hop + n_fft] += win ** 2
    out = out / np.maximum(norm, 1e-8)
    pad = n_fft // 2
    return out[pad:pad + length]


def spectral_gate_separator(x: np.ndarray, sr: int = 24000,
                            n_fft: int = 1024, hop: int = 256,
                            reduction_db: float = 18.0,
                            noise_percentile: float = 50.0) -> np.ndarray:
    """Suppress stationary background (hum, hiss, room tone) around speech.

    The noise floor is the per-bin *median* magnitude over time: for bins
    where speech is present less than half the time it equals the noise
    level (a lower percentile would sit ~12 dB under the Rayleigh noise
    mean and let most noise through the 6 dB knee)."""
    spec = _stft(x.astype(np.float64), n_fft, hop)
    mag = np.abs(spec)
    noise = np.percentile(mag, noise_percentile, axis=0, keepdims=True)
    # soft mask: sigmoid in dB distance above the noise floor
    dist_db = 20 * np.log10((mag + _EPS) / (noise + _EPS))
    mask = 1.0 / (1.0 + np.exp(-(dist_db - 6.0)))  # 6 dB knee
    floor = 10 ** (-reduction_db / 20)
    mask = floor + (1 - floor) * mask
    return _istft(spec * mask, n_fft, hop, len(x)).astype(np.float32)


def _mel_embed(x: np.ndarray, sr: int, win_s: float = 1.0,
               hop_s: float = 0.5, n_mel: int = 24):
    """Per-window log-mel mean+std embeddings -> (n_windows, 2*n_mel)."""
    n_fft, hop = 512, 256
    spec = np.abs(_stft(x.astype(np.float64), n_fft, hop)) ** 2
    freqs = np.fft.rfftfreq(n_fft, 1 / sr)
    mel_pts = 2595 * np.log10(1 + freqs / 700)
    edges = np.linspace(mel_pts.min(), mel_pts.max(), n_mel + 2)
    fb = np.zeros((len(freqs), n_mel))
    for m in range(n_mel):
        lo, ce, hi = edges[m], edges[m + 1], edges[m + 2]
        up = (mel_pts - lo) / max(ce - lo, 1e-6)
        dn = (hi - mel_pts) / max(hi - ce, 1e-6)
        fb[:, m] = np.clip(np.minimum(up, dn), 0, 1)
    logmel = np.log(spec @ fb + _EPS)  # (T, n_mel)
    energy = logmel.mean(1)
    # spectral shape only: remove per-frame loudness (cepstral-mean style),
    # so syllabic amplitude modulation doesn't masquerade as speaker change
    shape = logmel - logmel.mean(1, keepdims=True)
    frames_per_win = max(int(win_s * sr / hop), 1)
    frames_per_hop = max(int(hop_s * sr / hop), 1)
    embeds, times = [], []
    for s in range(0, max(len(shape) - frames_per_win + 1, 1), frames_per_hop):
        w, e = shape[s:s + frames_per_win], energy[s:s + frames_per_win]
        voiced = e >= np.median(e)  # embed over the energetic frames only
        w = w[voiced] if voiced.any() else w
        embeds.append(w.mean(0))
        times.append(s * hop / sr)
    return np.asarray(embeds), np.asarray(times), win_s


def spectral_diarizer(x: np.ndarray, sr: int = 24000,
                      max_speakers: int = 4,
                      min_turn_s: float = 1.5) -> list[tuple[float, float, str]]:
    """Speaker turns [(start_s, end_s, 'spkN')] via embedding clustering."""
    if len(x) < sr:  # < 1 s: one speaker
        return [(0.0, len(x) / sr, "spk0")]
    embeds, times, win_s = _mel_embed(x, sr)
    if len(embeds) < 4:
        return [(0.0, len(x) / sr, "spk0")]
    # cluster in RAW log-mel-shape space: absolute distances are meaningful
    # (log units), so a minimum center separation rejects spurious splits
    # that z-scored features would amplify
    z = embeds

    def _kmeans(k, iters=30, seed=0):
        rng = np.random.default_rng(seed)
        c = z[rng.choice(len(z), k, replace=False)]
        for _ in range(iters):
            d = ((z[:, None] - c[None]) ** 2).sum(-1)
            a = d.argmin(1)
            newc = np.stack([z[a == j].mean(0) if (a == j).any() else c[j]
                             for j in range(k)])
            if np.allclose(newc, c):
                break
            c = newc
        inertia = ((z - c[a]) ** 2).sum()
        return a, inertia

    # accept k>1 only with strong Calinski-Harabasz support AND well-
    # separated centers (>= ~min_sep log-mel L2 between cluster means)
    n = len(z)
    min_sep = 4.0
    total_ss = ((z - z.mean(0)) ** 2).sum()
    labels = np.zeros(n, dtype=int)
    best_ch = 0.0
    for k in range(2, min(max_speakers, n // 2) + 1):
        a, inertia = _kmeans(k)
        if inertia <= _EPS or n <= k:
            continue
        centers = np.stack([z[a == j].mean(0) for j in range(k)
                            if (a == j).any()])
        if len(centers) < k:
            continue
        sep = min(np.linalg.norm(centers[i] - centers[j])
                  for i in range(k) for j in range(i + 1, k))
        ch = ((total_ss - inertia) / (k - 1)) / (inertia / (n - k))
        if ch > max(best_ch, 10.0) and sep > min_sep:
            labels, best_ch = a, ch
    # merge consecutive same-label windows into turns
    turns: list[tuple[float, float, str]] = []
    start, cur = times[0], labels[0]
    for t, lab in zip(times[1:], labels[1:]):
        if lab != cur:
            turns.append((start, t, f"spk{cur}"))
            start, cur = t, lab
    turns.append((start, len(x) / sr, f"spk{cur}"))
    # absorb sub-minimum turns into the previous one
    merged: list[tuple[float, float, str]] = []
    for t in turns:
        if merged and (t[1] - t[0]) < min_turn_s:
            merged[-1] = (merged[-1][0], t[1], merged[-1][2])
        else:
            merged.append(t)
    return merged


def _merge_turns(times, labels, total_s, min_turn_s):
    """Consecutive same-label windows → [(start, end, 'spkN')] turns."""
    turns: list[tuple[float, float, str]] = []
    start, cur = times[0], labels[0]
    for t, lab in zip(times[1:], labels[1:]):
        if lab != cur:
            turns.append((start, t, f"spk{cur}"))
            start, cur = t, lab
    turns.append((start, total_s, f"spk{cur}"))
    merged: list[tuple[float, float, str]] = []
    for t in turns:
        if merged and (t[1] - t[0]) < min_turn_s:
            merged[-1] = (merged[-1][0], t[1], merged[-1][2])
        else:
            merged.append(t)
    return merged


def neural_diarizer(x: np.ndarray, sr: int = 24000, *, embedder,
                    win_s: float = 1.5, hop_s: float = 0.75,
                    max_speakers: int = 8, min_turn_s: float = 1.0,
                    n_speakers: int | None = None,
                    ) -> list[tuple[float, float, str]]:
    """Speaker turns via spectral clustering over neural speaker embeddings
    — the pyannote-slot upgrade (ref `preprocessors/Emilia/main.py:131-168`
    diarization stage). ``embedder``: (audio, sr) -> (D,), e.g.
    `evaluation.metrics.similarity.native_wavlm_embedder` (WavLM-SV).

    Method (standard speaker-diarization recipe): sliding-window
    embeddings → single-speaker guard on the raw cosine affinity →
    MEAN-CENTERED embeddings (removes the shared channel/noise-floor
    component, which otherwise dominates the affinity under background
    noise) → cosine affinity → row-thresholded symmetrized affinity →
    normalized-Laplacian near-zero-eigenvalue count for the speaker
    count → k-means in the spectral embedding → contiguous-turn merge.

    ``n_speakers`` pins the cluster count (oracle-count mode — the
    convention of many published DER benchmarks); auto mode can split a
    noisy single-speaker clip that defeats the raw-affinity guard."""
    total_s = len(x) / sr
    win, hop = int(win_s * sr), int(hop_s * sr)
    if len(x) < 2 * win:
        return [(0.0, total_s, "spk0")]
    starts = list(range(0, len(x) - win + 1, hop))
    embeds = np.stack([np.asarray(embedder(x[s:s + win], sr))
                       for s in starts])
    # a window's label describes its CENTER; using centers as turn times
    # halves the boundary bias vs window starts
    times = np.asarray(starts) / sr + win_s / 2
    n = len(embeds)
    if n < 4:
        return [(0.0, total_s, "spk0")]

    raw = embeds / np.maximum(
        np.linalg.norm(embeds, axis=1, keepdims=True), 1e-12)
    raw_aff = np.clip(raw @ raw.T, -1.0, 1.0)
    if n_speakers is None and float(raw_aff.min()) > 0.9:
        # every window pair is near-identical → one speaker (centering
        # would amplify residual noise into fake clusters)
        return [(0.0, total_s, "spk0")]

    centered = embeds - embeds.mean(axis=0)
    e = centered / np.maximum(
        np.linalg.norm(centered, axis=1, keepdims=True), 1e-12)
    aff = np.clip(e @ e.T, -1.0, 1.0)
    np.fill_diagonal(aff, 1.0)
    # row-wise refinement: keep each row's strongest 25% similarities
    thresh = np.percentile(aff, 75, axis=1, keepdims=True)
    aff = np.where(aff >= thresh, aff, 0.0)
    aff = np.maximum(aff, aff.T)  # symmetrize
    d = np.maximum(aff.sum(axis=1), 1e-12)
    lap = np.eye(n) - aff / np.sqrt(d)[:, None] / np.sqrt(d)[None, :]
    evals, evecs = np.linalg.eigh(lap)
    kmax = min(max_speakers, n - 1)
    if n_speakers is not None:
        k = min(int(n_speakers), kmax)
    else:
        # near-zero eigenvalue count ≈ connected components of the
        # refined affinity graph
        k = min(int(np.sum(evals < 0.15)), kmax)
    if k <= 1:
        return [(0.0, total_s, "spk0")]
    spec = evecs[:, :k]
    spec = spec / np.maximum(np.linalg.norm(spec, axis=1, keepdims=True),
                             1e-12)
    rng = np.random.default_rng(0)
    c = spec[rng.choice(n, k, replace=False)]
    for _ in range(50):
        a = ((spec[:, None] - c[None]) ** 2).sum(-1).argmin(1)
        newc = np.stack([spec[a == j].mean(0) if (a == j).any() else c[j]
                         for j in range(k)])
        if np.allclose(newc, c):
            break
        c = newc
    turns = _merge_turns(times, a, total_s, min_turn_s)
    # stretch the first turn back to 0 (its window covers the clip start)
    return [(0.0 if i == 0 else s, e_, spk)
            for i, (s, e_, spk) in enumerate(turns)]


def diarization_error_rate(ref_turns, hyp_turns, total_s: float,
                           step: float = 0.01) -> float:
    """Frame-based DER with optimal speaker-label mapping (Hungarian on the
    frame-confusion matrix) — the quality gauge for the diarizer stages."""
    from scipy.optimize import linear_sum_assignment

    t = np.arange(0.0, total_s, step)

    def label_frames(turns):
        lab = np.full(len(t), -1)
        names: dict[str, int] = {}
        for s, e_, spk in turns:
            names.setdefault(spk, len(names))
            lab[(t >= s) & (t < e_)] = names[spk]
        return lab, len(names)

    ref, n_ref = label_frames(ref_turns)
    hyp, n_hyp = label_frames(hyp_turns)
    conf = np.zeros((n_ref, n_hyp))
    for i in range(n_ref):
        for j in range(n_hyp):
            conf[i, j] = np.sum((ref == i) & (hyp == j))
    ri, ci = linear_sum_assignment(-conf)
    correct = conf[ri, ci].sum()
    scored = np.sum(ref >= 0)
    return float(1.0 - correct / max(scored, 1))


def hybrid_vad(
    x: np.ndarray,
    sr: int,
    frame_ms: float = 30.0,
    threshold_db: float = -40.0,
    entropy_gate: float = 0.92,
    min_speech_s: float = 0.3,
    max_segment_s: float = 30.0,
    hangover_frames: int = 8,
) -> list[tuple[float, float]]:
    """Energy + spectral-entropy hybrid VAD (silero-slot upgrade, ref
    `preprocessors/Emilia/main.py` VAD stage): a frame is speech when it is
    BOTH energetic (relative to the clip's 95th-percentile level) and
    spectrally structured (normalized spectral entropy below the gate —
    voiced/fricative speech concentrates energy; hiss and room tone are
    near-flat at ~1.0). Same [(start_s, end_s)] contract as `energy_vad`,
    robust to broadband noise that energy alone passes."""
    frame = int(sr * frame_ms / 1000)
    n = len(x) // frame
    if n == 0:
        return []
    frames = x[: n * frame].reshape(n, frame) * np.hanning(frame)
    e_db = 20 * np.log10(np.sqrt(np.mean(frames ** 2, axis=1)) + 1e-8)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    p = spec / np.maximum(spec.sum(axis=1, keepdims=True), _EPS)
    ent = -np.sum(p * np.log(p + _EPS), axis=1) / np.log(spec.shape[1])
    ref = np.percentile(e_db, 95)
    active = (e_db > max(ref + threshold_db, -60.0)) & (ent < entropy_gate)
    segs, start, quiet = [], None, 0
    for i, a in enumerate(active):
        if a:
            if start is None:
                start = i
            quiet = 0
        elif start is not None:
            quiet += 1
            if quiet > hangover_frames:
                segs.append((start, i - quiet))
                start, quiet = None, 0
    if start is not None:
        segs.append((start, n))
    out = []
    for s, t in segs:
        if (t - s) * frame / sr < min_speech_s:
            continue
        s_t, e_t = s * frame / sr, t * frame / sr
        while e_t - s_t > max_segment_s:
            out.append((s_t, s_t + max_segment_s))
            s_t += max_segment_s
        out.append((s_t, e_t))
    return out


def dnsmos_proxy(x: np.ndarray, sr: int = 24000) -> float:
    """[1, 5] overall-quality proxy (ref filters at DNSMOS OVRL >= 3.0)."""
    from amphion_tpu.data.emilia.pipeline import energy_vad, estimate_snr

    if len(x) < sr // 10:
        return 1.0
    snr = estimate_snr(x, sr)  # 0..60 dB
    spec = np.abs(_stft(x.astype(np.float64), 512, 256)) ** 2
    flat = np.exp(np.mean(np.log(spec + _EPS), axis=1)) / (spec.mean(1) + _EPS)
    flatness = float(np.median(flat))  # ~1 white noise, ~0 harmonic
    clip_ratio = float(np.mean(np.abs(x) > 0.985))
    speech = sum(e - s for s, e in energy_vad(x, sr))
    speech_ratio = speech / (len(x) / sr)
    score = 1.0
    score += 2.0 * np.clip(snr / 40.0, 0, 1)          # up to +2 for clean
    score += 1.0 * (1.0 - np.clip(flatness * 4, 0, 1))  # harmonicity
    score += 1.0 * np.clip(speech_ratio * 1.5, 0, 1)  # mostly speech
    score -= 2.0 * np.clip(clip_ratio * 50, 0, 1)     # clipping penalty
    return float(np.clip(score, 1.0, 5.0))


def make_mdx_separator(variables=None, cfg=None, *, ckpt_dir: str = "",
                       sr: int = 24000, chunks: int = 15,
                       denoise: bool = True):
    """Checkpoint-backed UVR-MDX slot filler: returns ``x -> vocals`` for
    ``EmiliaPipeline(separator=...)`` using the native trainable Conv-TDF
    network (`amphion_tpu/models/mdx_net.py`), with the reference's
    44.1 kHz resample + stereo-duplicate + channel-0 protocol
    (ref preprocessors/Emilia/main.py:95-126)."""
    from amphion_tpu.data.audio_io import resample
    from amphion_tpu.models.mdx_net import MDXConfig, MDXSeparator

    cfg = cfg or MDXConfig()
    if variables is None:
        if not ckpt_dir:
            raise ValueError("make_mdx_separator needs variables or "
                             "ckpt_dir (a trained ConvTDFNet checkpoint "
                             "dir, or a UVR-MDX .onnx file)")
        if str(ckpt_dir).endswith(".onnx"):
            from amphion_tpu.models.mdx_net import onnx_to_conv_tdf
            from amphion_tpu.utils.onnx_reader import read_onnx

            variables = onnx_to_conv_tdf(read_onnx(ckpt_dir), cfg)
        else:
            from amphion_tpu.runtime.checkpoint import CheckpointManager

            tree, _, _ = CheckpointManager(ckpt_dir).restore_raw()
            variables = {"params": tree["params"],
                         "batch_stats": tree.get("batch_stats", {})}
    sep = MDXSeparator(variables, cfg, chunks=chunks, denoise=denoise)

    def separate(x: np.ndarray) -> np.ndarray:
        mix = resample(np.asarray(x, np.float32), sr, MDXSeparator.SR)
        vocals, _ = sep.predict(mix)
        return resample(vocals[:, 0].astype(np.float32),
                        MDXSeparator.SR, sr)

    return separate
