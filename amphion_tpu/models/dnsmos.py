"""Native DNSMOS P.835: trainable CNN quality model + scoring protocol.

Reference capability: the Emilia pipeline's quality gate runs Microsoft's
DNSMOS ONNX CNN over each VAD segment and keeps segments with
OVRL >= threshold (`/root/reference/preprocessors/Emilia/models/dnsmos.py`,
used at `main.py:338-371`). That graph scores P.835 SIG/BAK/OVRL from a
9.01 s, 16 kHz waveform. This module is the TPU-native equivalent:

- `dnsmos_logmel`: the published front end — librosa-semantics power mel
  (n_fft = frame_size+1 = 321, hop 160, 120 bands, slaney filterbank),
  `power_to_db(ref=max)` then `(x + 40) / 40` (ref dnsmos.py:53-75).
- `DNSMOSNet`: conv stack over the (T, 120) log-mel + global pooling +
  SIG/BAK/OVRL heads, in the 2-D CNN family of the DNSMOS paper
  (Reddy et al., ICASSP 2021/2022). Trainable in flax.
- `compute_score`: the reference's exact clip protocol — resample to
  16 kHz, repeat-pad to 9.01 s, walk 1 s hops, per-segment raw scores,
  P.835 polynomial mapping, segment means (ref dnsmos.py:106-180).
- ONNX ingestion: `onnx_to_dnsmos` maps a graph's Conv/Gemm initializers
  onto the flax params in topological order with shape checks
  (`utils/onnx_reader.py`); `bins/convert_checkpoint.py --model dnsmos`.

The polynomial constants are the published CC-BY DNS-Challenge values
(fixed calibration tables, like the mel-scale breakpoints).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLING_RATE = 16000
INPUT_LENGTH = 9.01

# P.835 raw→MOS polynomial maps (ref dnsmos.py:92-101)
_POLY = {
    False: {"ovr": (-0.06766283, 1.11546468, 0.04602535),
            "sig": (-0.08397278, 1.22083953, 0.0052439),
            "bak": (-0.13166888, 1.60915514, -0.39604546)},
    True: {"ovr": (-0.00533021, 0.005101, 1.18058466, -0.11236046),
           "sig": (-0.01019296, 0.02751166, 1.19576786, -0.24348726),
           "bak": (-0.04976499, 0.44276479, -0.1644611, 0.96883132)},
}


@dataclass(frozen=True)
class DNSMOSConfig:
    n_mels: int = 120
    frame_size: int = 320  # n_fft = frame_size + 1 (ref dnsmos.py:54)
    hop: int = 160
    channels: tuple[int, ...] = (32, 32, 64, 64)
    dense: tuple[int, ...] = (128, 64)
    dropout: float = 0.3


def _logmel_basis(cfg: DNSMOSConfig) -> np.ndarray:
    from amphion_tpu.ops.mel import mel_filterbank

    return mel_filterbank(SAMPLING_RATE, cfg.frame_size + 1, cfg.n_mels,
                          0.0, SAMPLING_RATE / 2)  # (n_mels, F)


def dnsmos_logmel(audio: jax.Array, cfg: DNSMOSConfig = DNSMOSConfig()
                  ) -> jax.Array:
    """(B, T) 16 kHz waveform → (B, frames, n_mels) normalized log-mel.

    librosa semantics: center=True reflect pad, hann(n_fft), POWER
    spectrogram, slaney filterbank, power_to_db(ref=max per clip,
    top_db=80), then ``(db + 40) / 40`` (ref dnsmos.py:53-75).
    """
    n_fft = cfg.frame_size + 1
    pad = n_fft // 2
    x = jnp.pad(audio, [(0, 0), (pad, pad)], mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // cfg.hop
    idx = (jnp.arange(n_frames)[:, None] * cfg.hop
           + jnp.arange(n_fft)[None, :])
    frames = x[:, idx]  # (B, N, n_fft)
    win = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    fw = frames * win
    k = jnp.arange(n_fft // 2 + 1)
    t = jnp.arange(n_fft)
    ang = 2.0 * jnp.pi * k[:, None] * t[None, :] / n_fft
    re = fw @ jnp.cos(ang).T  # (B, N, F)
    im = fw @ (-jnp.sin(ang)).T
    power = re * re + im * im
    melfb = jnp.asarray(_logmel_basis(cfg).T)  # (F, n_mels)
    mel = power @ melfb  # (B, N, n_mels)
    ref = jnp.max(mel, axis=(1, 2), keepdims=True)
    db = 10.0 * (jnp.log10(jnp.maximum(mel, 1e-10))
                 - jnp.log10(jnp.maximum(ref, 1e-10)))
    db = jnp.maximum(db, db.max(axis=(1, 2), keepdims=True) - 80.0)
    return (db + 40.0) / 40.0


class DNSMOSNet(nn.Module):
    """(B, frames, n_mels) log-mel → (B, 3) raw [SIG, BAK, OVRL]."""

    cfg: DNSMOSConfig = DNSMOSConfig()

    @nn.compact
    def __call__(self, logmel: jax.Array, train: bool = False) -> jax.Array:
        c = self.cfg
        h = logmel[..., None]  # (B, T, M, 1) — NHWC for 2-D convs
        for i, ch in enumerate(c.channels):
            h = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv_{i}")(h)
            h = nn.relu(h)
            if i % 2 == 1:  # pool after each conv pair (paper topology)
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
                h = nn.Dropout(c.dropout, deterministic=not train)(h)
        h = jnp.mean(h, axis=(1, 2))  # global average pool → (B, ch)
        for i, d in enumerate(c.dense):
            h = nn.relu(nn.Dense(d, name=f"dense_{i}")(h))
        return nn.Dense(3, name="head")(h)  # raw MOS scale ~[1, 5]


def get_polyfit_val(sig, bak, ovr, personalized: bool = False):
    p = _POLY[bool(personalized)]
    return (np.polyval(p["sig"], sig), np.polyval(p["bak"], bak),
            np.polyval(p["ovr"], ovr))


class DNSMOSScorer:
    """Callable clip scorer with the reference segment protocol.

    ``scorer(audio, sr)`` → dict with OVRL/SIG/BAK (+ raw) — drop-in for
    the reference's `ComputeScore.__call__` (dnsmos.py:106-180) and for
    the Emilia quality-gate slot (`data/emilia/pipeline.py` scorer).
    """

    def __init__(self, params, cfg: DNSMOSConfig = DNSMOSConfig(),
                 forward_fn=None):
        self.cfg = cfg
        self.params = params
        if forward_fn is not None:  # protocol tests swap the network
            self._fwd = forward_fn
        else:
            model = DNSMOSNet(cfg)
            self._fwd = jax.jit(lambda p, seg: model.apply(
                {"params": p}, dnsmos_logmel(seg, cfg)))

    def __call__(self, audio: np.ndarray, sampling_rate: int,
                 personalized: bool = False) -> dict:
        from amphion_tpu.data.audio_io import resample

        fs = SAMPLING_RATE
        audio = np.asarray(audio, np.float32)
        if sampling_rate != fs:
            audio = resample(audio, sampling_rate, fs)
        actual_len = len(audio)
        len_samples = int(INPUT_LENGTH * fs)
        while len(audio) < len_samples:
            audio = np.append(audio, audio)
        num_hops = int(np.floor(len(audio) / fs) - INPUT_LENGTH) + 1
        segs = []
        for idx in range(num_hops):
            seg = audio[int(idx * fs): int((idx + INPUT_LENGTH) * fs)]
            if len(seg) >= len_samples:
                segs.append(seg)
        raw = np.asarray(self._fwd(
            self.params, jnp.asarray(np.stack(segs))))  # (H, 3)
        sig_r, bak_r, ovr_r = raw[:, 0], raw[:, 1], raw[:, 2]
        sig, bak, ovr = get_polyfit_val(sig_r, bak_r, ovr_r, personalized)
        return {
            "filename": "audio_clip", "len_in_sec": actual_len / fs,
            "sr": fs, "num_hops": num_hops,
            "OVRL_raw": float(np.mean(ovr_r)),
            "SIG_raw": float(np.mean(sig_r)),
            "BAK_raw": float(np.mean(bak_r)),
            "OVRL": float(np.mean(ovr)), "SIG": float(np.mean(sig)),
            "BAK": float(np.mean(bak)),
        }


def make_dnsmos_gate(params=None, cfg: DNSMOSConfig = DNSMOSConfig(), *,
                     ckpt_dir: str = "", onnx_path: str = ""):
    """Emilia quality-gate slot filler: ``(clip, sr) -> OVRL`` using the
    model (vs the DSP `dnsmos_proxy` fallback in `data/emilia/stages.py`).
    Weight sources: a flax checkpoint dir, an ONNX file, or params."""
    if params is None:
        if ckpt_dir:
            from amphion_tpu.runtime.checkpoint import CheckpointManager

            tree, _, _ = CheckpointManager(ckpt_dir).restore_raw()
            params = tree["params"] if "params" in tree else tree
        elif onnx_path:
            from amphion_tpu.utils.onnx_reader import read_onnx

            params = onnx_to_dnsmos(read_onnx(onnx_path), cfg)
        else:
            raise ValueError("make_dnsmos_gate needs params, ckpt_dir, or "
                             "onnx_path")
    scorer = DNSMOSScorer(params, cfg)

    def gate(clip: np.ndarray, sr: int) -> float:
        return scorer(clip, sr)["OVRL"]

    return gate


# -- training ----------------------------------------------------------------


def dnsmos_train_step(model: DNSMOSNet, opt):
    """MSE regression on (logmel, [sig, bak, ovr]) targets — the DNSMOS
    recipe (the reference model was trained on crowdsourced P.835
    ratings; any rated corpus slots in here)."""
    import optax

    def loss_fn(params, logmel, target, rng):
        pred = model.apply({"params": params}, logmel, train=True,
                           rngs={"dropout": rng})
        return jnp.mean((pred - target) ** 2)

    @jax.jit
    def step(params, opt_state, logmel, target, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, logmel, target, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


# -- ONNX ingestion -----------------------------------------------------------


def onnx_to_dnsmos(graph, cfg: DNSMOSConfig = DNSMOSConfig()):
    """Map an ONNX graph's Conv/Gemm initializers → DNSMOSNet params.

    Walks weight-bearing nodes in graph order (`weights_in_graph_order`)
    and assigns them to our convs then denses, transposing layouts
    (ONNX Conv W (O, I, kH, kW) → flax (kH, kW, I, O); Gemm W with
    transB=1 is (O, I) → flax (I, O)). Shape-checked: a graph whose
    weight stack doesn't line up with `cfg` raises instead of silently
    mis-mapping. Fixed front-end tensors (DFT/mel matrices baked into
    graphs that consume raw waveform, like the reference's
    sig_bak_ovr.onnx) carry no Conv/Gemm weights of their own mel shape
    and are skipped by the node filter.
    """
    model = DNSMOSNet(cfg)
    n_frames = 1 + int(INPUT_LENGTH * SAMPLING_RATE) // cfg.hop
    ref = model.init(jax.random.key(0),
                     jnp.zeros((1, n_frames, cfg.n_mels)))["params"]

    conv_names = [f"conv_{i}" for i in range(len(cfg.channels))]
    dense_names = [f"dense_{i}" for i in range(len(cfg.dense))] + ["head"]

    entries = graph.weights_in_graph_order()
    convs = [(n, ws) for n, ws in entries if n.op_type == "Conv"]
    denses = [(n, ws) for n, ws in entries
              if n.op_type in ("Gemm", "MatMul")]
    if len(convs) != len(conv_names) or len(denses) != len(dense_names):
        raise ValueError(
            f"graph has {len(convs)} convs / {len(denses)} denses; "
            f"DNSMOSNet({cfg.channels}, {cfg.dense}) needs "
            f"{len(conv_names)} / {len(dense_names)}")

    params = jax.tree_util.tree_map(lambda x: x, ref)  # copy structure
    for name, (node, ws) in zip(conv_names, convs):
        w = ws[0]
        kernel = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        if kernel.shape != ref[name]["kernel"].shape:
            raise ValueError(f"{name}: onnx {kernel.shape} vs flax "
                             f"{ref[name]['kernel'].shape}")
        bias = (ws[1] if len(ws) > 1
                else np.zeros(kernel.shape[-1])).astype(np.float32)
        params[name] = {"kernel": jnp.asarray(kernel),
                        "bias": jnp.asarray(bias)}
    for name, (node, ws) in zip(dense_names, denses):
        w = np.asarray(ws[0], np.float32)
        if node.op_type == "Gemm" and node.attrs.get("transB", 0):
            w = w.T  # (O, I) → (I, O)
        if w.shape != ref[name]["kernel"].shape:
            raise ValueError(f"{name}: onnx {w.shape} vs flax "
                             f"{ref[name]['kernel'].shape}")
        bias = (ws[1] if len(ws) > 1
                else np.zeros(w.shape[-1])).astype(np.float32)
        params[name] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(bias)}
    return params
