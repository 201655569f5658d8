"""Noro zero-shot VC inference CLI (reference:
`models/vc/Noro/noro_inference.py` + `egs/vc/Noro/noro_inference.sh`):
convert a source utterance to the reference speaker's voice with a trained
Noro checkpoint.

Pipeline (matching the reference): source content features + per-utterance
standardized F0 condition the diffusion; the reference mel drives the
speaker branch; the reverse SDE samples the converted mel, decoded by a GAN
vocoder checkpoint or Griffin-Lim.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.audio_io import load_wav, save_wav
from amphion_tpu.models.vc.noro import Noro, NoroConfig, noro_convert
from amphion_tpu.ops.dsp import mel_to_audio
from amphion_tpu.ops.f0 import F0Config, interpolate_f0, yin_f0
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


def build_model(cfg) -> Noro:
    """Same construction as `bins/vc/Noro/train.py` (keep in sync)."""
    p, m = cfg.preprocess, cfg.model
    return Noro(NoroConfig(
        n_mel=p.n_mel, content_dim=p.n_mel, ref_in_dim=p.n_mel,
        hidden=m.get("hidden", 256),
        ref_layers=m.get("ref_layers", 2),
        ref_heads=m.get("ref_heads", 4),
        ref_filter=m.get("ref_filter", 4 * m.get("hidden", 256)),
        wavenet_layers=m.get("num_layers", 12),
    ))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="noro")
    parser.add_argument("--checkpoint_path", default="",
                        help="explicit ckpt dir (else latest of exp_name)")
    parser.add_argument("--source_path", required=True, help="source voice")
    parser.add_argument("--ref_path", required=True, help="reference voice")
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--inference_steps", type=int, default=200,
                        help="reverse-SDE steps (ref uses 150-300)")
    parser.add_argument("--vocoder_ckpt", default="",
                        help="GAN vocoder ckpt dir (else Griffin-Lim)")
    parser.add_argument("--vocoder_config", default="",
                        help="vocoder exp config (else exp_config.json "
                             "next to --vocoder_ckpt)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    cfg = load_config(args.config)
    logger = get_logger("noro_infer")
    p = cfg.preprocess
    mel_cfg = MelConfig.from_preprocess_cfg(p)
    f0_cfg = F0Config.from_preprocess_cfg(p)

    model = build_model(cfg)
    exp_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name
    mgr = CheckpointManager(
        Path(args.checkpoint_path) if args.checkpoint_path
        else exp_dir / "checkpoint")
    # mgr already points at the right dir; latest() resolves both an
    # epoch-* dir and a parent checkpoint dir (ADVICE r1)
    tree, epoch, step = mgr.restore_raw()
    params = tree["params"]
    logger.info(f"restored epoch {epoch} step {step}")

    src, _ = load_wav(args.source_path, sr=p.sample_rate)
    ref, _ = load_wav(args.ref_path, sr=p.sample_rate)
    t = max(len(src) // p.hop_size, 1) * p.hop_size
    src_au = jnp.asarray(src[:t])[None]
    tr = max(len(ref) // p.hop_size, 1) * p.hop_size
    ref_au = jnp.asarray(ref[:tr])[None]

    content = mel_spectrogram(src_au, mel_cfg).transpose(0, 2, 1)
    ref_mel = mel_spectrogram(ref_au, mel_cfg).transpose(0, 2, 1)
    f0, _ = yin_f0(src_au, f0_cfg)
    # ref noro_inference.py: interpolate F0 through unvoiced regions BEFORE
    # per-utterance standardization (zero-mean/unit-std pitch —
    # speaker-independent prosody without unvoiced-zero spikes)
    f0, _ = interpolate_f0(f0)
    f0 = (f0 - jnp.mean(f0, axis=1, keepdims=True)) / (
        jnp.std(f0, axis=1, keepdims=True) + 1e-6)

    out_mel = noro_convert(
        model, params, content, f0, ref_mel, jax.random.key(args.seed),
        num_steps=args.inference_steps)

    if args.vocoder_ckpt:
        from amphion_tpu.runtime.vocoder_trainer import load_vocoder

        voc_fn, _ = load_vocoder(args.vocoder_ckpt, p.n_mel,
                                 args.vocoder_config, fallback_cfg=cfg)
        wav = voc_fn(out_mel)
    else:
        logger.info("no vocoder checkpoint: Griffin-Lim reconstruction")
        wav = mel_to_audio(out_mel.transpose(0, 2, 1), mel_cfg)
    save_wav(args.output_path, np.asarray(wav)[0], p.sample_rate)
    logger.info(f"wrote {args.output_path}")


if __name__ == "__main__":
    main()
