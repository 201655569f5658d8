"""Vocoder inference CLI (reference: `bins/vocoder/inference.py` +
`models/vocoders/vocoder_inference.py:78` — from_dataset / from_feature /
from_audio modes). Copy-synthesis: audio → mel (device DSP) → generator →
wav files."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.audio_io import load_wav, save_wav
from amphion_tpu.data.metadata import load_metadata
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.runtime.vocoder_trainer import build_generator
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


import functools


@functools.lru_cache(maxsize=1)
def _jitted_synth(generator):
    return jax.jit(
        lambda p, m: generator.apply({"params": p}, m), static_argnums=()
    )


def synthesize_file(generator, params, wav_path, mel_cfg, out_path):
    x, _ = load_wav(wav_path, sr=mel_cfg.sample_rate)
    t = max(len(x) // mel_cfg.hop_size * mel_cfg.hop_size, mel_cfg.hop_size)
    mel = mel_spectrogram(jnp.asarray(x[:t])[None], mel_cfg).transpose(0, 2, 1)
    wav = _jitted_synth(generator)(params, mel)
    save_wav(out_path, np.asarray(wav)[0], mel_cfg.sample_rate)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="exp")
    parser.add_argument("--checkpoint_path", default="")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--mode", default="from_dataset",
                        choices=["from_dataset", "from_audio", "from_feature"])
    parser.add_argument("--audio_dir", default="")
    parser.add_argument("--feature_dir", default="",
                        help="dir of per-uid mel .npy (n_mel, N) or (N, n_mel)"
                             " for --mode from_feature")
    parser.add_argument("--infer_testing_set", default="test")
    args = parser.parse_args()
    cfg = load_config(args.config)
    logger = get_logger("vocoder_infer")
    mel_cfg = MelConfig.from_preprocess_cfg(cfg.preprocess)
    generator, _ = build_generator(cfg, cfg.preprocess.n_mel)

    # restore generator params from the {"g": ..., "d": ...} training ckpt
    ckpt_dir = (
        Path(args.checkpoint_path)
        if args.checkpoint_path
        else Path(cfg.get("log_dir", "ckpts")) / args.exp_name / "checkpoint"
    )
    mgr = CheckpointManager(ckpt_dir)
    tree, epoch, step = mgr.restore_raw()
    params = tree["g"]["params"]
    logger.info(f"restored generator from epoch {epoch} step {step}")

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    if args.mode == "from_audio":
        wavs = sorted(Path(args.audio_dir).glob("*.wav"))
        for w in wavs:
            synthesize_file(generator, params, w, mel_cfg, out / w.name)
            logger.info(f"wrote {out / w.name}")
    elif args.mode == "from_feature":
        # pre-extracted mel features (ref vocoder_inference.py:175-241
        # 'from_feature' mode — acoustic-model outputs or offline extraction)
        assert args.feature_dir, "--feature_dir required for from_feature"
        synth = _jitted_synth(generator)
        for f in sorted(Path(args.feature_dir).glob("*.npy")):
            mel = np.load(f).astype(np.float32)
            if mel.shape[0] == mel_cfg.n_mel:  # (n_mel, N) → (N, n_mel)
                mel = mel.T
            wav = synth(params, jnp.asarray(mel)[None])
            save_wav(out / f"{f.stem}.wav", np.asarray(wav)[0],
                     mel_cfg.sample_rate)
            logger.info(f"wrote {out / (f.stem + '.wav')}")
    else:
        for ds in cfg.dataset:
            meta = Path(cfg.preprocess.processed_dir) / ds / f"{args.infer_testing_set}.json"
            for u in load_metadata(meta):
                synthesize_file(
                    generator, params, u.path, mel_cfg, out / f"{u.uid}.wav"
                )
        logger.info(f"synthesized test sets into {out}")


if __name__ == "__main__":
    main()
