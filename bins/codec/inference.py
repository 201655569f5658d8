"""Codec inference CLI (reference: `bins/codec/inference.py` — FAcodec
reconstruction and zero-shot voice conversion via the redecoder).

Modes:
- reconstruct (default): --source wav → encode → decode → wav
- voice conversion: --source + --reference → FACodec redecode with the
  reference's timbre (ref `FACodecRedecoder` facodec.py:602)

Model is selected by ``cfg.model_type`` (AmphionCodec/VQVAE or
FAcodec/FACodec), construction mirrors bins/codec/train.py.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.audio_io import load_wav, save_wav
from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


def _codec_cfg(cfg) -> CodecConfig:
    p = cfg.preprocess
    m = cfg.model.get("codec", None)
    return CodecConfig(
        sample_rate=p.sample_rate,
        strides=tuple(m.strides) if m else (2, 4, 5, 6),
        num_quantizers=m.num_quantizers if m else 8,
        codebook_size=m.codebook_size if m else 1024,
        codebook_dim=m.codebook_dim if m else 8,
        encoder_dim=m.get("encoder_dim", 32) if m else 32,
        latent_dim=m.get("latent_dim", 256) if m else 256,
        decoder_dim=m.get("decoder_dim", 32) if m else 32,
    )


def build_model(cfg):
    codec_cfg = _codec_cfg(cfg)
    if cfg.model_type in ("FAcodec", "FACodec"):
        from amphion_tpu.models.codec.facodec import FACodec, FACodecConfig

        f = cfg.model.get("facodec", None)
        model = FACodec(FACodecConfig(
            codec=codec_cfg,
            prosody_layers=f.get("prosody_layers", 1) if f else 1,
            content_layers=f.get("content_layers", 2) if f else 2,
            detail_layers=f.get("detail_layers", 3) if f else 3,
            codebook_size=codec_cfg.codebook_size,
            codebook_dim=codec_cfg.codebook_dim,
            timbre_dim=f.get("timbre_dim", 256) if f else 256,
            num_speakers=f.get("num_speakers", 2) if f else 2,
            grl_scale=f.get("grl_scale", 1.0) if f else 1.0,
        ))
    else:
        model = AmphionCodec(codec_cfg)
    return model, codec_cfg


def _load_audio(path, codec_cfg) -> np.ndarray:
    x, _ = load_wav(path, sr=codec_cfg.sample_rate)
    t = max(len(x) // codec_cfg.hop * codec_cfg.hop, codec_cfg.hop)
    return x[:t][None]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--source", required=True, help="source audio")
    parser.add_argument("--reference", default="",
                        help="reference audio (FACodec voice conversion)")
    parser.add_argument("--output_dir", required=True)
    args = parser.parse_args()
    cfg = load_config(args.config)
    logger = get_logger("codec-inference")

    model, codec_cfg = build_model(cfg)
    tree, epoch, step = CheckpointManager(args.checkpoint_path).restore_raw()
    params = tree["g"]["params"] if "g" in tree else tree["params"]
    logger.info(f"restored {cfg.model_type} from epoch {epoch} step {step}")

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    src = _load_audio(args.source, codec_cfg)

    if args.reference:
        if cfg.model_type not in ("FAcodec", "FACodec"):
            raise SystemExit("--reference (VC) requires model_type FAcodec")
        ref = _load_audio(args.reference, codec_cfg)
        vc = jax.jit(lambda p, s, r: model.apply(
            {"params": p}, s, r, method=type(model).voice_conversion))
        wav = np.asarray(vc(params, jnp.asarray(src), jnp.asarray(ref)))[0]
        out = out_dir / f"{Path(args.source).stem}_to_{Path(args.reference).stem}.wav"
    else:
        if cfg.model_type in ("FAcodec", "FACodec"):
            recon_fn = jax.jit(lambda p, a: model.apply(
                {"params": p}, a)[0])
        else:
            recon_fn = jax.jit(lambda p, a: model.apply({"params": p}, a)[0])
        wav = np.asarray(recon_fn(params, jnp.asarray(src)))[0]
        out = out_dir / f"{Path(args.source).stem}_recon.wav"

    save_wav(out, np.squeeze(wav), codec_cfg.sample_rate)
    logger.info(f"wrote {out}")


if __name__ == "__main__":
    main()
