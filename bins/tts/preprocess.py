"""TTS preprocessing CLI (reference: `bins/tts/preprocess.py:229`):
corpus adapters → acoustic features → phone sequences (+ optional
augmentation)."""

from __future__ import annotations

import argparse
import faulthandler

from amphion_tpu.data.metadata import load_metadata
from amphion_tpu.data.preprocessors import preprocess_dataset
from amphion_tpu.data.processors.acoustic import extract_acoustic_features
from amphion_tpu.data.processors.phone import extract_phone_sequences
from amphion_tpu.ops.mel import MelConfig
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger

faulthandler.enable()


def extract_codes(utts, out_dir, cfg, codec_ckpt, logger):
    """Tokenize utterances with an AmphionCodec checkpoint → codes/*.npy
    (the VALL-E stage-0 feature; ref `egs/tts/VALLE` EnCodec tokenization)."""
    from pathlib import Path

    import jax
    import numpy as np

    from amphion_tpu.data.audio_io import load_wav
    from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
    from amphion_tpu.utils.tokenizer import AudioTokenizer

    m = cfg.model.get("codec", None)
    codec_cfg = CodecConfig(
        sample_rate=cfg.preprocess.sample_rate,
        strides=tuple(m.strides) if m else (2, 4, 5, 6),
        num_quantizers=m.num_quantizers if m else 8,
        codebook_size=m.codebook_size if m else 1024,
        codebook_dim=m.codebook_dim if m else 8,
        encoder_dim=m.get("encoder_dim", 32) if m else 32,
        latent_dim=m.get("latent_dim", 256) if m else 256,
        decoder_dim=m.get("decoder_dim", 32) if m else 32,
    )
    codec = AmphionCodec(codec_cfg)
    if codec_ckpt:
        from amphion_tpu.runtime.checkpoint import CheckpointManager

        tree, epoch, step = CheckpointManager(codec_ckpt).restore_raw()
        params = tree["g"]["params"]
        logger.info(f"codec restored from epoch {epoch} step {step}")
    else:
        logger.warning("no --codec_ckpt given: using RANDOM codec weights "
                       "(smoke-test only)")
        import jax.numpy as jnp

        params = codec.init(
            jax.random.key(0), jnp.zeros((1, codec_cfg.hop * 4))
        )["params"]
    tok = AudioTokenizer(codec, params, codec_cfg.sample_rate)
    code_dir = Path(out_dir) / "codes"
    code_dir.mkdir(parents=True, exist_ok=True)
    bucket = codec_cfg.hop * 64  # pad to buckets → bounded recompilation
    for u in utts:
        x, _ = load_wav(u.path, sr=codec_cfg.sample_rate)
        t = max(len(x) // codec_cfg.hop * codec_cfg.hop, codec_cfg.hop)
        n = t // codec_cfg.hop
        padded = np.zeros(((t + bucket - 1) // bucket) * bucket, np.float32)
        padded[:t] = x[:t]
        codes = tok.encode(padded)[0][:, :n]  # (Q, N)
        np.save(code_dir / f"{u.uid}.npy", codes.astype(np.int32))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--num_workers", type=int, default=1)
    parser.add_argument("--extract_codes", action="store_true",
                        help="tokenize audio with a codec ckpt (VALL-E)")
    parser.add_argument("--codec_ckpt", default="",
                        help="checkpoint dir of a trained AmphionCodec")
    args = parser.parse_args()
    cfg = load_config(args.config)
    logger = get_logger("preprocess")
    p = cfg.preprocess

    for ds in cfg.dataset:
        logger.info(f"preprocessing {ds}")
        train, test = preprocess_dataset(ds, cfg.dataset_path[ds], p.processed_dir)
        out = f"{p.processed_dir}/{ds}"
        if p.get("extract_mel", True):
            extract_acoustic_features(
                train + test, out, MelConfig.from_preprocess_cfg(p),
                extract_f0=p.get("extract_pitch", False),
                extract_energy=p.get("extract_energy", False),
            )
        if p.get("extract_phone", True):
            extract_phone_sequences(
                train + test, out,
                backend=p.get("g2p_backend", "char"),
                lexicon_path=p.get("lexicon_path") or None,
            )
        if args.extract_codes:
            extract_codes(train + test, out, cfg, args.codec_ckpt, logger)
        logger.info(f"  done: {len(train)} train / {len(test)} test")


if __name__ == "__main__":
    main()
