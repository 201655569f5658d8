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
    if m and m.get("type", "") == "encodec":
        # the reference pipeline's token space (utils/tokenizer.py:18 —
        # EnCodec 24 kHz @6 kbps); ckpt from
        # `bins/convert_checkpoint.py --model encodec`
        from amphion_tpu.models.codec.encodec import (
            EncodecConfig, EncodecModel,
        )

        ecfg = EncodecConfig(n_q=m.get("num_quantizers", 8))
        ecodec = EncodecModel(ecfg)
        if codec_ckpt:
            from amphion_tpu.runtime.checkpoint import CheckpointManager

            tree, epoch, step = CheckpointManager(codec_ckpt).restore_raw()
            eparams = tree["params"]
            logger.info(f"encodec restored from epoch {epoch} step {step}")
        else:
            logger.warning("no --codec_ckpt: RANDOM EnCodec weights "
                           "(smoke-test only)")
            eparams = ecodec.init(
                jax.random.key(0),
                np.zeros((1, ecfg.hop * 4), np.float32))["params"]
        tok = AudioTokenizer(ecodec, eparams, ecfg.sample_rate)
        code_dir = Path(out_dir) / "codes"
        code_dir.mkdir(parents=True, exist_ok=True)
        bucket = ecfg.hop * 64
        for u in utts:
            x, _ = load_wav(u.path, sr=ecfg.sample_rate)
            t = max(len(x) // ecfg.hop * ecfg.hop, ecfg.hop)
            n = t // ecfg.hop
            padded = np.zeros(((t + bucket - 1) // bucket) * bucket,
                              np.float32)
            padded[:t] = x[:t]
            codes = tok.encode(padded)[0][:, :n]  # (Q, N)
            np.save(code_dir / f"{u.uid}.npy", codes.astype(np.int32))
        return
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



def extract_semantic(utts, out_dir, cfg, semantic_ckpt, logger):
    """Semantic tokenization for MaskGCT (ref `maskgct_utils.py:111`):
    features → RepCodec tokens + quantized latents. Feature source is
    w2v-bert when available (`processors/content.py`), else the on-device
    mel front end (self-contained fallback; `preprocess.semantic_source`)."""
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np

    from amphion_tpu.data.audio_io import load_wav
    from amphion_tpu.models.codec.repcodec import RepCodec, RepCodecConfig
    from amphion_tpu.ops.mel import MelConfig, mel_spectrogram

    p = cfg.preprocess
    source = p.get("semantic_source", "mel")
    m = cfg.model.get("semantic_codec", None)
    feature_dim = p.n_mel if source == "mel" else (m.feature_dim if m else 1024)
    sem_cfg = RepCodecConfig(
        feature_dim=feature_dim,
        hidden=m.get("hidden", 384) if m else 384,
        codebook_size=m.codebook_size if m else 8192,
        codebook_dim=m.get("codebook_dim", 8) if m else 8,
        num_blocks=m.get("num_blocks", 4) if m else 4,
    )
    codec = RepCodec(sem_cfg)
    if semantic_ckpt:
        from amphion_tpu.runtime.checkpoint import CheckpointManager

        tree, epoch, step = CheckpointManager(semantic_ckpt).restore_raw()
        params = tree.get("g", tree)["params"] if "g" in tree else tree["params"]
        logger.info(f"semantic codec restored from step {step}")
    else:
        logger.warning("no --semantic_ckpt: RANDOM semantic codec (smoke only)")
        params = codec.init(
            jax.random.key(0), jnp.zeros((1, 8, feature_dim))
        )["params"]

    mel_cfg = MelConfig.from_preprocess_cfg(p)
    if source != "mel":
        from amphion_tpu.data.processors.content import EXTRACTORS

        extractor = EXTRACTORS[source]()

    encode = jax.jit(lambda prm, f: codec.apply(
        {"params": prm}, f, method=RepCodec.encode))
    decode = jax.jit(lambda prm, t: codec.apply(
        {"params": prm}, t, method=RepCodec.decode_tokens))

    tok_dir = Path(out_dir) / "semantic"
    lat_dir = Path(out_dir) / "semantic_feats"
    tok_dir.mkdir(parents=True, exist_ok=True)
    lat_dir.mkdir(parents=True, exist_ok=True)
    bucket = mel_cfg.hop_size * 64
    for u in utts:
        x, _ = load_wav(u.path, sr=p.sample_rate)
        t = max(len(x) // mel_cfg.hop_size * mel_cfg.hop_size, mel_cfg.hop_size)
        n = t // mel_cfg.hop_size
        if source == "mel":
            padded = np.zeros(((t + bucket - 1) // bucket) * bucket, np.float32)
            padded[:t] = x[:t]
            feats = mel_spectrogram(jnp.asarray(padded)[None], mel_cfg)
            feats = feats.transpose(0, 2, 1)
        else:
            feats = jnp.asarray(extractor(x[:t], p.sample_rate))[None]
            n = feats.shape[1]
        tokens = encode(params, feats)[:, :n]
        latents = decode(params, tokens)
        np.save(tok_dir / f"{u.uid}.npy", np.asarray(tokens)[0].astype(np.int32))
        np.save(lat_dir / f"{u.uid}.npy", np.asarray(latents)[0].astype(np.float32))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--num_workers", type=int, default=1)
    parser.add_argument("--extract_codes", action="store_true",
                        help="tokenize audio with a codec ckpt (VALL-E)")
    parser.add_argument("--codec_ckpt", default="",
                        help="checkpoint dir of a trained AmphionCodec")
    parser.add_argument("--extract_semantic", action="store_true",
                        help="semantic tokens via RepCodec (MaskGCT)")
    parser.add_argument("--semantic_ckpt", default="",
                        help="checkpoint dir of a trained RepCodec")
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
        if args.extract_semantic:
            extract_semantic(train + test, out, cfg, args.semantic_ckpt, logger)
        logger.info(f"  done: {len(train)} train / {len(test)} test")


if __name__ == "__main__":
    main()
