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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--num_workers", type=int, default=1)
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
        logger.info(f"  done: {len(train)} train / {len(test)} test")


if __name__ == "__main__":
    main()
