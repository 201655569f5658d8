"""Vocoder preprocessing CLI (reference: `bins/vocoder/preprocess.py`).

Stage 1: normalize corpora into metadata (+ optional offline features).
Vocoder training computes mel on device, so offline extraction is optional.
"""

from __future__ import annotations

import argparse

from amphion_tpu.data.metadata import load_metadata
from amphion_tpu.data.preprocessors import preprocess_dataset
from amphion_tpu.data.processors.acoustic import extract_acoustic_features
from amphion_tpu.ops.mel import MelConfig
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--num_workers", type=int, default=1)
    parser.add_argument("--extract_features", action="store_true",
                        help="also run offline mel/F0/energy extraction")
    args = parser.parse_args()
    cfg = load_config(args.config)
    logger = get_logger("preprocess")

    for ds in cfg.dataset:
        raw = cfg.dataset_path[ds]
        logger.info(f"preprocessing {ds} from {raw}")
        train, test = preprocess_dataset(ds, raw, cfg.preprocess.processed_dir)
        logger.info(f"  {len(train)} train / {len(test)} test utterances")
        if args.extract_features:
            mel_cfg = MelConfig.from_preprocess_cfg(cfg.preprocess)
            out = f"{cfg.preprocess.processed_dir}/{ds}"
            extract_acoustic_features(train + test, out, mel_cfg)
            logger.info(f"  features written to {out}")


if __name__ == "__main__":
    main()
