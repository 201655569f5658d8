"""TTA preprocessing CLI (reference: `bins/tta/preprocess.py`):
corpus adapters → mel features for the AutoencoderKL/AudioLDM stack.
Captions ride in the utterance metadata ``text`` field (the reference
stores them as 'Caption' in the utterance json; audioldm_dataset.py:59-67)."""

from __future__ import annotations

import argparse
import faulthandler

from amphion_tpu.data.preprocessors import preprocess_dataset
from amphion_tpu.data.processors.acoustic import extract_acoustic_features
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
    logger = get_logger("tta-preprocess")
    p = cfg.preprocess

    for ds in cfg.dataset:
        logger.info(f"preprocessing {ds}")
        train, test = preprocess_dataset(ds, cfg.dataset_path[ds], p.processed_dir)
        out = f"{p.processed_dir}/{ds}"
        extract_acoustic_features(
            train + test, out, MelConfig.from_preprocess_cfg(p),
            extract_f0=False, extract_energy=False,
        )
        logger.info(f"  done: {len(train)} train / {len(test)} test")


if __name__ == "__main__":
    main()
