"""SVC preprocessing CLI (reference: `bins/svc/preprocess.py`):
corpus adapters → optional augmentation (pitch/formant shift, equalizer,
time stretch, producing derived datasets) → acoustic features (mel + F0 +
energy, the SVC condition set) → optional SSL content features."""

from __future__ import annotations

import argparse
import faulthandler

from amphion_tpu.data.preprocessors import preprocess_dataset
from amphion_tpu.data.processors.acoustic import extract_acoustic_features
from amphion_tpu.data.processors.augment import augment_dataset
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
    logger = get_logger("svc-preprocess")
    p = cfg.preprocess

    augmentations = [
        a for a in ("pitch_shift", "formant_shift", "equalizer", "time_stretch")
        if p.get(f"use_{a}", False)
    ]

    for ds in cfg.dataset:
        logger.info(f"preprocessing {ds}")
        train, test = preprocess_dataset(ds, cfg.dataset_path[ds], p.processed_dir)
        groups = {ds: train + test}
        if augmentations:
            derived = augment_dataset(
                train + test, f"{p.processed_dir}/{ds}_augmented",
                p.sample_rate, augmentations,
            )
            groups.update(
                {f"{ds}_{aug}": utts for aug, utts in derived.items()})
        for name, utts in groups.items():
            out = f"{p.processed_dir}/{name}"
            extract_acoustic_features(
                utts, out, MelConfig.from_preprocess_cfg(p),
                extract_f0=p.get("extract_pitch", True),
                extract_energy=p.get("extract_energy", True),
            )
            for extractor in p.get("content_extractors", []):
                from amphion_tpu.data.processors.content import \
                    extract_content_features

                # entries: "hubert" or {"name": "hubert_native",
                # "model_dir": "/path/to/hf_ckpt", "layer": -1, ...}
                if isinstance(extractor, str):
                    name, kw = extractor, {}
                else:
                    kw = dict(extractor)
                    name = kw.pop("name")
                extract_content_features(
                    name, utts, out, p.sample_rate,
                    target_hop=p.hop_size, **kw,
                )
            logger.info(f"  {name}: {len(utts)} utterances done")


if __name__ == "__main__":
    main()
