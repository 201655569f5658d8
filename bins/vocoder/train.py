"""Vocoder training CLI (reference: `bins/vocoder/train.py` — registry keyed
on cfg.model_type: GANVocoder / DiffusionVocoder / Vocos)."""

from __future__ import annotations

import argparse

from amphion_tpu.runtime.vocoder_trainer import (
    DiffusionVocoderTrainer,
    GANVocoderTrainer,
)
from amphion_tpu.utils.config import load_config


def build_trainer(args, cfg):
    supported_trainer = {
        "GANVocoder": GANVocoderTrainer,
        "Vocos": GANVocoderTrainer,  # Vocos = GAN trainer with vocos generator
        "DiffusionVocoder": DiffusionVocoderTrainer,
    }
    return supported_trainer[cfg.model_type](args, cfg)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="exp")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume_type", default="resume",
                        choices=["resume", "finetune"])
    parser.add_argument("--resume_from_ckpt_path", default="")
    parser.add_argument("--log_level", default="info")
    args = parser.parse_args()
    cfg = load_config(args.config)
    trainer = build_trainer(args, cfg)
    trainer.train_loop()


if __name__ == "__main__":
    main()
