"""TTS training CLI (reference: `bins/tts/train.py:19-30` — registry keyed
on cfg.model_type: FastSpeech2/VITS/VALLE/NaturalSpeech2/Jets)."""

from __future__ import annotations

import argparse

from amphion_tpu.runtime.tts_trainer import (
    DualCodecTTSTrainer,
    FastSpeech2Trainer,
    JetsTrainer,
    MaskGCTTrainer,
    MetisTrainer,
    NS2Trainer,
    VALLETrainer,
    VITSTrainer,
)
from amphion_tpu.utils.config import load_config


def build_trainer(args, cfg):
    supported_trainer = {
        "VITS": VITSTrainer,
        "VALLE": VALLETrainer,
        "FastSpeech2": FastSpeech2Trainer,
        "MaskGCT": MaskGCTTrainer,
        "Metis": MetisTrainer,
        "Jets": JetsTrainer,
        "NaturalSpeech2": NS2Trainer,
        "DualCodecTTS": DualCodecTTSTrainer,
    }
    if cfg.model_type not in supported_trainer:
        raise NotImplementedError(
            f"model_type {cfg.model_type!r} is not in the trainer registry; "
            f"available: {sorted(supported_trainer)}"
        )
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
    parser.add_argument("--test", action="store_true")
    args = parser.parse_args()
    cfg = load_config(args.config)
    trainer = build_trainer(args, cfg)
    trainer.train_loop()


if __name__ == "__main__":
    main()
