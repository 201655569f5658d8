"""Codec training CLI (reference: `bins/codec/train.py:20-24` — registry:
FAcodec / RepCoco / VQVAE)."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.dataset import Prefetcher, SegmentAudioDataset
from amphion_tpu.data.metadata import load_metadata
from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
from amphion_tpu.models.codec.codec_trainer import (
    create_codec_states,
    make_codec_train_step,
)
from amphion_tpu.models.vocoders.gan_trainer import CombinedDiscriminator, GANTrainConfig
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.runtime.loop import LoopConfig, TrainLoop
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


class AmphionCodecTrainer:
    def __init__(self, args, cfg):
        self.cfg = cfg
        self.logger = get_logger("codec")
        p = cfg.preprocess
        m = cfg.model.get("codec", None)
        codec_cfg = CodecConfig(
            sample_rate=p.sample_rate,
            strides=tuple(m.strides) if m else (2, 4, 5, 6),
            num_quantizers=m.num_quantizers if m else 8,
            codebook_size=m.codebook_size if m else 1024,
            codebook_dim=m.codebook_dim if m else 8,
            encoder_dim=m.get("encoder_dim", 32) if m else 32,
            latent_dim=m.get("latent_dim", 256) if m else 256,
            decoder_dim=m.get("decoder_dim", 32) if m else 32,
        )
        self.codec = AmphionCodec(codec_cfg)
        disc = CombinedDiscriminator(
            use=tuple(cfg.model.get("discriminators", ["mpd"])),
            channel_mult=cfg.model.get("discriminator_channel_mult_factor", 1.0),
        )
        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(Path(p.processed_dir) / ds / "train.json"))
        t = cfg.train
        seg = t.get("segment_frames", 64) * codec_cfg.hop
        self.dataset = SegmentAudioDataset(utts, p.sample_rate, seg)
        self.batch_size = t.batch_size

        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        gstate, dstate = create_codec_states(
            self.codec, disc, jax.random.key(t.get("seed", 0)),
            example["audio"][:1], GANTrainConfig(lr=t.adamw.lr),
        )
        self.states = {"g": gstate, "d": dstate}
        step_fn = make_codec_train_step(self.codec)

        def step(states, batch):
            g, d, metrics = step_fn(states["g"], states["d"], batch)
            return {"g": g, "d": d}, metrics

        ckpt_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name / "checkpoint"
        self.ckpt = CheckpointManager(
            ckpt_dir, list(t.get("save_checkpoint_stride", [1])),
            list(t.get("keep_last", [-1])),
        )
        self.loop = TrainLoop(
            LoopConfig(max_epoch=t.get("max_epoch", -1),
                       max_steps=t.get("max_steps", -1),
                       log_interval=t.get("log_interval", 100),
                       save_checkpoints_steps=t.get("save_checkpoints_steps", 0)),
            step, self.states, self._data, ckpt=self.ckpt, logger=self.logger,
        )
        if getattr(args, "resume", False):
            self.loop.resume(None, getattr(args, "resume_type", "resume"))

    def _batch(self, idxs):
        audio = np.stack([self.dataset[i]["audio"] for i in idxs])
        return {"audio": jnp.asarray(audio)}

    def _data(self):
        n = len(self.dataset)
        order = np.random.default_rng(self.loop.epoch).permutation(n)

        def gen():
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                yield self._batch(order[i : i + self.batch_size].tolist())

        return Prefetcher(gen)

    def train_loop(self):
        return self.loop.run()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="exp")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume_type", default="resume")
    args = parser.parse_args()
    cfg = load_config(args.config)
    supported_trainer = {"AmphionCodec": AmphionCodecTrainer,
                         "VQVAE": AmphionCodecTrainer}
    trainer = supported_trainer[cfg.model_type](args, cfg)
    trainer.train_loop()


if __name__ == "__main__":
    main()
