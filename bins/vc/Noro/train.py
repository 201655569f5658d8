"""Noro training CLI (reference: `bins/vc/Noro/train.py` + recipes
`egs/vc/Noro/*.sh`): noise-robust zero-shot VC.

Dual-branch training data is built online: the clean reference is a crop of
the source utterance; the noisy reference is the same crop through the
augmentation chain (EQ + additive noise) — the noise-agnostic contrastive
loss pulls both speaker embeddings together. Content features default to a
frame-level mel projection (SSL extractors plug in via
`amphion_tpu/data/processors/content.py`).
"""

from __future__ import annotations

import argparse
import functools
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from amphion_tpu.data.dataset import Prefetcher, SegmentAudioDataset
from amphion_tpu.data.metadata import load_metadata
from amphion_tpu.data.processors.augment import random_equalizer
from amphion_tpu.models.vc.noro import Noro, NoroConfig
from amphion_tpu.ops.f0 import F0Config, interpolate_f0, yin_f0
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.runtime.loop import LoopConfig, TrainLoop
from amphion_tpu.runtime.train_state import TrainState
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


class NoroTrainer:
    def __init__(self, args, cfg):
        self.cfg = cfg
        self.logger = get_logger("noro")
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        self.f0_cfg = F0Config.from_preprocess_cfg(p)
        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(Path(p.processed_dir) / ds / "train.json"))
        t = cfg.train
        self.batch_size = t.batch_size
        frames = t.get("segment_frames", 256)
        self.ref_frames = t.get("ref_frames", 64)
        self.dataset = SegmentAudioDataset(
            utts, p.sample_rate,
            (frames + self.ref_frames) * p.hop_size,
        )
        self._aug_rng = np.random.default_rng(t.get("seed", 0))

        m = cfg.model
        self.model = Noro(NoroConfig(
            n_mel=p.n_mel, content_dim=p.n_mel, ref_in_dim=p.n_mel,
            hidden=m.get("hidden", 256),
            ref_layers=m.get("ref_layers", 2),
            ref_heads=m.get("ref_heads", 4),
            ref_filter=m.get("ref_filter", 4 * m.get("hidden", 256)),
            wavenet_layers=m.get("num_layers", 12),
        ))
        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        tx = optax.adamw(t.adamw.lr)
        params = self.model.init(
            jax.random.key(t.get("seed", 0)), example["mel"],
            example["content"], example["f0"], example["ref_clean"],
            example["ref_noisy"], example["mask"], jax.random.key(1),
            method=Noro.loss,
        )["params"]
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), rng=jax.random.key(2),
            apply_fn=self.model.apply, tx=tx,
        )
        model = self.model

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(prm):
                return model.apply(
                    {"params": prm}, batch["mel"], batch["content"],
                    batch["f0"], batch["ref_clean"], batch["ref_noisy"],
                    batch["mask"], sub, method=Noro.loss,
                )

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return state.apply_gradients(grads).replace(rng=rng), aux

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
            step, self.state, self._data, ckpt=self.ckpt, logger=self.logger,
        )
        if getattr(args, "resume", False):
            self.loop.resume(None, getattr(args, "resume_type", "resume"))

    def _batch(self, idxs):
        p = self.cfg.preprocess
        hop = p.hop_size
        ref_n = self.ref_frames * hop
        tgt, ref_c, ref_n_audio = [], [], []
        for i in idxs:
            x = self.dataset[i]["audio"]
            ref = x[:ref_n]
            tgt.append(x[ref_n:])
            ref_c.append(ref)
            noisy = random_equalizer(ref, p.sample_rate, self._aug_rng)
            noisy = noisy + 0.05 * self._aug_rng.standard_normal(len(noisy)).astype(np.float32)
            ref_n_audio.append(noisy)
        au = jnp.asarray(np.stack(tgt))
        mel = mel_spectrogram(au, self.mel_cfg).transpose(0, 2, 1)
        f0, _ = yin_f0(au, self.f0_cfg)
        # ref noro_trainer.py:287: interpolate F0 through unvoiced regions
        # BEFORE per-utterance standardization (zero-mean/unit-std —
        # speaker-independent prosody without unvoiced-zero spikes)
        f0, _ = interpolate_f0(f0)
        f0 = (f0 - jnp.mean(f0, axis=1, keepdims=True)) / (
            jnp.std(f0, axis=1, keepdims=True) + 1e-6)
        rc = mel_spectrogram(jnp.asarray(np.stack(ref_c)), self.mel_cfg).transpose(0, 2, 1)
        rn = mel_spectrogram(jnp.asarray(np.stack(ref_n_audio)), self.mel_cfg).transpose(0, 2, 1)
        return {
            "mel": mel, "content": mel, "f0": f0,
            "ref_clean": rc, "ref_noisy": rn,
            "mask": jnp.ones(mel.shape[:2], jnp.float32),
        }

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
    trainer = NoroTrainer(args, cfg)
    trainer.train_loop()


if __name__ == "__main__":
    main()
