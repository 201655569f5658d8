"""SVC training CLI (reference: `bins/svc/train.py:25-32` — registry:
DiffWaveNetSVC/DiffComoSVC/TransformerSVC/VitsSVC/...).

Wired: DiffWaveNetSVC (diffusion over mel with melody/loudness/singer
conditioning; SSL content features are added when their .npy dirs exist)."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.dataset import Prefetcher, SegmentAudioDataset
from amphion_tpu.data.metadata import load_metadata
from amphion_tpu.models.svc.diffusion_svc import DiffusionSVC, DiffusionSVCConfig
from amphion_tpu.modules.condition_encoder import ConditionEncoderConfig
from amphion_tpu.modules.wavenet_denoiser import WaveNetDenoiserConfig
from amphion_tpu.ops.energy import energy_from_log_mel
from amphion_tpu.ops.f0 import F0Config, yin_f0
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.runtime.loop import LoopConfig, TrainLoop
from amphion_tpu.runtime.train_state import create_train_state
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger
import optax


class DiffWaveNetSVCTrainer:
    def __init__(self, args, cfg):
        self.cfg = cfg
        self.logger = get_logger("svc")
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        self.f0_cfg = F0Config.from_preprocess_cfg(p)

        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(Path(p.processed_dir) / ds / "train.json"))
        singers = sorted({u.singer or u.speaker or "default" for u in utts})
        self.singer2id = {s: i for i, s in enumerate(singers)}
        self.utts = utts

        m = cfg.model
        cond = ConditionEncoderConfig(
            output_dim=m.get("cond_dim", 384),
            num_singers=max(len(singers), 2),
        )
        self.model = DiffusionSVC(DiffusionSVCConfig(
            n_mel=p.n_mel,
            condition=cond,
            denoiser=WaveNetDenoiserConfig(
                in_dim=p.n_mel, hidden=m.get("hidden", 256),
                num_layers=m.get("num_layers", 20),
                cond_dim=cond.output_dim,
            ),
        ))
        t = cfg.train
        self.batch_size = t.batch_size
        frames = t.get("segment_frames", 256)
        self.dataset = SegmentAudioDataset(
            utts, p.sample_rate, frames * p.hop_size
        )

        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        tx = optax.adamw(t.adamw.lr, b1=t.adamw.get("adam_b1", 0.9),
                         b2=t.adamw.get("adam_b2", 0.999))
        variables_rng = jax.random.key(t.get("seed", 0))
        params = self.model.init(
            variables_rng, example["mel"], example["features"], example["mask"],
            jax.random.key(1), method=DiffusionSVC.loss,
        )["params"]
        from amphion_tpu.runtime.train_state import TrainState

        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
            rng=jax.random.key(2), apply_fn=self.model.apply, tx=tx,
        )

        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(p):
                return self.model.apply(
                    {"params": p}, batch["mel"], batch["features"],
                    batch["mask"], sub, method=DiffusionSVC.loss,
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
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        (ckpt_dir.parent / "singer2id.json").write_text(
            __import__("json").dumps(self.singer2id)
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
        audio = np.stack([self.dataset[i]["audio"] for i in idxs])
        au = jnp.asarray(audio)
        mel = mel_spectrogram(au, self.mel_cfg).transpose(0, 2, 1)
        f0, uv = yin_f0(au, self.f0_cfg)
        energy = energy_from_log_mel(mel.transpose(0, 2, 1))
        sids = np.asarray([
            self.singer2id.get(
                self.dataset.utts[i].singer or self.dataset.utts[i].speaker
                or "default", 0)
            for i in idxs
        ], np.int32)
        features = {
            "f0": f0, "uv": uv.astype(jnp.float32), "loudness": energy,
            "singer": jnp.asarray(sids),
        }
        return {"mel": mel, "features": features,
                "mask": jnp.ones(mel.shape[:2], jnp.float32)}

    def _data(self):
        n = len(self.dataset)
        order = np.random.default_rng(self.loop.epoch).permutation(n)

        def gen():
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                yield self._batch(order[i : i + self.batch_size].tolist())

        return Prefetcher(gen)

    def train_loop(self):
        return self.loop.run()




class DiffComoSVCTrainer(DiffWaveNetSVCTrainer):
    """ComoSVC consistency distillation (ref `models/svc/comosvc/
    comosvc_trainer.py:18`, teacher loading `:30`): a frozen DiffWaveNetSVC
    teacher (--teacher_ckpt / cfg.train.teacher_ckpt) distills into a
    single-step consistency student sharing the same backbone."""

    def __init__(self, args, cfg):
        import functools

        from amphion_tpu.models.svc.comosvc import (
            ComoSVC,
            consistency_distill_step,
        )
        from amphion_tpu.models.svc.diffusion_svc import DiffusionSVCConfig
        from amphion_tpu.runtime.train_state import TrainState

        self.cfg = cfg
        self.logger = get_logger("comosvc")
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        self.f0_cfg = F0Config.from_preprocess_cfg(p)
        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(Path(p.processed_dir) / ds / "train.json"))
        singers = sorted({u.singer or u.speaker or "default" for u in utts})
        self.singer2id = {s: i for i, s in enumerate(singers)}
        self.utts = utts
        m = cfg.model
        cond = ConditionEncoderConfig(
            output_dim=m.get("cond_dim", 384), num_singers=max(len(singers), 2),
        )
        svc_cfg = DiffusionSVCConfig(
            n_mel=p.n_mel, condition=cond,
            denoiser=WaveNetDenoiserConfig(
                in_dim=p.n_mel, hidden=m.get("hidden", 256),
                num_layers=m.get("num_layers", 20), cond_dim=cond.output_dim,
            ),
        )
        teacher = DiffusionSVC(svc_cfg)
        teacher_ckpt = getattr(args, "teacher_ckpt", "") or cfg.train.get(
            "teacher_ckpt", "")
        t = cfg.train
        self.batch_size = t.batch_size
        self.dataset = SegmentAudioDataset(
            utts, p.sample_rate, t.get("segment_frames", 256) * p.hop_size
        )
        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        if teacher_ckpt:
            tree, _, step_ = CheckpointManager(teacher_ckpt).restore_raw()
            teacher_params = tree["params"] if "params" in tree else tree
            self.logger.info(f"teacher restored from step {step_}")
        else:
            self.logger.warning("no teacher_ckpt: RANDOM teacher (smoke only)")
            teacher_params = teacher.init(
                jax.random.key(0), example["mel"], example["features"],
                example["mask"], jax.random.key(1), method=DiffusionSVC.loss,
            )["params"]
        student = ComoSVC(svc_cfg)
        # initialize the student backbone FROM the teacher (ref `:30`);
        # deep-copy — the jitted step donates student buffers, and the frozen
        # teacher must keep its own
        params = {"backbone": jax.tree_util.tree_map(jnp.copy, teacher_params)}
        tx = optax.adamw(t.adamw.lr)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), rng=jax.random.key(2),
            apply_fn=student.apply, tx=tx,
        )
        sched = teacher.schedule

        def teacher_eps_factory(features):
            def eps_fn(x, t_int):
                b = x.shape[0]
                return teacher.apply(
                    {"params": teacher_params}, x, jnp.full((b,), t_int),
                    features, method=DiffusionSVC.denoise,
                )
            return eps_fn

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(prm):
                return consistency_distill_step(
                    student, prm, teacher_eps_factory(batch["features"]),
                    sched, batch["mel"], batch["features"], batch["mask"], sub,
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads).replace(rng=rng), {
                "consistency": loss
            }

        ckpt_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name / "checkpoint"
        self.ckpt = CheckpointManager(
            ckpt_dir, list(t.get("save_checkpoint_stride", [1])),
            list(t.get("keep_last", [-1])),
        )
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        (ckpt_dir.parent / "singer2id.json").write_text(
            __import__("json").dumps(self.singer2id)
        )
        self.loop = TrainLoop(
            LoopConfig(max_epoch=t.get("max_epoch", -1),
                       max_steps=t.get("max_steps", -1),
                       log_interval=t.get("log_interval", 100),
                       save_checkpoints_steps=t.get("save_checkpoints_steps", 0)),
            step, self.state, self._data, ckpt=self.ckpt, logger=self.logger,
        )



class TransformerSVCTrainer(DiffWaveNetSVCTrainer):
    """TransformerSVC (ref `models/svc/transformer/`): same conditioning
    pipeline, direct mel regression with masked L1+MSE instead of diffusion."""

    def __init__(self, args, cfg):
        # reuse the diffusion trainer's data plumbing, swap model + step
        import functools

        from amphion_tpu.models.svc.transformer_svc import (
            TransformerSVC,
            TransformerSVCConfig,
            transformer_svc_loss,
        )
        from amphion_tpu.runtime.train_state import TrainState

        self.cfg = cfg
        self.logger = get_logger("tsvc")
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        self.f0_cfg = F0Config.from_preprocess_cfg(p)
        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(Path(p.processed_dir) / ds / "train.json"))
        singers = sorted({u.singer or u.speaker or "default" for u in utts})
        self.singer2id = {s: i for i, s in enumerate(singers)}
        self.utts = utts
        m = cfg.model
        cond = ConditionEncoderConfig(
            output_dim=m.get("cond_dim", 384), num_singers=max(len(singers), 2),
        )
        self.model = TransformerSVC(TransformerSVCConfig(
            n_mel=p.n_mel, hidden=m.get("cond_dim", 384),
            num_layers=m.get("num_layers", 6), num_heads=m.get("n_heads", 4),
            ffn_hidden=m.get("ffn_hidden", 4 * m.get("cond_dim", 384)),
            condition=cond,
        ))
        t = cfg.train
        self.batch_size = t.batch_size
        self.dataset = SegmentAudioDataset(
            utts, p.sample_rate, t.get("segment_frames", 256) * p.hop_size
        )
        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        tx = optax.adamw(t.adamw.lr)
        params = self.model.init(
            jax.random.key(t.get("seed", 0)), example["features"], example["mask"]
        )["params"]
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), rng=jax.random.key(2),
            apply_fn=self.model.apply, tx=tx,
        )
        model = self.model

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            def loss_fn(prm):
                pred = model.apply({"params": prm}, batch["features"],
                                   batch["mask"])
                return transformer_svc_loss(pred, batch["mel"], batch["mask"])

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return state.apply_gradients(grads), aux

        ckpt_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name / "checkpoint"
        self.ckpt = CheckpointManager(
            ckpt_dir, list(t.get("save_checkpoint_stride", [1])),
            list(t.get("keep_last", [-1])),
        )
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        (ckpt_dir.parent / "singer2id.json").write_text(
            __import__("json").dumps(self.singer2id)
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



def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="exp")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume_type", default="resume")
    parser.add_argument("--teacher_ckpt", default="")
    args = parser.parse_args()
    cfg = load_config(args.config)
    supported_trainer = {"DiffWaveNetSVC": DiffWaveNetSVCTrainer,
                         "TransformerSVC": TransformerSVCTrainer,
                         "DiffComoSVC": DiffComoSVCTrainer}
    trainer = supported_trainer[cfg.model_type](args, cfg)
    trainer.train_loop()


if __name__ == "__main__":
    main()
