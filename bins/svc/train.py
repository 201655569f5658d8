"""SVC training CLI (reference: `bins/svc/train.py:25-32` — registry:
DiffWaveNetSVC/DiffComoSVC/TransformerSVC/VitsSVC/...).

Wired: DiffWaveNetSVC (diffusion over mel with melody/loudness/singer
conditioning; SSL content features are added when their .npy dirs exist),
TransformerSVC, DiffComoSVC (consistency distillation), VitsSVC (so-VITS
GAN)."""

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
    """ComoSVC (ref `models/svc/comosvc/comosvc_trainer.py:18`): EDM
    teacher (cfg.model.comosvc.distill false — ssim + prior + karras
    diffusion losses) or consistency distillation (distill true — teacher
    loaded from --teacher_ckpt / cfg.train.teacher_ckpt; student +
    EMA-target + frozen-pretrained copies, CTLoss_D)."""

    def __init__(self, args, cfg):
        import functools

        from amphion_tpu.models.svc.comosvc import ComoSVC, ComoSVCConfig, ct_loss
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
        cm = m.get("comosvc", None)
        cond = ConditionEncoderConfig(
            output_dim=m.get("cond_dim", 384), num_singers=max(len(singers), 2),
        )
        como_cfg = ComoSVCConfig(
            n_mel=p.n_mel, condition=cond, hidden=cond.output_dim,
            n_heads=cm.get("n_heads", 2) if cm else 2,
            n_layers=cm.get("n_layers", 6) if cm else 6,
            filter_channels=cm.get("filter_channels", 512) if cm else 512,
            denoiser=WaveNetDenoiserConfig(
                in_dim=p.n_mel, hidden=m.get("hidden", 256),
                num_layers=m.get("num_layers", 20), cond_dim=p.n_mel,
            ),
            n_timesteps=cm.get("n_timesteps", 18) if cm else 18,
        )
        self.distill = bool(cm.get("distill", False)) if cm else False
        model = ComoSVC(como_cfg)
        self.model = model
        t = cfg.train
        self.batch_size = t.batch_size
        self.dataset = SegmentAudioDataset(
            utts, p.sample_rate, t.get("segment_frames", 256) * p.hop_size
        )
        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        init_params = model.init(
            jax.random.key(0), example["mel"], example["features"],
            example["mask"], jax.random.key(1), method=ComoSVC.compute_loss,
        )["params"]
        tx = optax.adamw(t.adamw.lr)

        if not self.distill:
            params = init_params
            self.state = TrainState(
                step=jnp.zeros((), jnp.int32), params=params,
                opt_state=tx.init(params), rng=jax.random.key(2),
                apply_fn=model.apply, tx=tx,
            )

            @functools.partial(jax.jit, donate_argnums=(0,))
            def step(state, batch):
                rng, sub = jax.random.split(state.rng)

                def loss_fn(prm):
                    losses = model.apply(
                        {"params": prm}, batch["mel"], batch["features"],
                        batch["mask"], sub, method=ComoSVC.compute_loss,
                    )
                    return losses["ssim"] + losses["prior"] + losses["diff"], losses

                (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params)
                return state.apply_gradients(grads).replace(rng=rng), aux
        else:
            teacher_ckpt = getattr(args, "teacher_ckpt", "") or t.get(
                "teacher_ckpt", "")
            if teacher_ckpt:
                tree, _, step_ = CheckpointManager(teacher_ckpt).restore_raw()
                teacher_params = tree["params"] if "params" in tree else tree
                self.logger.info(f"teacher restored from step {step_}")
            else:
                self.logger.warning("no teacher_ckpt: RANDOM teacher (smoke only)")
                teacher_params = init_params
            # student init FROM the teacher; EMA + frozen pretrained copies
            # (ref Consistency.init_consistency_training:48)
            params = jax.tree_util.tree_map(jnp.copy, teacher_params)
            self.params_pretrained = teacher_params
            self.params_ema = jax.tree_util.tree_map(jnp.copy, teacher_params)
            self.state = TrainState(
                step=jnp.zeros((), jnp.int32), params=params,
                opt_state=tx.init(params), rng=jax.random.key(2),
                apply_fn=model.apply, tx=tx,
            )
            pretrained = self.params_pretrained

            @functools.partial(jax.jit, donate_argnums=(0,))
            def step(carry, batch):
                state, ema = carry
                rng, sub = jax.random.split(state.rng)

                def loss_fn(prm):
                    return ct_loss(model, prm, ema, pretrained,
                                   batch["mel"], batch["features"],
                                   batch["mask"], sub)

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                state = state.apply_gradients(grads).replace(rng=rng)
                # EMA target update, mu = 0.95 (ref CTLoss_D:196)
                ema = optax.incremental_update(state.params, ema, 0.05)
                return (state, ema), {"consistency": loss}

        ckpt_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name / "checkpoint"
        self.ckpt = CheckpointManager(
            ckpt_dir, list(t.get("save_checkpoint_stride", [1])),
            list(t.get("keep_last", [-1])),
        )
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        (ckpt_dir.parent / "singer2id.json").write_text(
            __import__("json").dumps(self.singer2id)
        )
        loop_state = self.state if not self.distill else (self.state,
                                                          self.params_ema)
        self.loop = TrainLoop(
            LoopConfig(max_epoch=t.get("max_epoch", -1),
                       max_steps=t.get("max_steps", -1),
                       log_interval=t.get("log_interval", 100),
                       save_checkpoints_steps=t.get("save_checkpoints_steps", 0)),
            step, loop_state, self._data, ckpt=self.ckpt, logger=self.logger,
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
            ffn_hidden=m.get("ffn_hidden", 2048),  # torch-default FFN (ref)
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



class VitsSVCTrainer(DiffWaveNetSVCTrainer):
    """so-VITS-style SVC (ref `models/svc/vits/vits_trainer.py`): melody +
    loudness + singer conditioning into a VITS posterior/flow/HiFiGAN
    decoder, trained with the fused G/D GAN step (KL + mel + adv + fm;
    no MAS/duration losses — content features are frame-aligned)."""

    def __init__(self, args, cfg):
        import functools
        import json as _json

        from amphion_tpu.models.svc.vits_svc import VitsSVC, VitsSVCConfig
        from amphion_tpu.models.tts.vits.vits import (
            VITSConfig,
            slice_audio_segments,
            vits_kl_loss,
        )
        from amphion_tpu.models.vocoders.gan_trainer import (
            CombinedDiscriminator,
            GANTrainConfig,
            make_optimizer,
        )
        from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig
        from amphion_tpu.models.vocoders.losses import (
            discriminator_loss,
            feature_loss,
            generator_adv_loss,
            mel_loss,
        )
        from amphion_tpu.ops.mel import linear_spectrogram
        from amphion_tpu.runtime.train_state import TrainState

        self.cfg = cfg
        self.logger = get_logger("vits_svc")
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        self.f0_cfg = F0Config.from_preprocess_cfg(p)
        self._linear_spectrogram = linear_spectrogram
        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(Path(p.processed_dir) / ds / "train.json"))
        singers = sorted({u.singer or u.speaker or "default" for u in utts})
        self.singer2id = {s: i for i, s in enumerate(singers)}
        self.utts = utts

        m = cfg.model
        v = m.get("vits_svc", None)
        dec_m = m.get("decoder", None)
        inter = v.get("inter_channels", 192) if v else 192
        dec_cfg = (HiFiGANConfig.from_model_cfg(dec_m, n_mel=inter)
                   if dec_m else HiFiGANConfig(n_mel=inter))
        assert dec_cfg.hop_size == p.hop_size, (
            f"decoder hop {dec_cfg.hop_size} != preprocess hop {p.hop_size}"
        )
        n_singers = max(len(singers), 2)
        vcfg = VITSConfig(
            num_phones=1,  # unused: content features replace text
            spec_channels=p.n_fft // 2 + 1,
            inter_channels=inter,
            hidden_channels=v.get("hidden_channels", 192) if v else 192,
            filter_channels=v.get("filter_channels", 768) if v else 768,
            n_heads=v.get("n_heads", 2) if v else 2,
            n_layers=v.get("n_layers", 6) if v else 6,
            n_speakers=n_singers,
            gin_channels=v.get("gin_channels", 256) if v else 256,
            segment_size=v.get("segment_size", 32) if v else 32,
            decoder=dec_cfg,
        )
        cond = ConditionEncoderConfig(
            output_dim=vcfg.hidden_channels, num_singers=n_singers,
            f0_min=p.f0_min, f0_max=p.f0_max,
        )
        self.model = VitsSVC(VitsSVCConfig(vits=vcfg, condition=cond))
        self.discriminator = CombinedDiscriminator(
            use=tuple(m.get("discriminators", ["mpd", "msd"])),
            channel_mult=m.get("discriminator_channel_mult_factor", 1.0),
        )
        t = cfg.train
        self.batch_size = t.batch_size
        self.dataset = SegmentAudioDataset(
            utts, p.sample_rate, t.get("segment_frames", 256) * p.hop_size
        )
        train_cfg = GANTrainConfig(
            lr=t.adamw.lr, adam_b1=t.adamw.adam_b1, adam_b2=t.adamw.adam_b2,
            lr_decay=t.exponential_lr.lr_decay,
        )
        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        g_rng, d_rng, f_rng = jax.random.split(
            jax.random.key(t.get("seed", 0)), 3
        )
        g_params = self.model.init(
            g_rng, example["features"], example["spec"], example["mask"],
            f_rng, example["sid"], method=VitsSVC.train_forward,
        )["params"]
        gstate = TrainState(
            step=jnp.zeros((), jnp.int32), params=g_params,
            opt_state=make_optimizer(train_cfg).init(g_params), rng=f_rng,
            apply_fn=self.model.apply, tx=make_optimizer(train_cfg),
        )
        from amphion_tpu.runtime.train_state import create_train_state

        seg_audio = example["audio"][:, : vcfg.segment_size * p.hop_size]
        dstate = create_train_state(
            self.discriminator, d_rng, seg_audio, make_optimizer(train_cfg)
        )
        self.states = {"g": gstate, "d": dstate}
        model, disc = self.model, self.discriminator
        mel_cfg, hop, seg = self.mel_cfg, p.hop_size, vcfg.segment_size
        kl_weight = t.get("kl_weight", 1.0)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(states, batch):
            gstate, dstate = states["g"], states["d"]
            rng, step_rng = jax.random.split(gstate.rng)

            def forward(prm):
                return model.apply(
                    {"params": prm}, batch["features"], batch["spec"],
                    batch["mask"], step_rng, batch["sid"],
                    method=VitsSVC.train_forward,
                )

            out0 = forward(gstate.params)
            real_seg = slice_audio_segments(
                batch["audio"], out0["segment_start"], seg, hop
            )
            fake_seg0 = jax.lax.stop_gradient(out0["wav_segment"])

            def d_loss_fn(dp):
                lr, _ = dstate.apply_fn({"params": dp}, real_seg)
                lf, _ = dstate.apply_fn({"params": dp}, fake_seg0)
                loss, _, _ = discriminator_loss(lr, lf)
                return loss

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dstate.params)
            dstate = dstate.apply_gradients(d_grads)

            def g_loss_fn(gp):
                out = forward(gp)
                fake_seg = out["wav_segment"]
                lr, fr = dstate.apply_fn({"params": dstate.params}, real_seg)
                lf, ff = dstate.apply_fn({"params": dstate.params}, fake_seg)
                adv = generator_adv_loss(lf)
                fm = feature_loss(fr, ff)
                ml = mel_loss(real_seg, fake_seg, mel_cfg,
                              train_cfg.mel_loss_weight)
                kl = kl_weight * vits_kl_loss(
                    out["z_p"], out["logs_q"], out["m_p"], out["logs_p"],
                    batch["mask"],
                )
                total = adv + fm + ml + kl
                return total, {"g_adv": adv, "g_fm": fm, "g_mel": ml,
                               "g_kl": kl}

            (g_loss, aux), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(gstate.params)
            gstate = gstate.apply_gradients(g_grads).replace(rng=rng)
            return {"g": gstate, "d": dstate}, {
                "d_loss": d_loss, "g_loss": g_loss, **aux}

        ckpt_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name / "checkpoint"
        self.ckpt = CheckpointManager(
            ckpt_dir, list(t.get("save_checkpoint_stride", [1])),
            list(t.get("keep_last", [-1])),
        )
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        (ckpt_dir.parent / "singer2id.json").write_text(
            _json.dumps(self.singer2id)
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
        au = jnp.asarray(audio)
        spec = self._linear_spectrogram(au, self.mel_cfg).transpose(0, 2, 1)
        n = spec.shape[1]
        f0, uv = yin_f0(au, self.f0_cfg)
        mel = mel_spectrogram(au, self.mel_cfg)
        energy = energy_from_log_mel(mel)
        sids = np.asarray([
            self.singer2id.get(
                self.dataset.utts[i].singer or self.dataset.utts[i].speaker
                or "default", 0)
            for i in idxs
        ], np.int32)
        features = {
            "f0": f0[:, :n], "uv": uv[:, :n].astype(jnp.float32),
            "loudness": energy[:, :n], "singer": jnp.asarray(sids),
        }
        return {"features": features, "spec": spec,
                "mask": jnp.ones((spec.shape[0], n), jnp.float32),
                "audio": au, "sid": jnp.asarray(sids)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="exp")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume_type", default="resume")
    parser.add_argument("--teacher_ckpt", default="")
    parser.add_argument("--content_ckpt", default="")
    parser.add_argument("--style_ckpt", default="")
    parser.add_argument("--prosody_ckpt", default="")
    parser.add_argument("--model_type", default="",
                        help="override cfg.model_type (one config can drive "
                             "both the AR and FM stages)")
    args = parser.parse_args()
    cfg = load_config(args.config)
    if args.model_type:
        cfg.model_type = args.model_type
    # the Vevo1.5/VevoSing AR + FM stages train through the same trainers
    # as VC (ref `bins/svc/train.py:25-32` registry includes both)
    from bins.vc.train import (
        AutoregressiveTransformerTrainer,
        FlowMatchingTransformerTrainer,
    )

    supported_trainer = {"DiffWaveNetSVC": DiffWaveNetSVCTrainer,
                         "TransformerSVC": TransformerSVCTrainer,
                         "DiffComoSVC": DiffComoSVCTrainer,
                         "VitsSVC": VitsSVCTrainer,
                         "AutoregressiveTransformer":
                             AutoregressiveTransformerTrainer,
                         "FlowMatchingTransformer":
                             FlowMatchingTransformerTrainer}
    trainer = supported_trainer[cfg.model_type](args, cfg)
    trainer.train_loop()


if __name__ == "__main__":
    main()
