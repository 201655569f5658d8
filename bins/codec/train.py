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


class FACodecTrainer(AmphionCodecTrainer):
    """FACodec trainer (ref `models/codec/facodec/facodec_trainer.py`):
    factorized prosody/content/detail RVQ branches + global timbre, trained
    with reconstruction + multiscale mel + VQ + adversarial speaker-removal
    (gradient reversal) + waveform GAN losses in one fused step."""

    def __init__(self, args, cfg):
        import functools
        import json as _json

        from amphion_tpu.models.codec.codec_trainer import multiscale_mel_loss
        from amphion_tpu.models.codec.facodec import FACodec, FACodecConfig
        from amphion_tpu.models.vocoders.gan_trainer import make_optimizer
        from amphion_tpu.models.vocoders.losses import (
            discriminator_loss,
            feature_loss,
            generator_adv_loss,
        )
        from amphion_tpu.runtime.train_state import TrainState, create_train_state

        self.cfg = cfg
        self.logger = get_logger("facodec")
        p = cfg.preprocess
        m = cfg.model.get("codec", None)
        codec_cfg = CodecConfig(
            sample_rate=p.sample_rate,
            strides=tuple(m.strides) if m else (2, 4, 5, 6),
            codebook_size=m.codebook_size if m else 1024,
            codebook_dim=m.codebook_dim if m else 8,
            encoder_dim=m.get("encoder_dim", 32) if m else 32,
            latent_dim=m.get("latent_dim", 256) if m else 256,
            decoder_dim=m.get("decoder_dim", 32) if m else 32,
        )
        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(Path(p.processed_dir) / ds / "train.json"))
        speakers = sorted({u.speaker or u.singer or "default" for u in utts})
        self.spk2id = {s: i for i, s in enumerate(speakers)}
        f = cfg.model.get("facodec", None)
        self.codec = FACodec(FACodecConfig(
            codec=codec_cfg,
            prosody_layers=f.get("prosody_layers", 1) if f else 1,
            content_layers=f.get("content_layers", 2) if f else 2,
            detail_layers=f.get("detail_layers", 3) if f else 3,
            codebook_size=codec_cfg.codebook_size,
            codebook_dim=codec_cfg.codebook_dim,
            timbre_dim=f.get("timbre_dim", 256) if f else 256,
            num_speakers=max(len(speakers), 2),
            grl_scale=f.get("grl_scale", 1.0) if f else 1.0,
        ))
        disc = CombinedDiscriminator(
            use=tuple(cfg.model.get("discriminators", ["mpd"])),
            channel_mult=cfg.model.get("discriminator_channel_mult_factor", 1.0),
        )
        t = cfg.train
        seg = t.get("segment_frames", 64) * codec_cfg.hop
        self.dataset = SegmentAudioDataset(utts, p.sample_rate, seg)
        self.batch_size = t.batch_size
        train_cfg = GANTrainConfig(lr=t.adamw.lr)

        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        g_rng, d_rng, q_rng = jax.random.split(jax.random.key(t.get("seed", 0)), 3)
        tx = make_optimizer(train_cfg)
        g_params = self.codec.init(
            g_rng, example["audio"], example["sid"], q_rng, True
        )["params"]
        gstate = TrainState(
            step=jnp.zeros((), jnp.int32), params=g_params,
            opt_state=tx.init(g_params), rng=q_rng,
            apply_fn=self.codec.apply, tx=tx,
        )
        dstate = create_train_state(disc, d_rng, example["audio"], tx)
        self.states = {"g": gstate, "d": dstate}
        codec = self.codec
        sr = p.sample_rate
        mel_weight = t.get("mel_weight", 15.0)
        spk_weight = t.get("spk_adv_weight", 1.0)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(states, batch):
            gstate, dstate = states["g"], states["d"]
            audio, sid = batch["audio"], batch["sid"]
            rng, q_rng = jax.random.split(gstate.rng)

            recon0, _, _, _ = codec.apply(
                {"params": gstate.params}, audio, sid, q_rng, True
            )
            fake0 = jax.lax.stop_gradient(recon0)

            def d_loss_fn(dp):
                lr_, _ = dstate.apply_fn({"params": dp}, audio)
                lf_, _ = dstate.apply_fn({"params": dp}, fake0)
                loss, _, _ = discriminator_loss(lr_, lf_)
                return loss

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dstate.params)
            dstate = dstate.apply_gradients(d_grads)

            def g_loss_fn(gp):
                recon, _, _, losses = codec.apply(
                    {"params": gp}, audio, sid, q_rng, True
                )
                lr_, fr_ = dstate.apply_fn({"params": dstate.params}, audio)
                lf_, ff_ = dstate.apply_fn({"params": dstate.params}, recon)
                adv = generator_adv_loss(lf_)
                fm = feature_loss(fr_, ff_)
                ml = mel_weight * multiscale_mel_loss(audio, recon, sr)
                wl = jnp.mean(jnp.abs(audio - recon))
                spk = spk_weight * losses.pop("spk_adv", 0.0)
                vq = sum(losses.values())
                total = adv + fm + ml + wl + vq + spk
                return total, {"g_adv": adv, "g_mel": ml, "g_vq": vq,
                               "spk_adv": spk}

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
        (ckpt_dir.parent / "spk2id.json").write_text(_json.dumps(self.spk2id))
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
        sids = np.asarray([
            self.spk2id.get(
                self.dataset.utts[i].speaker or self.dataset.utts[i].singer
                or "default", 0)
            for i in idxs
        ], np.int32)
        return {"audio": jnp.asarray(audio), "sid": jnp.asarray(sids)}


class CocoTrainer(AmphionCodecTrainer):
    """RepCoco trainer (ref `models/codec/coco/rep_coco_trainer.py` +
    registry `bins/codec/train.py:20-24` 'RepCoco'): content-style /
    content / style FVQ tokenizers over SSL (or mel-proxy) features + F0,
    feature-reconstruction + VQ commitment losses (no GAN — the codec
    reconstructs features, not waveforms)."""

    def __init__(self, args, cfg):
        import functools

        import optax

        from amphion_tpu.models.codec.coco import CocoCodec, CocoConfig
        from amphion_tpu.ops.chroma import chroma_stft
        from amphion_tpu.ops.f0 import F0Config, yin_f0
        from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
        from amphion_tpu.runtime.train_state import TrainState

        self.cfg = cfg
        self.logger = get_logger("coco")
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        self.f0_cfg = F0Config.from_preprocess_cfg(p)
        self._mel = mel_spectrogram
        self._yin = yin_f0
        self._chroma = chroma_stft
        m = cfg.model.get("coco", None)
        self.mode = m.get("mode", "contentstyle") if m else "contentstyle"
        # the reference conditions the style stream on a real 24-bin
        # chromagram (`vevosing_utils.py:380`, rep_coco preprocess); the
        # YIN-f0 proxy stays available as a config knob
        self.style_feature = (m.get("style_feature", "chroma") if m
                              else "chroma")
        # per-dim SSL-feature standardization (ref rep_coco_trainer.py:96:
        # `(features - whisper_mean) / whisper_std`, stats from
        # `whisper_stats_path`); stats file is an .npz with mean/std
        self.content_stats = None
        if m and m.get("use_normed_whisper", False):
            stats = np.load(m.whisper_stats_path)
            self.content_stats = (stats["mean"].astype(np.float32),
                                  stats["std"].astype(np.float32))
        # SSL features from content_dir when extracted; else mel proxy
        self.content_dir = {
            ds: Path(p.processed_dir) / ds / p.get("content_dir", "content")
            for ds in cfg.dataset
        }
        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(Path(p.processed_dir) / ds / "train.json"))
        self.use_ssl = all(
            (self.content_dir[u.dataset] / f"{u.uid}.npy").is_file()
            for u in utts
        ) and len(utts) > 0
        feature_dim = (
            int(np.load(self.content_dir[utts[0].dataset]
                        / f"{utts[0].uid}.npy", mmap_mode="r").shape[-1])
            if self.use_ssl else p.n_mel
        )
        self.model = CocoCodec(CocoConfig(
            mode=self.mode,
            feature_dim=feature_dim,
            hidden=m.get("hidden", 512) if m else 512,
            codebook_size=m.get("codebook_size", 16384) if m else 16384,
            codebook_dim=m.get("codebook_dim", 16) if m else 16,
            downsample=m.get("downsample", 4) if m else 4,
            num_blocks=m.get("num_blocks", 4) if m else 4,
        ))
        t = cfg.train
        seg = t.get("segment_frames", 128) * p.hop_size
        self.dataset = SegmentAudioDataset(utts, p.sample_rate, seg)
        self.batch_size = t.batch_size

        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        tx = optax.adamw(t.adamw.lr)
        params = self.model.init(
            jax.random.key(t.get("seed", 0)), example["content"],
            example["f0"], example["style"],
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
                _, _, losses = model.apply(
                    {"params": prm}, batch["content"], batch["f0"],
                    batch["style"],
                )
                return sum(losses.values()), losses

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return state.apply_gradients(grads), aux

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
        if self.use_ssl:
            return self._batch_ssl(idxs)
        audio = np.stack([self.dataset[i]["audio"] for i in idxs])
        au = jnp.asarray(audio)
        mc = self.mel_cfg
        content = f0 = style = None
        if self.mode in ("contentstyle", "content"):
            content = self._mel(au, mc).transpose(0, 2, 1)
            if self.content_stats is not None:
                mean, std = self.content_stats
                content = (content - mean) / std
        if self.mode in ("contentstyle", "style"):
            if self.style_feature == "chroma":
                # centered chroma has T//hop + 1 frames; drop the last to
                # align with the mel frame grid (ref get_chromagram
                # truncates to the mel frame count the same way)
                style = self._chroma(au, mc.sample_rate, mc.n_fft,
                                     mc.hop_size, mc.win_size)
                style = style.transpose(0, 2, 1)[:, : audio.shape[1]
                                                 // mc.hop_size]
            else:
                f0, _ = self._yin(au, self.f0_cfg)
        feats = [x for x in (content, f0, style) if x is not None]
        if len(feats) > 1:
            n = min(x.shape[1] for x in feats)
            content = content[:, :n] if content is not None else None
            f0 = f0[:, :n] if f0 is not None else None
            style = style[:, :n] if style is not None else None
        return {"content": content, "f0": f0, "style": style}

    def _batch_ssl(self, idxs):
        """Window over pre-extracted SSL feature frames; F0 from the full
        utterance is interpolated to the SSL frame rate then windowed."""
        frames = self.cfg.train.get("segment_frames", 128)
        rng = np.random.default_rng(self.loop.epoch if hasattr(self, "loop")
                                    else 0)
        use_chroma = self.style_feature == "chroma"
        feats, f0s, styles = [], [], []
        for i in idxs:
            u = self.dataset.utts[i]
            feat = np.load(self.content_dir[u.dataset] / f"{u.uid}.npy")
            if self.content_stats is not None:
                mean, std = self.content_stats
                feat = (feat - mean) / std
            n = feat.shape[0]
            f0 = sty = None
            if self.mode in ("contentstyle", "style"):
                au = jnp.asarray(self.dataset.audio(i))[None]
                if use_chroma:
                    from amphion_tpu.ops.chroma import chromagram_for_frames

                    mc = self.mel_cfg
                    sty = chromagram_for_frames(
                        np.asarray(au)[0], n, mc.sample_rate, mc.n_fft,
                        mc.hop_size, mc.win_size)
                else:
                    f0_full, _ = self._yin(au, self.f0_cfg)
                    f0_full = np.asarray(f0_full)[0]
                    f0 = np.interp(np.linspace(0, len(f0_full) - 1, n),
                                   np.arange(len(f0_full)), f0_full)
            if n < frames:
                feat = np.pad(feat, ((0, frames - n), (0, 0)))
                if f0 is not None:
                    f0 = np.pad(f0, (0, frames - n))
                if sty is not None:
                    sty = np.pad(sty, ((0, frames - n), (0, 0)))
                start = 0
            else:
                start = int(rng.integers(0, n - frames + 1))
            feats.append(feat[start : start + frames])
            if f0 is not None:
                f0s.append(f0[start : start + frames])
            if sty is not None:
                styles.append(sty[start : start + frames])
        content = (jnp.asarray(np.stack(feats).astype(np.float32))
                   if self.mode in ("contentstyle", "content") else None)
        f0 = jnp.asarray(np.stack(f0s).astype(np.float32)) if f0s else None
        style = (jnp.asarray(np.stack(styles).astype(np.float32))
                 if styles else None)
        return {"content": content, "f0": f0, "style": style}


class DualCodecTrainer(AmphionCodecTrainer):
    """DualCodec trainer (ref `models/codec/dualcodec/` — dual-stream
    low-frame-rate codec with w2v-bert semantic distillation): GAN
    reconstruction like AmphionCodec plus the semantic-stream distillation
    loss. Distillation targets come from `content_dir` SSL .npy when
    extracted, else the on-device mel front end at the codec frame rate."""

    def __init__(self, args, cfg):
        import functools

        from amphion_tpu.models.codec.codec_trainer import multiscale_mel_loss
        from amphion_tpu.models.codec.dualcodec import DualCodec, DualCodecConfig
        from amphion_tpu.models.vocoders.gan_trainer import make_optimizer
        from amphion_tpu.models.vocoders.losses import (
            discriminator_loss,
            feature_loss,
            generator_adv_loss,
        )
        from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
        from amphion_tpu.runtime.train_state import TrainState, create_train_state

        self.cfg = cfg
        self.logger = get_logger("dualcodec")
        p = cfg.preprocess
        m = cfg.model.get("codec", None)
        codec_cfg = CodecConfig(
            sample_rate=p.sample_rate,
            strides=tuple(m.strides) if m else (4, 5, 6, 8),  # hop 960 → 25 Hz
            num_quantizers=m.num_quantizers if m else 12,
            codebook_size=m.codebook_size if m else 16384,
            codebook_dim=m.codebook_dim if m else 16,
            encoder_dim=m.get("encoder_dim", 32) if m else 32,
            latent_dim=m.get("latent_dim", 256) if m else 256,
            decoder_dim=m.get("decoder_dim", 32) if m else 32,
        )
        d = cfg.model.get("dualcodec", None)
        # semantic distillation at the codec frame rate (mel proxy default)
        self.sem_mel_cfg = MelConfig(
            sample_rate=p.sample_rate, n_fft=p.n_fft, win_size=p.win_size,
            hop_size=codec_cfg.hop, n_mel=p.n_mel, fmin=p.fmin, fmax=p.fmax,
        )
        self._mel = mel_spectrogram
        self.codec = DualCodec(DualCodecConfig(
            codec=codec_cfg,
            semantic_dim=p.n_mel,
            semantic_codebook_size=(d.get("semantic_codebook_size", 16384)
                                    if d else 16384),
            distill_weight=d.get("distill_weight", 1.0) if d else 1.0,
        ))
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
        train_cfg = GANTrainConfig(lr=t.adamw.lr)

        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        g_rng, d_rng, q_rng = jax.random.split(jax.random.key(t.get("seed", 0)), 3)
        tx = make_optimizer(train_cfg)
        g_params = self.codec.init(
            g_rng, example["audio"], example["sem_feats"], q_rng, True
        )["params"]
        gstate = TrainState(
            step=jnp.zeros((), jnp.int32), params=g_params,
            opt_state=tx.init(g_params), rng=q_rng,
            apply_fn=self.codec.apply, tx=tx,
        )
        dstate = create_train_state(disc, d_rng, example["audio"], tx)
        self.states = {"g": gstate, "d": dstate}
        codec, sr = self.codec, p.sample_rate
        mel_weight = t.get("mel_weight", 15.0)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(states, batch):
            gstate, dstate = states["g"], states["d"]
            audio, sem = batch["audio"], batch["sem_feats"]
            rng, q_rng = jax.random.split(gstate.rng)

            recon0, _, _ = codec.apply(
                {"params": gstate.params}, audio, sem, q_rng, True
            )
            fake0 = jax.lax.stop_gradient(recon0)

            def d_loss_fn(dp):
                lr_, _ = dstate.apply_fn({"params": dp}, audio)
                lf_, _ = dstate.apply_fn({"params": dp}, fake0)
                loss, _, _ = discriminator_loss(lr_, lf_)
                return loss

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dstate.params)
            dstate = dstate.apply_gradients(d_grads)

            def g_loss_fn(gp):
                recon, _, losses = codec.apply(
                    {"params": gp}, audio, sem, q_rng, True
                )
                lr_, fr_ = dstate.apply_fn({"params": dstate.params}, audio)
                lf_, ff_ = dstate.apply_fn({"params": dstate.params}, recon)
                adv = generator_adv_loss(lf_)
                fm = feature_loss(fr_, ff_)
                ml = mel_weight * multiscale_mel_loss(audio, recon, sr)
                wl = jnp.mean(jnp.abs(audio - recon))
                distill = losses.pop("distill", 0.0)
                vq = sum(losses.values())
                total = adv + fm + ml + wl + vq + distill
                return total, {"g_adv": adv, "g_mel": ml, "g_vq": vq,
                               "distill": distill}

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
        # frame-aligned semantic targets at the codec hop
        sem = self._mel(au, self.sem_mel_cfg).transpose(0, 2, 1)
        n = audio.shape[1] // self.sem_mel_cfg.hop_size
        return {"audio": au, "sem_feats": sem[:, :n]}


class SpeechTokenizerTrainer(AmphionCodecTrainer):
    """SpeechTokenizer trainer (ref `models/codec/speechtokenizer/model.py` —
    RVQ codec whose first layer is distilled toward SSL features): GAN
    reconstruction + L1 distillation of the RVQ-1 projection. Targets are
    the on-device mel front end at the codec frame rate (mel proxy; swap in
    `content_dir` SSL .npy when extracted, same convention as DualCodec)."""

    def __init__(self, args, cfg):
        import functools

        from amphion_tpu.models.codec.codec_trainer import multiscale_mel_loss
        from amphion_tpu.models.codec.speechtokenizer import (
            SpeechTokenizer, SpeechTokenizerConfig)
        from amphion_tpu.models.vocoders.gan_trainer import make_optimizer
        from amphion_tpu.models.vocoders.losses import (
            discriminator_loss,
            feature_loss,
            generator_adv_loss,
        )
        from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
        from amphion_tpu.runtime.train_state import TrainState, create_train_state

        self.cfg = cfg
        self.logger = get_logger("speechtokenizer")
        p = cfg.preprocess
        m = cfg.model.get("codec", None)
        codec_cfg = CodecConfig(
            sample_rate=p.sample_rate,
            strides=tuple(m.strides) if m else (2, 4, 5, 8),  # hop 320 → 50 Hz
            num_quantizers=m.num_quantizers if m else 8,
            codebook_size=m.codebook_size if m else 1024,
            codebook_dim=m.codebook_dim if m else 8,
            encoder_dim=m.get("encoder_dim", 32) if m else 32,
            latent_dim=m.get("latent_dim", 256) if m else 256,
            decoder_dim=m.get("decoder_dim", 32) if m else 32,
        )
        s = cfg.model.get("speechtokenizer", None)
        self.sem_mel_cfg = MelConfig(
            sample_rate=p.sample_rate, n_fft=p.n_fft, win_size=p.win_size,
            hop_size=codec_cfg.hop, n_mel=p.n_mel, fmin=p.fmin, fmax=p.fmax,
        )
        self._mel = mel_spectrogram
        self.codec = SpeechTokenizer(SpeechTokenizerConfig(
            codec=codec_cfg,
            n_q=codec_cfg.num_quantizers,
            codebook_size=codec_cfg.codebook_size,
            codebook_dim=codec_cfg.codebook_dim,
            semantic_dimension=p.n_mel,  # mel-proxy target dim
            lstm_layers=s.get("lstm_layers", 2) if s else 2,
            bidirectional=s.get("bidirectional", True) if s else True,
        ))
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
        train_cfg = GANTrainConfig(lr=t.adamw.lr)

        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        g_rng, d_rng = jax.random.split(jax.random.key(t.get("seed", 0)))
        tx = make_optimizer(train_cfg)
        g_params = self.codec.init(g_rng, example["audio"])["params"]
        gstate = TrainState(
            step=jnp.zeros((), jnp.int32), params=g_params,
            opt_state=tx.init(g_params), rng=g_rng,
            apply_fn=self.codec.apply, tx=tx,
        )
        dstate = create_train_state(disc, d_rng, example["audio"], tx)
        self.states = {"g": gstate, "d": dstate}
        codec, sr = self.codec, p.sample_rate
        mel_weight = t.get("mel_weight", 15.0)
        distill_weight = t.get("distill_weight", 1.0)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(states, batch):
            gstate, dstate = states["g"], states["d"]
            audio, sem = batch["audio"], batch["sem_feats"]

            recon0, _, _, _ = codec.apply({"params": gstate.params}, audio)
            fake0 = jax.lax.stop_gradient(recon0)

            def d_loss_fn(dp):
                lr_, _ = dstate.apply_fn({"params": dp}, audio)
                lf_, _ = dstate.apply_fn({"params": dp}, fake0)
                loss, _, _ = discriminator_loss(lr_, lf_)
                return loss

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dstate.params)
            dstate = dstate.apply_gradients(d_grads)

            def g_loss_fn(gp):
                recon, _, semantic, vq_losses = codec.apply({"params": gp}, audio)
                lr_, fr_ = dstate.apply_fn({"params": dstate.params}, audio)
                lf_, ff_ = dstate.apply_fn({"params": dstate.params}, recon)
                adv = generator_adv_loss(lf_)
                fm = feature_loss(fr_, ff_)
                ml = mel_weight * multiscale_mel_loss(audio, recon, sr)
                wl = jnp.mean(jnp.abs(audio - recon))
                n = min(semantic.shape[1], sem.shape[1])
                distill = distill_weight * jnp.mean(
                    jnp.abs(semantic[:, :n] - sem[:, :n]))
                vq = sum(vq_losses.values())
                total = adv + fm + ml + wl + vq + distill
                return total, {"g_adv": adv, "g_mel": ml, "g_vq": vq,
                               "distill": distill}

            (g_loss, aux), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(gstate.params)
            gstate = gstate.apply_gradients(g_grads)
            return {"g": gstate, "d": dstate}, {
                "d_loss": d_loss, "g_loss": g_loss, **aux}

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
        au = jnp.asarray(audio)
        sem = self._mel(au, self.sem_mel_cfg).transpose(0, 2, 1)
        n = audio.shape[1] // self.sem_mel_cfg.hop_size
        return {"audio": au, "sem_feats": sem[:, :n]}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="exp")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume_type", default="resume")
    args = parser.parse_args()
    cfg = load_config(args.config)
    supported_trainer = {"AmphionCodec": AmphionCodecTrainer,
                         "VQVAE": AmphionCodecTrainer,
                         "FAcodec": FACodecTrainer,
                         "FACodec": FACodecTrainer,
                         "RepCoco": CocoTrainer,
                         "Coco": CocoTrainer,
                         "DualCodec": DualCodecTrainer,
                         "SpeechTokenizer": SpeechTokenizerTrainer}
    trainer = supported_trainer[cfg.model_type](args, cfg)
    trainer.train_loop()


if __name__ == "__main__":
    main()
