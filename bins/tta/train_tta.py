"""TTA training CLI (reference: `bins/tta/train_tta.py:16-19` — registry:
AutoencoderKL / AudioLDM).

Wired: AutoencoderKL (stage 1 — mel VAE) and AudioLDM (stage 2 — latent
diffusion over the frozen stage-1 latents, text-conditioned).
"""

from __future__ import annotations

import argparse
import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from amphion_tpu.data.dataset import Prefetcher, SegmentAudioDataset
from amphion_tpu.data.metadata import load_metadata
from amphion_tpu.models.tta.autoencoder_kl import AutoencoderKL, AutoencoderKLConfig
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.runtime.loop import LoopConfig, TrainLoop
from amphion_tpu.runtime.train_state import TrainState
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


class AutoencoderKLTrainer:
    def __init__(self, args, cfg):
        self.cfg = cfg
        self.logger = get_logger("tta")
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        m = cfg.model.get("autoencoderkl", None)
        self.model = AutoencoderKL(AutoencoderKLConfig(
            base_channels=m.get("base_channels", 64) if m else 64,
            channel_mults=tuple(m.channel_mults) if m else (1, 2, 4),
            latent_channels=m.get("latent_channels", 8) if m else 8,
            kl_weight=m.get("kl_weight", 1e-6) if m else 1e-6,
        ))
        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(Path(p.processed_dir) / ds / "train.json"))
        t = cfg.train
        self.batch_size = t.batch_size
        frames = t.get("segment_frames", 256)
        self.dataset = SegmentAudioDataset(utts, p.sample_rate, frames * p.hop_size)

        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        tx = optax.adamw(t.adamw.lr)
        params = self.model.init(
            jax.random.key(t.get("seed", 0)), example["mel_img"],
            jax.random.key(1), method=AutoencoderKL.loss,
        )["params"]
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
            rng=jax.random.key(2), apply_fn=self.model.apply, tx=tx,
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(prm):
                return self.model.apply(
                    {"params": prm}, batch["mel_img"], sub,
                    method=AutoencoderKL.loss,
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
        audio = np.stack([self.dataset[i]["audio"] for i in idxs])
        mel = mel_spectrogram(jnp.asarray(audio), self.mel_cfg)  # (B, M, N)
        # image layout (B, T, F, 1); pad both axes to multiples of 4 for the
        # down/up path
        img = mel.transpose(0, 2, 1)[..., None]
        pt = (-img.shape[1]) % 4
        pf = (-img.shape[2]) % 4
        img = jnp.pad(img, ((0, 0), (0, pt), (0, pf), (0, 0)))
        return {"mel_img": img}

    def _data(self):
        n = len(self.dataset)
        order = np.random.default_rng(self.loop.epoch).permutation(n)

        def gen():
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                yield self._batch(order[i : i + self.batch_size].tolist())

        return Prefetcher(gen)

    def train_loop(self):
        return self.loop.run()


def _build_vae(cfg):
    m = cfg.model.get("autoencoderkl", None)
    return AutoencoderKL(AutoencoderKLConfig(
        base_channels=m.get("base_channels", 64) if m else 64,
        channel_mults=tuple(m.channel_mults) if m else (1, 2, 4),
        latent_channels=m.get("latent_channels", 8) if m else 8,
        kl_weight=m.get("kl_weight", 1e-6) if m else 1e-6,
    ))


class AudioLDMTrainer:
    """AudioLDM stage-2 trainer (ref `models/tta/ldm/audioldm_trainer.py:47`):
    eps-prediction latent diffusion over frozen AutoencoderKL mel-latents,
    text-conditioned with classifier-free dropout. Text embeddings come from
    a local T5 cache when available, else the deterministic hashed fallback
    (`encode_text`, zero-egress safe)."""

    def __init__(self, args, cfg):
        from amphion_tpu.models.tta.audioldm import (
            AudioLDM,
            AudioLDMConfig,
            encode_text,
        )

        self.cfg = cfg
        self.logger = get_logger("tta_ldm")
        self._encode_text = encode_text
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)

        # frozen stage-1 VAE
        self.vae = _build_vae(cfg)
        t = cfg.train
        vae_ckpt = t.get("vae_ckpt", "")
        if vae_ckpt:
            tree, _, _ = CheckpointManager(vae_ckpt).restore_raw()
            self.vae_params = tree["params"] if "params" in tree else tree
        else:
            self.logger.warning("no train.vae_ckpt: RANDOM VAE (smoke only)")
            self.vae_params = self.vae.init(
                jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1),
                method=AutoencoderKL.loss,
            )["params"]
        # latent mode (mu) — frozen encoder, jitted once
        self._vae_encode = jax.jit(lambda prm, x: self.vae.apply(
            {"params": prm}, x, method=AutoencoderKL.encode)[1])

        m = cfg.model.get("audioldm", None)
        self.model = AudioLDM(AudioLDMConfig(
            latent_channels=self.vae.cfg.latent_channels,
            base_channels=m.get("base_channels", 128) if m else 128,
            channel_mults=tuple(m.channel_mults) if m else (1, 2, 4),
            attn_levels=tuple(m.attn_levels) if m else (1, 2),
            num_heads=m.get("num_heads", 8) if m else 8,
            text_dim=m.get("text_dim", 768) if m else 768,
        ))
        self.text_backend = (m.get("text_backend", "auto") if m else "auto")

        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(Path(p.processed_dir) / ds / "train.json"))
        self.batch_size = t.batch_size
        frames = t.get("segment_frames", 256)
        self.dataset = SegmentAudioDataset(utts, p.sample_rate, frames * p.hop_size)

        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        tx = optax.adamw(t.adamw.lr)
        params = self.model.init(
            jax.random.key(t.get("seed", 0)), example["z0"], example["text_emb"],
            jax.random.key(1), method=AudioLDM.loss,
        )["params"]
        from amphion_tpu.utils.logging import model_summary

        model_summary(params, self.logger)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
            rng=jax.random.key(2), apply_fn=self.model.apply, tx=tx,
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(prm):
                return self.model.apply(
                    {"params": prm}, batch["z0"], batch["text_emb"], sub,
                    method=AudioLDM.loss,
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
        audio = np.stack([self.dataset[i]["audio"] for i in idxs])
        mel = mel_spectrogram(jnp.asarray(audio), self.mel_cfg)
        img = mel.transpose(0, 2, 1)[..., None]
        pt = (-img.shape[1]) % 4
        pf = (-img.shape[2]) % 4
        img = jnp.pad(img, ((0, 0), (0, pt), (0, pf), (0, 0)))
        z0 = self._vae_encode(self.vae_params, img)
        texts = [self.dataset.utts[i].text or "" for i in idxs]
        emb = self._encode_text(texts, self.model.cfg.text_dim, self.text_backend)
        return {"z0": z0, "text_emb": emb}

    def _data(self):
        n = len(self.dataset)
        order = np.random.default_rng(self.loop.epoch).permutation(n)

        def gen():
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                yield self._batch(order[i : i + self.batch_size].tolist())

        return Prefetcher(gen)

    def train_loop(self):
        return self.loop.run()


class PicoAudioTrainer:
    """PicoAudio trainer (ref `picoaudio/runner/controllable_train.py` +
    `models/controllable_diffusion.py:139`): latent diffusion over frozen
    AutoencoderKL mel-latents where temporal control rides 2 extra UNet
    input channels folded from the onset matrix, and the cross-attn
    context is a single event-class embedding. Utterance records carry the
    reference's ``onset`` string column
    (``event1__on1-off1_on2-off2--event2__...``); the event list comes
    from ``cfg.model.picoaudio.event_list`` or is scanned from the corpus.
    Clips are onset-aligned: segments crop from t=0 (the reference trains
    on fixed 10 s clips)."""

    def __init__(self, args, cfg):
        from amphion_tpu.models.tta.audioldm import AudioLDMConfig
        from amphion_tpu.models.tta.picoaudio import (
            PicoAudio,
            PicoAudioConfig,
            decode_onset_str,
        )

        self.cfg = cfg
        self.logger = get_logger("tta_pico")
        self._decode_onset = decode_onset_str
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)

        self.vae = _build_vae(cfg)
        t = cfg.train
        vae_ckpt = t.get("vae_ckpt", "")
        if vae_ckpt:
            tree, _, _ = CheckpointManager(vae_ckpt).restore_raw()
            self.vae_params = tree["params"] if "params" in tree else tree
        else:
            self.logger.warning("no train.vae_ckpt: RANDOM VAE (smoke only)")
            self.vae_params = self.vae.init(
                jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1),
                method=AutoencoderKL.loss,
            )["params"]
        from amphion_tpu.models.tta.autoencoder_kl import AutoencoderKL as _VAE

        self._vae_encode = jax.jit(lambda prm, x: self.vae.apply(
            {"params": prm}, x, method=_VAE.encode)[1])

        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(Path(p.processed_dir) / ds / "train.json"))
        utts = [u for u in utts if u.extras.get("onset")]
        assert utts, "PicoAudio needs utterances with an 'onset' string field"
        self.batch_size = t.batch_size
        frames = t.get("segment_frames", 256)
        self.frames = frames
        self.dataset = SegmentAudioDataset(utts, p.sample_rate, frames * p.hop_size)

        m = cfg.model.get("picoaudio", None)
        events = list(m.event_list) if m and m.get("event_list") else sorted(
            {ev.split("__")[0] for u in utts
             for ev in u.extras["onset"].split("--")})
        self.class2id = {e: i for i, e in enumerate(events)}
        # latent grid set by the VAE stride stack; onset rows fold into
        # 2 input channels over the latent freq width (ref 32 rows = 2x16)
        self.ds_factor = 2 ** (len(self.vae.cfg.channel_mults) - 1)
        self.latent_w = -(-self.mel_cfg.n_mel // self.ds_factor)
        self.latent_t = -(-frames // self.ds_factor)
        self.onset_rows = 2 * self.latent_w
        assert len(events) <= self.onset_rows, (
            f"{len(events)} event classes > {self.onset_rows} onset rows")
        self.model = PicoAudio(PicoAudioConfig(
            ldm=AudioLDMConfig(
                latent_channels=self.vae.cfg.latent_channels,
                base_channels=m.get("base_channels", 128) if m else 128,
                channel_mults=tuple(m.channel_mults) if m else (1, 2, 4),
                attn_levels=tuple(m.attn_levels) if m else (1, 2),
                num_heads=m.get("num_heads", 8) if m else 8,
                text_dim=m.get("text_dim", 768) if m else 768,
            ),
            onset_classes=self.onset_rows,
            event_classes=m.get("event_classes", max(len(events), 1)) if m
            else max(len(events), 1),
            snr_gamma=m.get("snr_gamma", 5.0) if m else 5.0,
            prediction_type=m.get("prediction_type", "epsilon") if m
            else "epsilon",
        ))

        example = self._batch(list(range(min(self.batch_size, len(utts)))))
        tx = optax.adamw(t.adamw.lr)
        params = self.model.init(
            jax.random.key(t.get("seed", 0)), example["z0"], example["onset"],
            example["event_id"], jax.random.key(1),
            method=PicoAudio.loss,
        )["params"]
        from amphion_tpu.utils.logging import model_summary

        model_summary(params, self.logger)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
            rng=jax.random.key(2), apply_fn=self.model.apply, tx=tx,
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(prm):
                return self.model.apply(
                    {"params": prm}, batch["z0"], batch["onset"],
                    batch["event_id"], sub, method=PicoAudio.loss,
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
        seg = self.dataset.segment_samples
        audio = np.zeros((len(idxs), seg), np.float32)
        onsets = np.zeros((len(idxs), self.onset_rows, self.latent_t), np.float32)
        event_ids = np.zeros((len(idxs),), np.int32)
        total_s = seg / self.dataset.sample_rate
        for j, i in enumerate(idxs):
            x = self.dataset.audio(i)[:seg]
            audio[j, : len(x)] = x
            roll, _, first = self._decode_onset(
                self.dataset.utts[i].extras["onset"], self.class2id,
                num_classes=self.onset_rows, frames=self.latent_t,
                grid_frames=self.latent_t, total_seconds=total_s)
            onsets[j] = roll
            event_ids[j] = first
        mel = mel_spectrogram(jnp.asarray(audio), self.mel_cfg)
        img = mel.transpose(0, 2, 1)[..., None]
        pt = (-img.shape[1]) % self.ds_factor
        pf = (-img.shape[2]) % self.ds_factor
        img = jnp.pad(img, ((0, 0), (0, pt), (0, pf), (0, 0)))
        z0 = self._vae_encode(self.vae_params, img)
        return {"z0": z0, "onset": jnp.asarray(onsets),
                "event_id": jnp.asarray(event_ids)}

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
    supported_trainer = {"AutoencoderKL": AutoencoderKLTrainer,
                         "AudioLDM": AudioLDMTrainer,
                         "PicoAudio": PicoAudioTrainer}
    trainer = supported_trainer[cfg.model_type](args, cfg)
    trainer.train_loop()


if __name__ == "__main__":
    main()
