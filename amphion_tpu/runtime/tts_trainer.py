"""TTS trainers: config-driven wiring for VITS (and friends).

The config-facing equivalent of the reference's TTS trainer stack
(reference: `models/tts/base/tts_trainer.py:27` + `models/tts/vits/
vits_trainer.py`): speaker LUT construction (`tts_trainer.py:644`), phone
symbol loading (`:706`), bucketed batching, fused G/D training step.
Linear spectrograms are computed on device per batch — no offline spec
files.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.audio_io import load_wav
from amphion_tpu.data.dataset import Prefetcher, pad_batch
from amphion_tpu.data.metadata import load_metadata
from amphion_tpu.models.tts.vits.vits import VITS, VITSConfig
from amphion_tpu.models.tts.vits.vits_trainer import (
    create_vits_states,
    make_vits_train_step,
)
from amphion_tpu.models.vocoders.gan_trainer import CombinedDiscriminator, GANTrainConfig
from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig
from amphion_tpu.ops.mel import MelConfig, linear_spectrogram
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.runtime.loop import LoopConfig, TrainLoop
from amphion_tpu.text.symbol_table import SymbolTable
from amphion_tpu.utils.logging import get_logger


class VITSTrainer:
    def __init__(self, args, cfg):
        self.args = args
        self.cfg = cfg
        self.logger = get_logger("vits", level=getattr(args, "log_level", "info"))
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        self.hop = p.hop_size

        # data + speaker LUT + symbol table
        self.utts = []
        for ds in cfg.dataset:
            self.utts.extend(
                load_metadata(Path(p.processed_dir) / ds / "train.json")
            )
        speakers = sorted({u.speaker or u.singer or "default" for u in self.utts})
        self.spk2id = {s: i for i, s in enumerate(speakers)}
        ds0 = cfg.dataset[0]
        self.symbols = SymbolTable.from_file(
            Path(p.processed_dir) / ds0 / p.symbols_dict
        )
        self.phone_dir = {
            ds: Path(p.processed_dir) / ds / p.phone_dir for ds in cfg.dataset
        }

        m = cfg.model.get("vits", None)
        dec_m = cfg.model.get("decoder", None)
        dec_cfg = (
            HiFiGANConfig.from_model_cfg(dec_m, n_mel=m.inter_channels if m else 192)
            if dec_m else HiFiGANConfig(n_mel=m.inter_channels if m else 192)
        )
        self.model_cfg = VITSConfig(
            num_phones=max(len(self.symbols) + 1, 64),
            spec_channels=p.n_fft // 2 + 1,
            inter_channels=m.inter_channels if m else 192,
            hidden_channels=m.hidden_channels if m else 192,
            filter_channels=m.filter_channels if m else 768,
            n_heads=m.n_heads if m else 2,
            n_layers=m.n_layers if m else 6,
            n_speakers=len(speakers) if len(speakers) > 1 else 0,
            segment_size=cfg.train.get("segment_size", 32),
            decoder=dec_cfg,
        )
        self.model = VITS(self.model_cfg)
        self.discriminator = CombinedDiscriminator(
            use=tuple(cfg.model.get("discriminators", ["mpd", "msd"])),
            channel_mult=cfg.model.get("discriminator_channel_mult_factor", 1.0),
        )
        t = cfg.train
        self.train_cfg = GANTrainConfig(
            lr=t.adamw.lr, adam_b1=t.adamw.adam_b1, adam_b2=t.adamw.adam_b2,
            lr_decay=t.exponential_lr.lr_decay,
        )
        self.batch_size = t.batch_size
        self.max_frames = t.get("max_frames", 600)
        self.max_phones = t.get("max_phones", 120)

        example = self._make_batch(self.utts[: self.batch_size])
        gstate, dstate = create_vits_states(
            self.model, self.discriminator, jax.random.key(t.get("seed", 0)),
            example, self.train_cfg,
        )
        self.states = {"g": gstate, "d": dstate}
        step_fn = make_vits_train_step(self.model, self.mel_cfg, self.train_cfg)

        def step(states, batch):
            g, d, metrics = step_fn(states["g"], states["d"], batch)
            return {"g": g, "d": d}, metrics

        ckpt_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name / "checkpoint"
        self.ckpt = CheckpointManager(
            ckpt_dir, list(t.get("save_checkpoint_stride", [1])),
            list(t.get("keep_last", [-1])),
        )
        # persist auxiliary state (speaker LUT), ref `tts_trainer.py:644`
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        (ckpt_dir.parent / "spk2id.json").write_text(json.dumps(self.spk2id))
        self.loop = TrainLoop(
            LoopConfig(
                max_epoch=t.get("max_epoch", -1), max_steps=t.get("max_steps", -1),
                log_interval=t.get("log_interval", 100),
                save_checkpoints_steps=t.get("save_checkpoints_steps", 0),
            ),
            step, self.states, self._data, ckpt=self.ckpt, logger=self.logger,
        )
        if getattr(args, "resume", False):
            self.loop.resume(
                getattr(args, "resume_from_ckpt_path", None) or None,
                getattr(args, "resume_type", "resume"),
            )

    def _phones(self, u) -> list[int]:
        path = self.phone_dir[u.dataset] / f"{u.uid}.json"
        return json.loads(path.read_text())

    def _make_batch(self, utts):
        phones, audios = [], []
        for u in utts:
            phones.append(np.asarray(self._phones(u)[: self.max_phones], np.int32))
            x, _ = load_wav(u.path, sr=self.mel_cfg.sample_rate)
            t = min(len(x), self.max_frames * self.hop)
            audios.append(x[: t // self.hop * self.hop])
        ph, ph_len = pad_batch(phones)
        au, au_len = pad_batch(audios)
        spec = np.asarray(
            linear_spectrogram(jnp.asarray(au), self.mel_cfg)
        ).transpose(0, 2, 1)
        n_frames = spec.shape[1]
        frame_mask = (
            np.arange(n_frames)[None, :] < (au_len // self.hop)[:, None]
        ).astype(np.float32)
        phone_mask = (
            np.arange(ph.shape[1])[None, :] < ph_len[:, None]
        ).astype(np.float32)
        sids = np.asarray(
            [self.spk2id.get(u.speaker or u.singer or "default", 0) for u in utts],
            np.int32,
        )
        return {
            "phones": jnp.asarray(ph),
            "phone_mask": jnp.asarray(phone_mask),
            "spec": jnp.asarray(spec),
            "spec_mask": jnp.asarray(frame_mask),
            "audio": jnp.asarray(au),
            "sid": jnp.asarray(sids),
        }

    def _data(self):
        order = np.random.default_rng(self.loop.epoch).permutation(len(self.utts))

        def gen():
            for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
                yield self._make_batch(
                    [self.utts[j] for j in order[i : i + self.batch_size]]
                )

        return Prefetcher(gen)

    def train_loop(self):
        return self.loop.run()
