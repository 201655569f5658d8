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
        ids = json.loads(path.read_text())
        if self.cfg.preprocess.get("add_blank", True):
            # ref `models/tts/base/tts_dataset.py:212` (config/tts.json:19)
            from amphion_tpu.text import intersperse
            ids = intersperse(ids, 0)
        return ids

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


class VALLETrainer:
    """VALL-E codec-LM trainer (ref `models/tts/valle/valle_trainer.py:25`):
    consumes phone sequences + codec codes extracted by
    `bins/tts/preprocess.py --extract_codes`. Trains both AR and NAR stages
    jointly (the reference's --train_stage 1|2 split is subsumed: each batch
    computes the AR loss on codebook 0 and the NAR loss on a random stage)."""

    def __init__(self, args, cfg):
        import optax

        from amphion_tpu.data.samplers import LengthBucketSampler
        from amphion_tpu.models.tts.valle.valle import VALLE, VALLEConfig
        from amphion_tpu.runtime.train_state import TrainState

        self.args = args
        self.cfg = cfg
        self.logger = get_logger("valle", level=getattr(args, "log_level", "info"))
        p = cfg.preprocess
        self.utts = []
        for ds in cfg.dataset:
            self.utts.extend(
                load_metadata(Path(p.processed_dir) / ds / "train.json")
            )
        self.code_dir = {
            ds: Path(p.processed_dir) / ds / "codes" for ds in cfg.dataset
        }
        self.phone_dir = {
            ds: Path(p.processed_dir) / ds / p.phone_dir for ds in cfg.dataset
        }
        # keep only utterances that have both phones and codes
        self.utts = [
            u for u in self.utts
            if (self.code_dir[u.dataset] / f"{u.uid}.npy").is_file()
            and (self.phone_dir[u.dataset] / f"{u.uid}.json").is_file()
        ]
        assert self.utts, "no utterances with codes+phones; run preprocess with --extract_codes"
        self.symbols = SymbolTable.from_file(
            Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict
        )

        m = cfg.model.get("valle", None)
        self.model = VALLE(VALLEConfig(
            num_phones=max(len(self.symbols) + 1, 64),
            audio_vocab=m.audio_vocab if m else 1024,
            num_quantizers=m.num_quantizers if m else 8,
            hidden=m.hidden if m else 1024,
            num_layers=m.num_layers if m else 12,
            num_heads=m.num_heads if m else 16,
            max_position=m.get("max_position", 4096) if m else 4096,
            remat=m.get("remat", False) if m else False,
            # ref `egs/tts/VALLE/exp_config.json:22` trains with prefix_mode 1
            prefix_mode=m.get("prefix_mode", 1) if m else 1,
        ))
        t = cfg.train
        lengths = []
        for u in self.utts:
            codes = np.load(self.code_dir[u.dataset] / f"{u.uid}.npy",
                            mmap_mode="r")
            lengths.append(int(codes.shape[-1]))
        self.sampler = LengthBucketSampler(
            lengths, max_tokens=t.get("max_tokens", 8192),
            min_bucket=t.get("min_bucket", 64), seed=t.get("seed", 0),
        )
        self.max_phones = t.get("max_phones", 256)

        first = next(iter(self.sampler))
        example = self._make_batch(*first)
        from amphion_tpu.runtime.optimizers import maybe_accumulate

        tx = optax.adamw(t.adamw.lr, b1=t.adamw.get("adam_b1", 0.9),
                         b2=t.adamw.get("adam_b2", 0.95),
                         weight_decay=t.adamw.get("weight_decay", 0.01))
        tx = maybe_accumulate(
            optax.chain(optax.clip_by_global_norm(1.0), tx), t)
        params = self.model.init(
            jax.random.key(t.get("seed", 0)), example["phones"],
            example["phone_mask"], example["tokens"], example["token_mask"],
            jax.random.key(1), method=type(self.model).train_loss,
        )["params"]
        from amphion_tpu.utils.logging import model_summary

        model_summary(params, self.logger)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), rng=jax.random.key(2),
            apply_fn=self.model.apply, tx=tx,
        )

        import functools

        model = self.model

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(prm):
                return model.apply(
                    {"params": prm}, batch["phones"], batch["phone_mask"],
                    batch["tokens"], batch["token_mask"], sub,
                    method=type(model).train_loss,
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

    def _make_batch(self, indices, bucket):
        phones, codes, code_lens = [], [], []
        for i in indices:
            u = self.utts[i]
            ph = json.loads((self.phone_dir[u.dataset] / f"{u.uid}.json").read_text())
            phones.append(np.asarray(ph[: self.max_phones], np.int32))
            c = np.load(self.code_dir[u.dataset] / f"{u.uid}.npy")  # (Q, N)
            codes.append(c[:, :bucket])
            code_lens.append(min(c.shape[1], bucket))
        ph, ph_len = pad_batch(phones)
        q = codes[0].shape[0]
        toks = np.zeros((len(codes), q, bucket), np.int32)
        for r, c in enumerate(codes):
            toks[r, :, : c.shape[1]] = c
        token_mask = (
            np.arange(bucket)[None, :] < np.asarray(code_lens)[:, None]
        ).astype(np.float32)
        phone_mask = (
            np.arange(ph.shape[1])[None, :] < ph_len[:, None]
        ).astype(np.float32)
        return {
            "phones": jnp.asarray(ph), "phone_mask": jnp.asarray(phone_mask),
            "tokens": jnp.asarray(toks), "token_mask": jnp.asarray(token_mask),
        }

    def _data(self):
        def gen():
            for indices, bucket in self.sampler:
                yield self._make_batch(indices, bucket)

        return Prefetcher(gen)

    def train_loop(self):
        return self.loop.run()


class FastSpeech2Trainer:
    """FastSpeech2 trainer (ref `models/tts/fastspeech2/fs2_trainer.py` +
    MFA recipe `egs/tts/FastSpeech2/{run.sh,prepare_mfa.sh}`): phone +
    duration supervision comes from MFA TextGrids
    (`<processed>/<ds>/textgrids/<uid>.TextGrid`), parsed natively; pitch /
    energy / mel are computed on device per batch (normalized log-F0)."""

    def __init__(self, args, cfg):
        import optax

        from amphion_tpu.data.processors.duration import textgrid_to_durations
        from amphion_tpu.models.tts.fastspeech2.fs2 import (
            FastSpeech2,
            FastSpeech2Config,
            fastspeech2_loss,
        )
        from amphion_tpu.ops.energy import energy_from_log_mel
        from amphion_tpu.ops.f0 import F0Config, yin_f0
        from amphion_tpu.ops.mel import mel_spectrogram
        from amphion_tpu.runtime.train_state import TrainState
        from amphion_tpu.text.symbol_table import SymbolTable

        self.args = args
        self.cfg = cfg
        self.logger = get_logger("fs2", level=getattr(args, "log_level", "info"))
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        self.f0_cfg = F0Config.from_preprocess_cfg(p)
        self.hop = p.hop_size
        self._mel_fn = mel_spectrogram
        self._f0_fn = yin_f0
        self._energy_fn = energy_from_log_mel

        utts, self.align = [], {}
        table = SymbolTable.from_symbols(["_", "sil"])
        for ds in cfg.dataset:
            for u in load_metadata(Path(p.processed_dir) / ds / "train.json"):
                tg = Path(p.processed_dir) / ds / "textgrids" / f"{u.uid}.TextGrid"
                if not tg.is_file():
                    continue
                phones, durs = textgrid_to_durations(
                    tg, self.hop, p.sample_rate
                )
                for ph in phones:
                    table.add(ph)
                self.align[u.uid] = (phones, durs)
                utts.append(u)
        assert utts, ("no utterances with TextGrids; run MFA over the corpus "
                      "exported by prepare_mfa_corpus()")
        self.utts = utts
        self.symbols = table
        speakers = sorted({u.speaker or "default" for u in utts})
        self.spk2id = {s: i for i, s in enumerate(speakers)}

        t = cfg.train
        self.batch_size = t.batch_size
        self.max_frames = t.get("max_frames", 600)
        m = cfg.model.get("fastspeech2", None)
        self.model = FastSpeech2(FastSpeech2Config(
            num_phones=max(len(table) + 1, 64),
            hidden=m.hidden if m else 256,
            n_enc_layers=m.n_enc_layers if m else 4,
            n_dec_layers=m.n_dec_layers if m else 6,
            n_heads=m.n_heads if m else 2,
            ffn_hidden=m.ffn_hidden if m else 1024,
            kernel_size=m.get("kernel_size", 9) if m else 9,
            n_mel=p.n_mel,
            max_frames=self.max_frames,
            n_speakers=len(speakers) if len(speakers) > 1 else 0,
        ))
        self._loss_fn = fastspeech2_loss

        example = self._make_batch(self.utts[: self.batch_size])
        tx = optax.adamw(t.adamw.lr)
        params = self.model.init(
            jax.random.key(t.get("seed", 0)), example["phones"],
            example["phone_mask"], example["durations"], example["pitch"],
            example["energy"], example["sid"],
        )["params"]
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), rng=jax.random.key(1),
            apply_fn=self.model.apply, tx=tx,
        )

        import functools

        model, loss_fn = self.model, self._loss_fn

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            def lf(prm):
                out = model.apply(
                    {"params": prm}, batch["phones"], batch["phone_mask"],
                    batch["durations"], batch["pitch"], batch["energy"],
                    batch["sid"],
                )
                return loss_fn(out, batch)

            (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
            return state.apply_gradients(grads), aux

        ckpt_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name / "checkpoint"
        self.ckpt = CheckpointManager(
            ckpt_dir, list(t.get("save_checkpoint_stride", [1])),
            list(t.get("keep_last", [-1])),
        )
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.symbols.to_file(ckpt_dir.parent / "symbols.dict")
        self.loop = TrainLoop(
            LoopConfig(max_epoch=t.get("max_epoch", -1),
                       max_steps=t.get("max_steps", -1),
                       log_interval=t.get("log_interval", 100),
                       save_checkpoints_steps=t.get("save_checkpoints_steps", 0)),
            step, self.state, self._data, ckpt=self.ckpt, logger=self.logger,
        )
        if getattr(args, "resume", False):
            self.loop.resume(None, getattr(args, "resume_type", "resume"))

    def _make_batch(self, utts):
        mf = self.max_frames
        b = len(utts)
        audios = []
        phone_rows, dur_rows = [], []
        for u in utts:
            phones, durs = self.align[u.uid]
            ids = np.asarray([self.symbols[p] for p in phones], np.int32)
            # clip total duration to max_frames
            cum = np.cumsum(durs)
            keep = cum <= mf
            if not keep.any():  # first phone alone exceeds max_frames
                keep[0] = True
                durs = np.minimum(durs, mf)
            phone_rows.append(ids[keep])
            dur_rows.append(np.asarray(durs)[keep])
            x, _ = load_wav(u.path, sr=self.mel_cfg.sample_rate)
            n = int(np.asarray(durs)[keep].sum())
            seg = np.zeros(mf * self.hop, np.float32)
            seg[: min(len(x), n * self.hop)] = x[: n * self.hop]
            audios.append(seg)
        ph, ph_len = pad_batch(phone_rows)
        du, _ = pad_batch(dur_rows)
        au = np.stack(audios)
        mel = self._mel_fn(jnp.asarray(au), self.mel_cfg)  # (B, M, N)
        f0, _ = self._f0_fn(jnp.asarray(au), self.f0_cfg)
        energy = self._energy_fn(mel)
        # normalized log-F0 (dataset-free running normalization: log1p/std≈1)
        pitch = jnp.log1p(f0)
        pitch = (pitch - jnp.mean(pitch)) / (jnp.std(pitch) + 1e-5)
        energy_n = (energy - jnp.mean(energy)) / (jnp.std(energy) + 1e-5)
        phone_mask = (
            np.arange(ph.shape[1])[None, :] < ph_len[:, None]
        ).astype(np.float32)
        sids = np.asarray([self.spk2id.get(u.speaker or "default", 0)
                           for u in utts], np.int32)
        return {
            "phones": jnp.asarray(ph), "phone_mask": jnp.asarray(phone_mask),
            "durations": jnp.asarray(du),
            "pitch": pitch, "energy": energy_n,
            "mel": mel.transpose(0, 2, 1),
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


class MaskGCTTrainer:
    """MaskGCT trainer: joint T2S + S2A masked-generative objectives.

    Consumes `bins/tts/preprocess.py --extract_semantic` (semantic tokens +
    quantized latents) and `--extract_codes` (acoustic RVQ codes), plus phone
    sequences — the same two-stage data contract as the reference
    (`models/tts/maskgct/` trainers with w2v-bert semantic tokens)."""

    def __init__(self, args, cfg):
        import optax

        from amphion_tpu.data.samplers import LengthBucketSampler
        from amphion_tpu.models.tts.maskgct.maskgct import (
            MaskGCTS2A,
            MaskGCTT2S,
            S2AConfig,
            T2SConfig,
        )
        from amphion_tpu.runtime.train_state import TrainState

        self.args = args
        self.cfg = cfg
        self.logger = get_logger("maskgct", level=getattr(args, "log_level", "info"))
        p = cfg.preprocess
        self.utts = []
        for ds in cfg.dataset:
            self.utts.extend(
                load_metadata(Path(p.processed_dir) / ds / "train.json")
            )
        root = {ds: Path(p.processed_dir) / ds for ds in cfg.dataset}
        self.dirs = {
            "phones": {ds: r / p.phone_dir for ds, r in root.items()},
            "semantic": {ds: r / "semantic" for ds, r in root.items()},
            "semantic_feats": {ds: r / "semantic_feats" for ds, r in root.items()},
            "codes": {ds: r / "codes" for ds, r in root.items()},
        }
        self.utts = [
            u for u in self.utts
            if all((self.dirs[k][u.dataset] / f"{u.uid}.{ext}").is_file()
                   for k, ext in [("phones", "json"), ("semantic", "npy"),
                                  ("semantic_feats", "npy"), ("codes", "npy")])
        ]
        assert self.utts, ("missing features: run preprocess with "
                           "--extract_semantic --extract_codes")
        self.symbols = SymbolTable.from_file(
            Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict
        )

        mt = cfg.model.get("t2s", None)
        ms = cfg.model.get("s2a", None)
        sem_dim = int(np.load(
            self.dirs["semantic_feats"][self.utts[0].dataset]
            / f"{self.utts[0].uid}.npy").shape[-1])
        n_q = int(np.load(
            self.dirs["codes"][self.utts[0].dataset]
            / f"{self.utts[0].uid}.npy").shape[0])
        self.t2s = MaskGCTT2S(T2SConfig(
            hidden=mt.hidden if mt else 1024,
            num_layers=mt.num_layers if mt else 16,
            num_heads=mt.num_heads if mt else 16,
            codebook_size=mt.codebook_size if mt else 8192,
            phone_vocab=max(len(self.symbols) + 1, 64),
            remat=mt.get("remat", False) if mt else False,
        ))
        self.s2a = MaskGCTS2A(S2AConfig(
            hidden=ms.hidden if ms else 1024,
            num_layers=ms.num_layers if ms else 16,
            num_heads=ms.num_heads if ms else 16,
            codebook_size=ms.codebook_size if ms else 1024,
            num_quantizers=n_q,
            semantic_dim=sem_dim,
            remat=ms.get("remat", False) if ms else False,
        ))

        t = cfg.train
        lengths = []
        for u in self.utts:
            lengths.append(int(np.load(
                self.dirs["semantic"][u.dataset] / f"{u.uid}.npy",
                mmap_mode="r").shape[-1]))
        self.sampler = LengthBucketSampler(
            lengths, max_tokens=t.get("max_tokens", 8192),
            min_bucket=t.get("min_bucket", 64), seed=t.get("seed", 0),
        )
        self.max_phones = t.get("max_phones", 256)

        example = self._make_batch(*next(iter(self.sampler)))
        from amphion_tpu.runtime.optimizers import maybe_accumulate

        tx = maybe_accumulate(optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(t.adamw.lr)
        ), t)
        r = jax.random.key(t.get("seed", 0))
        t2s_params = self.t2s.init(
            r, example["semantic"], example["x_mask"], example["phones"],
            example["phone_mask"], jax.random.key(1),
            method=MaskGCTT2S.compute_loss,
        )["params"]
        s2a_params = self.s2a.init(
            r, example["codes"], example["x_mask"], example["semantic_feats"],
            jax.random.key(1), method=MaskGCTS2A.compute_loss,
        )["params"]
        params = {"t2s": t2s_params, "s2a": s2a_params}
        from amphion_tpu.utils.logging import model_summary

        model_summary(params, self.logger)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), rng=jax.random.key(2),
            apply_fn=None, tx=tx,
        )

        import functools

        t2s, s2a = self.t2s, self.s2a

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state, batch):
            rng, r1, r2 = jax.random.split(state.rng, 3)

            def loss_fn(prm):
                l1, a1 = t2s.apply(
                    {"params": prm["t2s"]}, batch["semantic"], batch["x_mask"],
                    batch["phones"], batch["phone_mask"], r1,
                    method=MaskGCTT2S.compute_loss,
                )
                l2, a2 = s2a.apply(
                    {"params": prm["s2a"]}, batch["codes"], batch["x_mask"],
                    batch["semantic_feats"], r2,
                    method=MaskGCTS2A.compute_loss,
                )
                return l1 + l2, {**a1, **a2}

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
            step_fn, self.state, self._data, ckpt=self.ckpt, logger=self.logger,
        )
        if getattr(args, "resume", False):
            self.loop.resume(None, getattr(args, "resume_type", "resume"))

    def _make_batch(self, indices, bucket):
        b = len(indices)
        phones_rows = []
        sem = np.zeros((b, bucket), np.int32)
        codes = None
        feats = None
        x_len = np.zeros(b, np.int32)
        for r, i in enumerate(indices):
            u = self.utts[i]
            ph = json.loads(
                (self.dirs["phones"][u.dataset] / f"{u.uid}.json").read_text()
            )
            phones_rows.append(np.asarray(ph[: self.max_phones], np.int32))
            s = np.load(self.dirs["semantic"][u.dataset] / f"{u.uid}.npy")
            c = np.load(self.dirs["codes"][u.dataset] / f"{u.uid}.npy")
            f = np.load(self.dirs["semantic_feats"][u.dataset] / f"{u.uid}.npy")
            n = min(len(s), c.shape[1], f.shape[0], bucket)
            x_len[r] = n
            sem[r, :n] = s[:n]
            if codes is None:
                codes = np.zeros((b, c.shape[0], bucket), np.int32)
                feats = np.zeros((b, bucket, f.shape[1]), np.float32)
            codes[r, :, :n] = c[:, :n]
            feats[r, :n] = f[:n]
        ph, ph_len = pad_batch(phones_rows)
        return {
            "phones": jnp.asarray(ph),
            "phone_mask": jnp.asarray(
                (np.arange(ph.shape[1])[None] < ph_len[:, None]).astype(np.float32)
            ),
            "semantic": jnp.asarray(sem),
            "codes": jnp.asarray(codes),
            "semantic_feats": jnp.asarray(feats),
            "x_mask": jnp.asarray(
                (np.arange(bucket)[None] < x_len[:, None]).astype(np.float32)
            ),
        }

    def _data(self):
        def gen():
            for indices, bucket in self.sampler:
                yield self._make_batch(indices, bucket)

        return Prefetcher(gen)

    def train_loop(self):
        return self.loop.run()


class JetsTrainer:
    """JETS trainer (ref `models/tts/jets/jets.py` + GAN losses
    `jets_loss.py`): end-to-end text→wave with the internal aligner — no
    external durations needed. Mel/pitch/energy targets come from the
    on-device front end; D and G update in one fused step."""

    def __init__(self, args, cfg):
        import functools

        from amphion_tpu.models.tts.jets.jets import Jets, JetsConfig
        from amphion_tpu.models.tts.fastspeech2.fs2 import FastSpeech2Config
        from amphion_tpu.models.vocoders.gan_trainer import (
            CombinedDiscriminator as _CD, GANTrainConfig, make_optimizer,
        )
        from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig as _HG
        from amphion_tpu.models.vocoders.losses import (
            discriminator_loss, feature_loss, generator_adv_loss, mel_loss,
        )
        from amphion_tpu.ops.energy import energy_from_log_mel
        from amphion_tpu.ops.f0 import F0Config, yin_f0
        from amphion_tpu.ops.mel import mel_spectrogram
        from amphion_tpu.runtime.train_state import TrainState, create_train_state

        self.cfg = cfg
        self.logger = get_logger("jets", level=getattr(args, "log_level", "info"))
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        self.f0_cfg = F0Config.from_preprocess_cfg(p)
        self.hop = p.hop_size
        self._mel_fn, self._f0_fn, self._energy_fn = (
            mel_spectrogram, yin_f0, energy_from_log_mel,
        )

        self.utts = []
        for ds in cfg.dataset:
            self.utts.extend(
                load_metadata(Path(p.processed_dir) / ds / "train.json")
            )
        self.symbols = SymbolTable.from_file(
            Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict
        )
        self.phone_dir = {
            ds: Path(p.processed_dir) / ds / p.phone_dir for ds in cfg.dataset
        }
        t = cfg.train
        self.batch_size = t.batch_size
        self.max_frames = t.get("max_frames", 256)
        self.max_phones = t.get("max_phones", 64)

        m = cfg.model.get("jets", None)
        dec_m = cfg.model.get("decoder", None)
        hidden = m.hidden if m else 256
        fs2 = FastSpeech2Config(
            num_phones=max(len(self.symbols) + 1, 64), hidden=hidden,
            n_enc_layers=m.get("n_enc_layers", 2) if m else 2,
            n_dec_layers=m.get("n_dec_layers", 2) if m else 2,
            n_heads=m.get("n_heads", 2) if m else 2,
            ffn_hidden=m.get("ffn_hidden", 4 * hidden) if m else 4 * hidden,
            n_mel=p.n_mel, max_frames=self.max_frames,
            # JETS variance adaptor is token-level (ref jets.py:512-517:
            # pitch/energy averaged over Viterbi durations)
            pitch_level="phoneme", energy_level="phoneme",
        )
        dec = (
            _HG.from_model_cfg(dec_m, n_mel=hidden) if dec_m
            else _HG(n_mel=hidden)
        )
        self.model = Jets(JetsConfig(fs2=fs2, decoder=dec))
        self.discriminator = _CD(
            use=tuple(cfg.model.get("discriminators", ["mpd", "msd"])),
            mpd_periods=tuple(cfg.model.get("mpd_periods", (2, 3, 5, 7, 11))),
            msd_scales=cfg.model.get("msd_scales", 3),
            channel_mult=cfg.model.get("discriminator_channel_mult_factor", 1.0),
        )
        gan_cfg = GANTrainConfig(lr=t.adamw.lr, adam_b1=t.adamw.get("adam_b1", 0.8),
                                 adam_b2=t.adamw.get("adam_b2", 0.99))
        tx = make_optimizer(gan_cfg)
        example = self._make_batch(self.utts[: self.batch_size])
        rng = jax.random.key(t.get("seed", 0))
        g_params = self.model.init(
            rng, example["phones"], example["phone_mask"], example["mel"],
            example["mel_mask"], example["pitch"], example["energy"],
            method=type(self.model).train_forward,
        )["params"]
        gstate = TrainState(
            step=jnp.zeros((), jnp.int32), params=g_params,
            opt_state=tx.init(g_params), rng=rng,
            apply_fn=self.model.apply, tx=tx,
        )
        dstate = create_train_state(
            self.discriminator, jax.random.key(1), example["audio"], tx
        )
        self.states = {"g": gstate, "d": dstate}
        model, mel_cfg = self.model, self.mel_cfg

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(states, batch):
            g, d = states["g"], states["d"]

            def fwd(prm):
                return model.apply(
                    {"params": prm}, batch["phones"], batch["phone_mask"],
                    batch["mel"], batch["mel_mask"], batch["pitch"],
                    batch["energy"], method=type(model).train_forward,
                )

            wav0, _, _ = fwd(g.params)
            fake0 = jax.lax.stop_gradient(wav0)
            real = batch["audio"]

            def d_loss_fn(dp):
                lr_, _ = d.apply_fn({"params": dp}, real)
                lf_, _ = d.apply_fn({"params": dp}, fake0)
                loss, _, _ = discriminator_loss(lr_, lf_)
                return loss

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d.params)
            d = d.apply_gradients(d_grads)

            def g_loss_fn(gp):
                wav, fmask, aux = fwd(gp)
                lr_, fr_ = d.apply_fn({"params": d.params}, real)
                lf_, ff_ = d.apply_fn({"params": d.params}, wav)
                adv = generator_adv_loss(lf_)
                fm = feature_loss(fr_, ff_)
                ml = mel_loss(real, wav, mel_cfg)
                pm = batch["phone_mask"]
                pden = jnp.maximum(jnp.sum(pm), 1.0)
                pitch_l = jnp.sum(
                    (aux["pitch_pred"] - aux["pitch_tgt"]) ** 2 * pm) / pden
                energy_l = jnp.sum(
                    (aux["energy_pred"] - aux["energy_tgt"]) ** 2 * pm) / pden
                total = (adv + fm + ml + 2.0 * aux["align_loss"]
                         + aux["dur_loss"] + pitch_l + energy_l)
                return total, {"g_adv": adv, "g_fm": fm, "g_mel": ml,
                               "align": aux["align_loss"], "dur": aux["dur_loss"]}

            (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                g.params
            )
            g = g.apply_gradients(g_grads)
            return {"g": g, "d": d}, {"d_loss": d_loss, "g_loss": g_loss, **aux}

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

    def _make_batch(self, utts):
        mf = self.max_frames
        phones = []
        audios = np.zeros((len(utts), mf * self.hop), np.float32)
        mel_len = np.zeros(len(utts), np.int32)
        for r, u in enumerate(utts):
            ph = json.loads(
                (self.phone_dir[u.dataset] / f"{u.uid}.json").read_text()
            )
            phones.append(np.asarray(ph[: self.max_phones], np.int32))
            x, _ = load_wav(u.path, sr=self.mel_cfg.sample_rate)
            n = min(len(x) // self.hop, mf)
            audios[r, : n * self.hop] = x[: n * self.hop]
            mel_len[r] = n
        ph, ph_len = pad_batch(phones)
        au = jnp.asarray(audios)
        mel = self._mel_fn(au, self.mel_cfg).transpose(0, 2, 1)
        f0, _ = self._f0_fn(au, self.f0_cfg)
        energy = self._energy_fn(mel.transpose(0, 2, 1))
        pitch = jnp.log1p(f0)
        pitch = (pitch - jnp.mean(pitch)) / (jnp.std(pitch) + 1e-5)
        energy = (energy - jnp.mean(energy)) / (jnp.std(energy) + 1e-5)
        return {
            "phones": jnp.asarray(ph),
            "phone_mask": jnp.asarray(
                (np.arange(ph.shape[1])[None] < ph_len[:, None]).astype(np.float32)
            ),
            "mel": mel,
            "mel_mask": jnp.asarray(
                (np.arange(mf)[None] < mel_len[:, None]).astype(np.float32)
            ),
            "pitch": pitch, "energy": energy, "audio": au,
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


class NS2Trainer:
    """NaturalSpeech2 trainer (ref `models/tts/naturalspeech2/ns2_trainer.py`):
    latent diffusion over continuous frame representations with prompt-based
    zero-shot conditioning. Latents default to mel (self-contained); a codec
    checkpoint can supply true codec latents. Durations from TextGrids."""

    def __init__(self, args, cfg):
        import functools
        import optax

        from amphion_tpu.data.processors.duration import textgrid_to_durations
        from amphion_tpu.models.tts.naturalspeech2.ns2 import (
            NaturalSpeech2, ns2_config_from_model_cfg,
        )
        from amphion_tpu.ops.f0 import F0Config, yin_f0
        from amphion_tpu.ops.mel import mel_spectrogram
        from amphion_tpu.runtime.train_state import TrainState
        from amphion_tpu.text.symbol_table import SymbolTable

        self.cfg = cfg
        self.logger = get_logger("ns2", level=getattr(args, "log_level", "info"))
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        self.f0_cfg = F0Config.from_preprocess_cfg(p)
        self.hop = p.hop_size
        self._mel_fn, self._f0_fn = mel_spectrogram, yin_f0

        utts, self.align = [], {}
        table = SymbolTable.from_symbols(["_", "sil"])
        for ds in cfg.dataset:
            for u in load_metadata(Path(p.processed_dir) / ds / "train.json"):
                tg = Path(p.processed_dir) / ds / "textgrids" / f"{u.uid}.TextGrid"
                if not tg.is_file():
                    continue
                phones, durs = textgrid_to_durations(tg, self.hop, p.sample_rate)
                for ph in phones:
                    table.add(ph)
                self.align[u.uid] = (phones, durs)
                utts.append(u)
        assert utts, "no TextGrids found (see FastSpeech2 recipe for MFA)"
        self.utts, self.symbols = utts, table

        t = cfg.train
        self.batch_size = t.batch_size
        self.max_frames = t.get("max_frames", 600)
        self.prompt_frames = t.get("prompt_frames", 32)
        m = cfg.model.get("ns2", None)
        self.model = NaturalSpeech2(ns2_config_from_model_cfg(
            m, num_phones=max(len(table) + 1, 64),
            latent_dim=p.n_mel,  # mel-as-latent (codec latents via ckpt later)
            max_frames=self.max_frames,
        ))
        example = self._make_batch(self.utts[: self.batch_size])
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(t.adamw.lr))
        params = self.model.init(
            jax.random.key(t.get("seed", 0)), example["latent"],
            example["phones"], example["phone_mask"], example["prompt"],
            example["prompt_mask"], example["durations"], example["pitch"],
            example["frame_mask"], jax.random.key(1),
            method=NaturalSpeech2.loss,
        )["params"]
        state = TrainState(
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
                    {"params": prm}, batch["latent"], batch["phones"],
                    batch["phone_mask"], batch["prompt"],
                    batch["prompt_mask"], batch["durations"], batch["pitch"],
                    batch["frame_mask"], sub, method=NaturalSpeech2.loss,
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
            step, state, self._data, ckpt=self.ckpt, logger=self.logger,
        )
        # persist the TextGrid-derived phone table for inference
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.symbols.to_file(ckpt_dir.parent / "symbols.dict")
        if getattr(args, "resume", False):
            self.loop.resume(None, getattr(args, "resume_type", "resume"))

    def _make_batch(self, utts):
        mf, pf = self.max_frames, self.prompt_frames
        b = len(utts)
        phone_rows, dur_rows = [], []
        audios = np.zeros((b, mf * self.hop), np.float32)
        for r, u in enumerate(utts):
            phones, durs = self.align[u.uid]
            ids = np.asarray([self.symbols[ph] for ph in phones], np.int32)
            cum = np.cumsum(durs)
            keep = cum <= mf
            if not keep.any():
                keep[0] = True
                durs = np.minimum(durs, mf)
            phone_rows.append(ids[keep])
            dur_rows.append(np.asarray(durs)[keep])
            x, _ = load_wav(u.path, sr=self.mel_cfg.sample_rate)
            n = int(np.asarray(durs)[keep].sum())
            audios[r, : min(len(x), n * self.hop)] = x[: n * self.hop]
        ph, ph_len = pad_batch(phone_rows)
        du, _ = pad_batch(dur_rows)
        au = jnp.asarray(audios)
        latent = self._mel_fn(au, self.mel_cfg).transpose(0, 2, 1)
        f0, _ = self._f0_fn(au, self.f0_cfg)
        pitch = jnp.log1p(f0)
        pitch = (pitch - jnp.mean(pitch)) / (jnp.std(pitch) + 1e-5)
        # prompt = the utterance's own leading frames (zero-shot conditioning)
        prompt = latent[:, :pf]
        n_frames = np.asarray([int(np.sum(d)) for d in dur_rows])
        return {
            "latent": latent,
            "phones": jnp.asarray(ph),
            "phone_mask": jnp.asarray(
                (np.arange(ph.shape[1])[None] < ph_len[:, None]).astype(np.float32)
            ),
            "prompt": prompt,
            "prompt_mask": jnp.ones((b, pf), jnp.float32),
            "durations": jnp.asarray(du),
            "pitch": pitch,
            "frame_mask": jnp.asarray(
                (np.arange(mf)[None] < n_frames[:, None]).astype(np.float32)
            ),
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


class MetisTrainer(MaskGCTTrainer):
    """Metis trainer (ref `models/tts/metis/metis.py:172` — masked-generative
    pre-training + task fine-tuning over the MaskGCT backbones).

    Same data contract as MaskGCT (`--extract_semantic --extract_codes` +
    phones). `cfg.model.metis.task` picks the objective: 'tts' conditions
    T2S on phones; 'vc'/'se'/'tse'/'l2s' condition on the continuous
    semantic features through the task-embedding prefix."""

    def __init__(self, args, cfg):
        import optax

        from amphion_tpu.data.samplers import LengthBucketSampler
        from amphion_tpu.models.tts.maskgct.maskgct import S2AConfig, T2SConfig
        from amphion_tpu.models.tts.metis.metis import Metis, MetisConfig
        from amphion_tpu.runtime.train_state import TrainState

        self.args = args
        self.cfg = cfg
        self.logger = get_logger("metis", level=getattr(args, "log_level", "info"))
        p = cfg.preprocess
        self.utts = []
        for ds in cfg.dataset:
            self.utts.extend(
                load_metadata(Path(p.processed_dir) / ds / "train.json")
            )
        root = {ds: Path(p.processed_dir) / ds for ds in cfg.dataset}
        self.dirs = {
            "phones": {ds: r / p.phone_dir for ds, r in root.items()},
            "semantic": {ds: r / "semantic" for ds, r in root.items()},
            "semantic_feats": {ds: r / "semantic_feats" for ds, r in root.items()},
            "codes": {ds: r / "codes" for ds, r in root.items()},
        }
        self.utts = [
            u for u in self.utts
            if all((self.dirs[k][u.dataset] / f"{u.uid}.{ext}").is_file()
                   for k, ext in [("phones", "json"), ("semantic", "npy"),
                                  ("semantic_feats", "npy"), ("codes", "npy")])
        ]
        assert self.utts, ("missing features: run preprocess with "
                           "--extract_semantic --extract_codes")
        self.symbols = SymbolTable.from_file(
            Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict
        )

        m = cfg.model.get("metis", None)
        self.task = m.get("task", "tts") if m else "tts"
        mt = cfg.model.get("t2s", None)
        ms = cfg.model.get("s2a", None)
        sem_dim = int(np.load(
            self.dirs["semantic_feats"][self.utts[0].dataset]
            / f"{self.utts[0].uid}.npy").shape[-1])
        n_q = int(np.load(
            self.dirs["codes"][self.utts[0].dataset]
            / f"{self.utts[0].uid}.npy").shape[0])
        self.model = Metis(MetisConfig(
            t2s=T2SConfig(
                hidden=mt.hidden if mt else 1024,
                num_layers=mt.num_layers if mt else 16,
                num_heads=mt.num_heads if mt else 16,
                codebook_size=mt.codebook_size if mt else 8192,
                phone_vocab=max(len(self.symbols) + 1, 64),
            ),
            s2a=S2AConfig(
                hidden=ms.hidden if ms else 1024,
                num_layers=ms.num_layers if ms else 16,
                num_heads=ms.num_heads if ms else 16,
                codebook_size=ms.codebook_size if ms else 1024,
                num_quantizers=n_q,
                semantic_dim=sem_dim,
            ),
            cond_feature_dim=sem_dim,
        ))

        t = cfg.train
        lengths = []
        for u in self.utts:
            lengths.append(int(np.load(
                self.dirs["semantic"][u.dataset] / f"{u.uid}.npy",
                mmap_mode="r").shape[-1]))
        self.sampler = LengthBucketSampler(
            lengths, max_tokens=t.get("max_tokens", 8192),
            min_bucket=t.get("min_bucket", 64), seed=t.get("seed", 0),
        )
        self.max_phones = t.get("max_phones", 256)

        example = self._make_batch(*next(iter(self.sampler)))
        from amphion_tpu.runtime.optimizers import maybe_accumulate

        tx = maybe_accumulate(optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(t.adamw.lr)
        ), t)
        r = jax.random.key(t.get("seed", 0))
        task = self.task
        if task == "tts":
            t2s_kwargs = dict(phone_id=example["phones"],
                              phone_mask=example["phone_mask"])
        else:
            t2s_kwargs = dict(cond_feats=example["semantic_feats"])
        params = self.model.init(
            r, task, example["semantic"], example["x_mask"], jax.random.key(1),
            method=Metis.t2s_loss, **t2s_kwargs,
        )["params"]
        # the s2a branch has its own params: init and merge
        s2a_params = self.model.init(
            r, example["codes"], example["x_mask"], example["semantic_feats"],
            jax.random.key(1), method=Metis.s2a_loss,
        )["params"]
        params = {**s2a_params, **params}
        from amphion_tpu.utils.logging import model_summary

        model_summary(params, self.logger)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), rng=jax.random.key(2),
            apply_fn=self.model.apply, tx=tx,
        )

        import functools

        model = self.model

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state, batch):
            rng, r1, r2 = jax.random.split(state.rng, 3)

            def loss_fn(prm):
                kw = (dict(phone_id=batch["phones"],
                           phone_mask=batch["phone_mask"]) if task == "tts"
                      else dict(cond_feats=batch["semantic_feats"]))
                l1, a1 = model.apply(
                    {"params": prm}, task, batch["semantic"], batch["x_mask"],
                    r1, method=Metis.t2s_loss, **kw,
                )
                l2, a2 = model.apply(
                    {"params": prm}, batch["codes"], batch["x_mask"],
                    batch["semantic_feats"], r2, method=Metis.s2a_loss,
                )
                return l1 + l2, {**a1, **a2}

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
            step_fn, self.state, self._data, ckpt=self.ckpt, logger=self.logger,
        )
        if getattr(args, "resume", False):
            self.loop.resume(None, getattr(args, "resume_type", "resume"))


class DualCodecTTSTrainer:
    """DualCodec TTS trainer (ref the vendored package's Hydra CLI,
    `models/codec/dualcodec/dualcodec/train.py` + `model_tts/` trainers),
    unified here under the standard TrainLoop with a `mode` knob:

    - ``ar``: text → 25 Hz semantic codes (`DualCodecValleAR.loss`)
    - ``nar``: semantic + residual acoustic layers (`DualCodecValleNAR.loss`)
    - ``voicebox``: CFM mel infilling conditioned on semantic codes
      (`FlowMatchingTransformer` with ``cond_scale_factor``)

    Data contract: per-uid ``codes_dualcodec/{uid}.npy`` of shape
    (1 + Q_acoustic, T) — row 0 the semantic stream — plus the usual
    phone/text-token json (``phone_dir``); voicebox additionally loads
    waveforms and computes mel on device."""

    def __init__(self, args, cfg):
        import functools

        import optax

        from amphion_tpu.data.samplers import LengthBucketSampler
        from amphion_tpu.models.tts.dualcodec_tts import (
            DualARConfig,
            DualCodecValleAR,
            DualCodecValleNAR,
            DualNARConfig,
        )
        from amphion_tpu.models.vc.flow_matching_transformer import (
            FlowMatchingTransformer,
            FMTConfig,
        )
        from amphion_tpu.runtime.optimizers import maybe_accumulate
        from amphion_tpu.runtime.train_state import TrainState

        self.args = args
        self.cfg = cfg
        self.logger = get_logger("dualcodec_tts",
                                 level=getattr(args, "log_level", "info"))
        p = cfg.preprocess
        m = cfg.model.dualcodec_tts
        self.mode = m.get("mode", "ar")
        self.utts = []
        for ds in cfg.dataset:
            self.utts.extend(
                load_metadata(Path(p.processed_dir) / ds / "train.json"))
        self.code_dir = {
            ds: Path(p.processed_dir) / ds / "codes_dualcodec"
            for ds in cfg.dataset
        }
        self.phone_dir = {
            ds: Path(p.processed_dir) / ds / p.phone_dir for ds in cfg.dataset
        }
        self.utts = [
            u for u in self.utts
            if (self.code_dir[u.dataset] / f"{u.uid}.npy").is_file()
            and (self.mode == "voicebox"
                 or (self.phone_dir[u.dataset] / f"{u.uid}.json").is_file())
        ]
        assert self.utts, "no utterances with dualcodec codes (+ phones)"
        t = cfg.train
        self.max_phones = t.get("max_phones", 256)
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        self.scale_factor = m.get("cond_scale_factor", 4)

        if self.mode == "ar":
            self.model = DualCodecValleAR(DualARConfig(
                text_vocab=m.get("text_vocab", 51866),
                speech_vocab=m.get("speech_vocab", 16384),
                hidden=m.get("hidden", 1024),
                intermediate=m.get("intermediate", 4096),
                num_layers=m.get("num_layers", 12),
                num_heads=m.get("num_heads", 16)))
        elif self.mode == "nar":
            self.model = DualCodecValleNAR(DualNARConfig(
                phone_vocab=m.get("text_vocab", 51866),
                first_layer_vocab=m.get("speech_vocab", 16384),
                target_vocab=m.get("acoustic_vocab", 4096),
                hidden=m.get("hidden", 1024),
                intermediate=m.get("intermediate", 4096),
                num_layers=m.get("num_layers", 12),
                num_heads=m.get("num_heads", 16),
                num_quantizers=m.get("num_quantizers", 8)))
        else:
            self.model = FlowMatchingTransformer(FMTConfig(
                token_vocab=m.get("speech_vocab", 16384),
                n_mel=p.get("n_mel", 80),
                hidden=m.get("hidden", 1024),
                num_layers=m.get("num_layers", 16),
                num_heads=m.get("num_heads", 16),
                cond_scale_factor=self.scale_factor))

        lengths = []
        for u in self.utts:
            codes = np.load(self.code_dir[u.dataset] / f"{u.uid}.npy",
                            mmap_mode="r")
            n = int(codes.shape[-1])
            lengths.append(n * self.scale_factor
                           if self.mode == "voicebox" else n)
        self.sampler = LengthBucketSampler(
            lengths, max_tokens=t.get("max_tokens", 8192),
            min_bucket=t.get("min_bucket", 64), seed=t.get("seed", 0))

        first = next(iter(self.sampler))
        example = self._make_batch(*first)
        tx = optax.adamw(t.adamw.lr, b1=t.adamw.get("adam_b1", 0.9),
                         b2=t.adamw.get("adam_b2", 0.95),
                         weight_decay=t.adamw.get("weight_decay", 0.01))
        tx = maybe_accumulate(
            optax.chain(optax.clip_by_global_norm(1.0), tx), t)
        loss_method = {
            "ar": "loss", "nar": "loss", "voicebox": "loss",
        }[self.mode]
        params = self.model.init(
            jax.random.key(t.get("seed", 0)),
            *self._loss_args(example, jax.random.key(1)),
            method=loss_method)["params"]
        from amphion_tpu.utils.logging import model_summary

        model_summary(params, self.logger)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), rng=jax.random.key(2),
            apply_fn=self.model.apply, tx=tx)

        model = self.model
        mode = self.mode
        loss_args = self._loss_args

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=())
        def step(state, batch):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(prm):
                out = model.apply({"params": prm},
                                  *loss_args(batch, sub),
                                  method=loss_method)
                return out if isinstance(out, tuple) else (out, {})

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            if mode == "voicebox" and not aux:
                aux = {"vb_loss": loss}
            return state.apply_gradients(grads).replace(rng=rng), aux

        ckpt_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name / "checkpoint"
        self.ckpt = CheckpointManager(
            ckpt_dir, list(t.get("save_checkpoint_stride", [1])),
            list(t.get("keep_last", [-1])))
        self.loop = TrainLoop(
            LoopConfig(max_epoch=t.get("max_epoch", -1),
                       max_steps=t.get("max_steps", -1),
                       log_interval=t.get("log_interval", 100),
                       save_checkpoints_steps=t.get(
                           "save_checkpoints_steps", 0)),
            step, self.state, self._data, ckpt=self.ckpt, logger=self.logger)
        if getattr(args, "resume", False):
            self.loop.resume(None, getattr(args, "resume_type", "resume"))

    def _loss_args(self, batch, rng):
        if self.mode == "ar":
            return (batch["text"], batch["text_mask"], batch["semantic"],
                    batch["frame_mask"])
        if self.mode == "nar":
            return (batch["text"], batch["text_mask"], batch["codes"],
                    batch["frame_mask"], rng)
        return (batch["mel"], batch["semantic"], batch["prompt_mask"],
                batch["mel_mask"], rng)

    def _make_batch(self, indices, bucket):
        texts, codes_l, lens, wavs = [], [], [], []
        code_bucket = (bucket // self.scale_factor
                       if self.mode == "voicebox" else bucket)
        for i in indices:
            u = self.utts[i]
            c = np.load(self.code_dir[u.dataset] / f"{u.uid}.npy")
            codes_l.append(c[:, :code_bucket])
            lens.append(min(c.shape[1], code_bucket))
            if self.mode != "voicebox":
                ph = json.loads(
                    (self.phone_dir[u.dataset] / f"{u.uid}.json").read_text())
                texts.append(np.asarray(ph[: self.max_phones], np.int32))
            else:
                x, _ = load_wav(u.path, sr=self.mel_cfg.sample_rate)
                wavs.append(x)
        b = len(indices)
        q = codes_l[0].shape[0]
        codes = np.zeros((q, b, code_bucket), np.int32)
        for r, c in enumerate(codes_l):
            codes[:, r, : c.shape[1]] = c
        frame_mask = (np.arange(code_bucket)[None, :]
                      < np.asarray(lens)[:, None]).astype(np.float32)
        out = {"semantic": jnp.asarray(codes[0]),
               "codes": jnp.asarray(codes),
               "frame_mask": jnp.asarray(frame_mask)}
        if self.mode != "voicebox":
            ph, ph_len = pad_batch(texts)
            out["text"] = jnp.asarray(ph)
            out["text_mask"] = jnp.asarray(
                (np.arange(ph.shape[1])[None, :]
                 < ph_len[:, None]).astype(np.float32))
        else:
            from amphion_tpu.ops.mel import mel_spectrogram

            t_mel = code_bucket * self.scale_factor
            n_samp = t_mel * self.mel_cfg.hop_size
            buf = np.zeros((b, n_samp), np.float32)
            mel_lens = []
            for r, x in enumerate(wavs):
                n = min(len(x), n_samp)
                buf[r, :n] = x[:n]
                mel_lens.append(n // self.mel_cfg.hop_size)
            mel = mel_spectrogram(jnp.asarray(buf), self.mel_cfg)
            out["mel"] = mel.transpose(0, 2, 1)
            out["mel_mask"] = jnp.asarray(
                (np.arange(t_mel)[None, :]
                 < np.asarray(mel_lens)[:, None]).astype(np.float32))
            # CFM prompt region: leading quarter of valid frames
            out["prompt_mask"] = jnp.asarray(
                (np.arange(t_mel)[None, :]
                 < (np.asarray(mel_lens) // 4)[:, None]).astype(np.float32))
        return out

    def _data(self):
        def gen():
            for indices, bucket in self.sampler:
                yield self._make_batch(indices, bucket)

        return Prefetcher(gen)

    def train_loop(self):
        return self.loop.run()
