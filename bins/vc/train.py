"""VC training CLI (reference: `bins/vc/train.py:20-23` — registry:
FlowMatchingTransformer / AutoregressiveTransformer; Noro under
`bins/vc/Noro/train.py`).

Both Vevo trainers extract their token streams ONLINE inside the batch maker
(the reference does the same with HuBERT, `fmt_trainer.py:61-102`): content
and content-style tokens come from RepCodec tokenizers applied to the
on-device mel front end (or, with checkpoints, to SSL features).
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
from amphion_tpu.models.codec.repcodec import RepCodec, RepCodecConfig
from amphion_tpu.models.vc.ar_transformer import ARTransformer, ARTransformerConfig
from amphion_tpu.models.vc.flow_matching_transformer import (
    FlowMatchingTransformer,
    FMTConfig,
)
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.runtime.loop import LoopConfig, TrainLoop
from amphion_tpu.runtime.train_state import TrainState
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger, model_summary


class _VevoTrainerBase:
    def _setup_data(self, cfg, frames):
        p = cfg.preprocess
        self.mel_cfg = MelConfig.from_preprocess_cfg(p)
        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(Path(p.processed_dir) / ds / "train.json"))
        self.dataset = SegmentAudioDataset(
            utts, p.sample_rate, frames * p.hop_size
        )

    def _setup_tokenizer(self, name, cfg, ckpt_path, vocab, logger):
        m = cfg.model.get(name, None)
        sem_cfg = RepCodecConfig(
            feature_dim=cfg.preprocess.n_mel,
            hidden=m.get("hidden", 128) if m else 128,
            codebook_size=vocab,
            codebook_dim=m.get("codebook_dim", 8) if m else 8,
            num_blocks=m.get("num_blocks", 2) if m else 2,
        )
        codec = RepCodec(sem_cfg)
        if ckpt_path:
            tree, _, step = CheckpointManager(ckpt_path).restore_raw()
            params = tree.get("g", tree).get("params", tree.get("params"))
            logger.info(f"{name} restored from step {step}")
        else:
            logger.warning(f"no checkpoint for {name}: RANDOM weights (smoke)")
            import zlib

            params = codec.init(
                jax.random.key(zlib.crc32(name.encode())),
                jnp.zeros((1, 8, cfg.preprocess.n_mel)),
            )["params"]
        encode = jax.jit(lambda f: codec.apply(
            {"params": params}, f, method=RepCodec.encode))
        return encode

    def _setup_loop(self, args, cfg, step_fn, state):
        t = cfg.train
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
            step_fn, state, self._data, ckpt=self.ckpt, logger=self.logger,
        )
        if getattr(args, "resume", False):
            self.loop.resume(None, getattr(args, "resume_type", "resume"))

    def _data(self):
        n = len(self.dataset)
        order = np.random.default_rng(self.loop.epoch).permutation(n)

        def gen():
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                yield self._make_batch(order[i : i + self.batch_size].tolist())

        return Prefetcher(gen)

    def train_loop(self):
        return self.loop.run()


class FlowMatchingTransformerTrainer(_VevoTrainerBase):
    """Vevo FM stage: content-style tokens → mel with prompt-prefix timbre
    (ref `models/vc/flow_matching_transformer/fmt_trainer.py`)."""

    def __init__(self, args, cfg):
        self.cfg = cfg
        self.logger = get_logger("fmt")
        t = cfg.train
        self.batch_size = t.batch_size
        frames = t.get("segment_frames", 256)
        self._setup_data(cfg, frames)
        m = cfg.model.get("fm", None)
        vocab = m.token_vocab if m else 8192
        self.style_encode = self._setup_tokenizer(
            "style_tokenizer", cfg, getattr(args, "style_ckpt", ""), vocab,
            self.logger,
        )
        self.model = FlowMatchingTransformer(FMTConfig(
            token_vocab=vocab,
            n_mel=cfg.preprocess.n_mel,
            hidden=m.hidden if m else 1024,
            num_layers=m.num_layers if m else 16,
            num_heads=m.num_heads if m else 16,
            remat=m.get("remat", False) if m else False,
        ))
        example = self._make_batch(list(range(self.batch_size)))
        from amphion_tpu.runtime.optimizers import maybe_accumulate

        tx = maybe_accumulate(
            optax.chain(optax.clip_by_global_norm(1.0),
                        optax.adamw(t.adamw.lr)), t)
        params = self.model.init(
            jax.random.key(t.get("seed", 0)), example["mel"], example["tokens"],
            example["prompt_mask"], example["x_mask"], jax.random.key(1),
            method=FlowMatchingTransformer.loss,
        )["params"]
        model_summary({"fm": params}, self.logger)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), rng=jax.random.key(2),
            apply_fn=self.model.apply, tx=tx,
        )
        model = self.model

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state, batch):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(prm):
                return model.apply(
                    {"params": prm}, batch["mel"], batch["tokens"],
                    batch["prompt_mask"], batch["x_mask"], sub,
                    method=FlowMatchingTransformer.loss,
                )

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return state.apply_gradients(grads).replace(rng=rng), aux

        self._setup_loop(args, cfg, step_fn, state)

    def _make_batch(self, idxs):
        audio = np.stack([self.dataset[i]["audio"] for i in idxs])
        mel = mel_spectrogram(jnp.asarray(audio), self.mel_cfg).transpose(0, 2, 1)
        tokens = self.style_encode(mel)
        b, n = tokens.shape
        # random prompt prefix 10-40% of frames carries the timbre
        rng = np.random.default_rng(int(np.asarray(tokens)[0, 0]) + b)
        plen = rng.integers(n // 10, max(n // 10 + 1, int(n * 0.4)), b)
        pmask = (np.arange(n)[None, :] < plen[:, None]).astype(np.float32)
        return {
            "mel": mel, "tokens": tokens,
            "prompt_mask": jnp.asarray(pmask),
            "x_mask": jnp.ones((b, n), jnp.float32),
        }


class AutoregressiveTransformerTrainer(_VevoTrainerBase):
    """Vevo AR stage: duration-reduced content tokens → content-style tokens
    (ref `models/vc/autoregressive_transformer/ar_trainer.py`). With
    ``model.ar.style_vocab > 0`` this is the Vevo1.5/VevoSing variant (ref
    `models/svc/autoregressive_transformer/ar_trainer.py:193`): half the
    batches additionally condition on prosody (chroma-FVQ) tokens through
    the unified-vocab style block — SVC/SVS-task training next to VC."""

    def __init__(self, args, cfg):
        self.cfg = cfg
        self.logger = get_logger("ar")
        t = cfg.train
        self.batch_size = t.batch_size
        frames = t.get("segment_frames", 256)
        self._setup_data(cfg, frames)
        m = cfg.model.get("ar", None)
        in_vocab = m.input_vocab if m else 32
        out_vocab = m.output_vocab if m else 8192
        style_vocab = m.get("style_vocab", 0) if m else 0
        self.content_encode = self._setup_tokenizer(
            "content_tokenizer", cfg, getattr(args, "content_ckpt", ""),
            in_vocab, self.logger,
        )
        self.style_encode = self._setup_tokenizer(
            "style_tokenizer", cfg, getattr(args, "style_ckpt", ""),
            out_vocab, self.logger,
        )
        self.prosody_encode = (
            self._setup_prosody_tokenizer(
                cfg, getattr(args, "prosody_ckpt", ""), style_vocab)
            if style_vocab else None)
        self.model = ARTransformer(ARTransformerConfig(
            input_vocab=in_vocab, output_vocab=out_vocab,
            style_vocab=style_vocab,
            hidden=m.hidden if m else 1024,
            num_layers=m.num_layers if m else 16,
            num_heads=m.num_heads if m else 16,
            remat=m.get("remat", False) if m else False,
        ))
        self.max_content = t.get("max_content_tokens", frames)
        example = self._make_batch(list(range(self.batch_size)))
        from amphion_tpu.runtime.optimizers import maybe_accumulate

        tx = maybe_accumulate(
            optax.chain(optax.clip_by_global_norm(1.0),
                        optax.adamw(t.adamw.lr)), t)
        params = self.model.init(
            jax.random.key(t.get("seed", 0)), example["input_tokens"],
            example["input_mask"], example["output_tokens"],
            example["output_mask"], method=ARTransformer.loss,
        )["params"]
        model_summary({"ar": params}, self.logger)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), rng=jax.random.key(2),
            apply_fn=self.model.apply, tx=tx,
        )
        model = self.model

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state, batch):
            def loss_fn(prm):
                return model.apply(
                    {"params": prm}, batch["input_tokens"], batch["input_mask"],
                    batch["output_tokens"], batch["output_mask"], None, None,
                    batch.get("style_tokens"), batch.get("style_mask"),
                    method=ARTransformer.loss,
                )

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return state.apply_gradients(grads), aux

        self._setup_loop(args, cfg, step_fn, state)

    def _setup_prosody_tokenizer(self, cfg, ckpt_path, vocab):
        """Chroma-FVQ prosody tokenizer (Coco style mode — ref
        `rep_coco_model.py` CocoStyle) for the VevoSing style stream."""
        from amphion_tpu.models.codec.coco import CocoCodec, CocoConfig

        m = cfg.model.get("prosody_tokenizer", None)
        codec = CocoCodec(CocoConfig(
            mode="style",
            codebook_size=vocab,
            hidden=m.get("hidden", 256) if m else 256,
            codebook_dim=m.get("codebook_dim", 8) if m else 8,
            downsample=m.get("downsample", 4) if m else 4,
            num_blocks=m.get("num_blocks", 2) if m else 2,
        ))
        if ckpt_path:
            tree, _, step = CheckpointManager(ckpt_path).restore_raw()
            params = tree.get("g", tree).get("params", tree.get("params"))
            self.logger.info(f"prosody_tokenizer restored from step {step}")
        else:
            self.logger.warning(
                "no checkpoint for prosody_tokenizer: RANDOM weights (smoke)")
            params = codec.init(
                jax.random.key(11), None, None,
                jnp.zeros((1, 8, codec.cfg.chromagram_dim)),
            )["params"]
        return jax.jit(lambda ch: codec.apply(
            {"params": params}, None, None, ch, method=CocoCodec.encode))

    def _make_batch(self, idxs):
        from amphion_tpu.pipelines.vevo_pipeline import duration_reduce

        audio = np.stack([self.dataset[i]["audio"] for i in idxs])
        mel = mel_spectrogram(jnp.asarray(audio), self.mel_cfg).transpose(0, 2, 1)
        content = np.asarray(self.content_encode(mel))
        style = np.asarray(self.style_encode(mel))
        b, n = style.shape
        mc = self.max_content
        inp = np.zeros((b, mc), np.int32)
        in_len = np.zeros(b, np.int32)
        for r in range(b):
            red = duration_reduce(content[r])[:mc]
            inp[r, : len(red)] = red
            in_len[r] = len(red)
        batch = {
            "input_tokens": jnp.asarray(inp),
            "input_mask": jnp.asarray(
                (np.arange(mc)[None] < in_len[:, None]).astype(np.float32)
            ),
            "output_tokens": jnp.asarray(style),
            "output_mask": jnp.ones((b, n), jnp.float32),
        }
        if self.prosody_encode is not None:
            # SVC/SVS-task batches with p=0.5 (ref svc ar_trainer.py:193:
            # `use_style_tokens_as_input and random.random() < 0.5`)
            coin = np.random.default_rng(
                int(np.asarray(style)[0, 0]) + 7 * b).random()
            if coin < 0.5:
                from amphion_tpu.ops.chroma import chroma_stft

                mcf = self.mel_cfg
                chroma = chroma_stft(
                    jnp.asarray(audio), mcf.sample_rate, mcf.n_fft,
                    mcf.hop_size, mcf.win_size).transpose(0, 2, 1)
                chroma = chroma[:, : audio.shape[1] // mcf.hop_size]
                prosody = self.prosody_encode(chroma)
                batch["style_tokens"] = prosody
                batch["style_mask"] = jnp.ones(prosody.shape, jnp.float32)
        return batch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="exp")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume_type", default="resume")
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
    supported_trainer = {
        "FlowMatchingTransformer": FlowMatchingTransformerTrainer,
        "AutoregressiveTransformer": AutoregressiveTransformerTrainer,
    }
    trainer = supported_trainer[cfg.model_type](args, cfg)
    trainer.train_loop()


if __name__ == "__main__":
    main()
