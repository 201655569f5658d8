"""Batch inference base (reference: `models/base/new_inference.py:28`,
`models/tts/base/tts_inferece.py:25`): checkpoint discovery, batched test-set
iteration, two-stage acoustic-model → vocoder synthesis."""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Callable, Iterable

import jax
import numpy as np

from amphion_tpu.data.audio_io import save_wav
from amphion_tpu.data.metadata import load_metadata
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.utils.logging import get_logger


class BaseInference:
    """Subclass and implement `_inference_each_batch(batch) -> wav array`."""

    def __init__(self, args, cfg, infer_type: str = "from_dataset"):
        self.args = args
        self.cfg = cfg
        self.infer_type = infer_type
        self.logger = get_logger(type(self).__name__)
        self.output_dir = Path(getattr(args, "output_dir", "output"))
        self.output_dir.mkdir(parents=True, exist_ok=True)

    # -- checkpoint discovery (ref `tts_inferece.py:145` sorts dir names) ----

    def load_checkpoint(self, ckpt_dir: str | Path, path: str | None = None):
        mgr = CheckpointManager(ckpt_dir)
        tree, epoch, step = mgr.restore_raw(path)
        self.logger.info(f"restored epoch {epoch} step {step} from {ckpt_dir}")
        return tree

    # -- batch loop (ref `inference_for_batches:207`) ------------------------

    def test_utterances(self, split: str = "test"):
        p = self.cfg.preprocess
        utts = []
        for ds in self.cfg.dataset:
            utts.extend(
                load_metadata(Path(p.processed_dir) / ds / f"{split}.json")
            )
        return utts

    def inference(self, batches: Iterable, sample_rate: int):
        for i, batch in enumerate(batches):
            wavs = self._inference_each_batch(batch)
            for j, wav in enumerate(np.asarray(wavs)):
                uid = batch.get("uids", [f"batch{i}_{j}"])[j] if isinstance(
                    batch, dict) else f"batch{i}_{j}"
                save_wav(self.output_dir / f"{uid}.wav", wav, sample_rate)
        self.logger.info(f"wrote outputs to {self.output_dir}")

    def _inference_each_batch(self, batch):
        raise NotImplementedError

    # -- vocoder second stage (ref `synthesis_by_vocoder:252`) ---------------

    @staticmethod
    def make_vocoder_fn(generator, params) -> Callable:
        return jax.jit(lambda mel: generator.apply({"params": params}, mel))
