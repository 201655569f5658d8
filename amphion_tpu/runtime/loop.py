"""Generic training loop.

One loop replaces the reference's two BaseTrainer generations (reference:
epoch-based `models/base/new_trainer.py:27-420`, step-based
`models/base/base_trainer.py:90-759`): epoch vs step mode is a config knob.
The loop is deliberately thin — all compute lives in the jitted
``train_step(states, batch) -> (states, metrics)`` function — and handles
logging, NaN guarding (ref `new_trainer.py:515-545`), checkpoint cadence, and
resume.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable

import jax
import numpy as np

from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.utils.logging import ValueWindow, get_logger


@dataclass
class LoopConfig:
    max_epoch: int = -1  # epoch mode when > 0
    max_steps: int = -1  # step mode when > 0
    log_interval: int = 100
    save_checkpoint_stride: list[int] = field(default_factory=lambda: [1])
    keep_last: list[int] = field(default_factory=lambda: [-1])
    save_checkpoints_steps: int = 0  # step-mode checkpoint cadence
    nan_guard: bool = True
    metrics_path: str = ""  # JSONL per-step metrics tracker (ref: trackers)
    tensorboard_dir: str = ""  # tfevents scalar tracker (ref: TB trackers,
    # new_trainer.py:683-692) — native writer, no TB/TF dependency
    profile_steps: tuple = ()  # (start, stop): jax.profiler trace window


class TrainLoop:
    def __init__(
        self,
        cfg: LoopConfig,
        train_step: Callable,  # (states, batch) -> (states, metrics)
        states: Any,
        data_fn: Callable[[], Iterable],  # per-epoch batch iterator factory
        ckpt: CheckpointManager | None = None,
        valid_fn: Callable[[Any], dict] | None = None,
        logger=None,
        mesh: Any = "auto",
    ):
        self.cfg = cfg
        self.train_step = train_step
        self.states = states
        self.data_fn = data_fn
        self.ckpt = ckpt
        self.valid_fn = valid_fn
        self.logger = logger or get_logger("train")
        self.step = 0
        self.epoch = 0
        self._window = ValueWindow(100)
        self._metrics_file = None
        # data parallelism: with >1 device, replicate params and shard the
        # batch dim over the mesh's 'data' axis; XLA's GSPMD inserts the
        # gradient all-reduce (the TPU-native equivalent of the reference's
        # Accelerate DDP, `models/base/new_trainer.py:185-198`)
        self.mesh = self._resolve_mesh(mesh)
        self._warned_unsharded = False
        if self.mesh is not None:
            self.states = self._replicate(self.states)
            self.logger.info(
                f"data-parallel over mesh {dict(self.mesh.shape)}"
            )
        if cfg.metrics_path:
            import pathlib

            pathlib.Path(cfg.metrics_path).parent.mkdir(parents=True, exist_ok=True)
            self._metrics_file = open(cfg.metrics_path, "a")
        self._tb = None
        if cfg.tensorboard_dir:
            from amphion_tpu.utils.tbwriter import SummaryWriter

            self._tb = SummaryWriter(cfg.tensorboard_dir)

    # -- data parallelism -----------------------------------------------------

    @staticmethod
    def _resolve_mesh(mesh):
        if mesh is None:
            return None
        if mesh == "auto":
            if len(jax.devices()) <= 1:
                return None
            from amphion_tpu.parallel.mesh import build_mesh

            return build_mesh()
        return mesh

    def _replicate(self, tree):
        from amphion_tpu.parallel.mesh import replicated_sharding

        sh = replicated_sharding(self.mesh)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh) if hasattr(x, "shape") else x, tree
        )

    def _shard_batch(self, batch):
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = self.mesh.shape["data"]
        repl = NamedSharding(self.mesh, P())

        def put(x):
            if not hasattr(x, "shape"):
                return x
            if x.ndim >= 1 and x.shape[0] % n == 0:
                spec = P("data", *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(self.mesh, spec))
            if not self._warned_unsharded and x.ndim >= 1:
                self._warned_unsharded = True
                self.logger.warning(
                    f"batch dim {x.shape[0]} not divisible by data axis {n}; "
                    "replicating (set batch_size to a multiple of the mesh)"
                )
            return jax.device_put(x, repl)

        return jax.tree_util.tree_map(put, batch)

    # -- resume -------------------------------------------------------------

    def resume(self, checkpoint_path: str | None = None, resume_type: str = "resume"):
        assert self.ckpt is not None
        self.states, self.epoch, self.step = self.ckpt.restore(
            self.states, checkpoint_path, resume_type
        )
        if self.mesh is not None:
            self.states = self._replicate(self.states)
        self.logger.info(
            f"resumed from epoch {self.epoch}, step {self.step} ({resume_type})"
        )

    # -- main ---------------------------------------------------------------

    def run(self) -> Any:
        step_mode = self.cfg.max_steps > 0
        last_loss = float("nan")
        while True:
            if not step_mode and 0 < self.cfg.max_epoch <= self.epoch:
                break
            epoch_metrics: dict[str, float] = {}
            n_batches = 0
            for batch in self.data_fn():
                t0 = time.perf_counter()
                batch = self._shard_batch(batch)
                if self.cfg.profile_steps and self.step == self.cfg.profile_steps[0]:
                    import jax.profiler

                    jax.profiler.start_trace("/tmp/jax_trace")
                    self.logger.info("profiler trace started -> /tmp/jax_trace")
                self.states, metrics = self.train_step(self.states, batch)
                metrics = {k: float(v) for k, v in metrics.items()}
                self._window.append(time.perf_counter() - t0)
                self.step += 1
                if (self.cfg.profile_steps
                        and self.step == self.cfg.profile_steps[1]):
                    import jax.profiler

                    jax.profiler.stop_trace()
                    self.logger.info("profiler trace stopped")
                if self._metrics_file is not None:
                    import json as _json

                    self._metrics_file.write(_json.dumps(
                        {"step": self.step, "epoch": self.epoch,
                         "sec_per_step": self._window.average, **metrics}) + "\n")
                    self._metrics_file.flush()
                if self._tb is not None:
                    self._tb.add_scalars(
                        {**{f"train/{k}": v for k, v in metrics.items()},
                         "perf/sec_per_step": self._window.average},
                        self.step)
                    if self.step % self.cfg.log_interval == 0:
                        self._tb.flush()
                n_batches += 1
                for k, v in metrics.items():
                    epoch_metrics[k] = epoch_metrics.get(k, 0.0) + v
                if self.cfg.nan_guard and not all(
                    np.isfinite(v) for v in metrics.values()
                ):
                    raise FloatingPointError(
                        f"non-finite loss at step {self.step}: {metrics}"
                    )
                last_loss = next(iter(metrics.values()))
                if self.step % self.cfg.log_interval == 0:
                    msg = ", ".join(f"{k}={v:.4f}" for k, v in metrics.items())
                    self.logger.info(
                        f"epoch {self.epoch} step {self.step} | {msg} | "
                        f"{self._window.average * 1e3:.1f} ms/step"
                    )
                if (
                    step_mode
                    and self.ckpt is not None
                    and self.cfg.save_checkpoints_steps > 0
                    and self.step % self.cfg.save_checkpoints_steps == 0
                ):
                    self.ckpt.save(self.states, self.epoch, self.step, last_loss)
                if step_mode and self.step >= self.cfg.max_steps:
                    if self.ckpt is not None:
                        self.ckpt.save(self.states, self.epoch, self.step, last_loss)
                    return self.states
            self.epoch += 1
            if self.valid_fn is not None:
                vm = self.valid_fn(self.states)
                self.logger.info(
                    f"epoch {self.epoch} valid | "
                    + ", ".join(f"{k}={float(v):.4f}" for k, v in vm.items())
                )
                if self._tb is not None:
                    self._tb.add_scalars(
                        {f"valid/{k}": float(v) for k, v in vm.items()},
                        self.step)
                    self._tb.flush()
            if self.ckpt is not None and not step_mode and self.ckpt.should_save(self.epoch):
                mean_loss = (
                    epoch_metrics.get(next(iter(epoch_metrics)), 0.0) / max(1, n_batches)
                    if epoch_metrics
                    else float("nan")
                )
                self.ckpt.save(self.states, self.epoch, self.step, mean_loss)
        return self.states
