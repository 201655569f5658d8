"""Checkpoint management on orbax.

Reproduces the reference's checkpoint semantics (reference:
`models/base/new_trainer.py:267-323` — multi-stride retention with
``save_checkpoint_stride`` x ``keep_last`` lists, a ``ckpts.json`` ledger
colocated with checkpoints, conflict-aware GC; `:428-464` — ``resume`` (full
state) vs ``finetune`` (weights only)) on top of orbax's async-friendly
PyTree checkpointing. Directory names carry epoch/step/loss like the
reference (`epoch-####_step-#######_loss-#.######`) so tooling and humans can
sort them the same way.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_name(epoch: int, step: int, loss: float) -> str:
    return f"epoch-{epoch:04d}_step-{step:07d}_loss-{loss:.6f}"


def parse_ckpt_name(name: str) -> tuple[int, int]:
    """Extract (epoch, step) from a checkpoint dir name (ref `:445-451`)."""
    parts = dict(p.split("-", 1) for p in Path(name).name.split("_"))
    return int(parts["epoch"]), int(parts["step"])


class CheckpointManager:
    """Stride-based retention with a ckpts.json ledger."""

    def __init__(
        self,
        directory: str | Path,
        save_checkpoint_stride: list[int] | None = None,
        keep_last: list[int] | None = None,
        run_eval: list[bool] | None = None,
    ):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.strides = list(save_checkpoint_stride or [1])
        self.keep_last = list(keep_last or [-1] * len(self.strides))
        # per-stride retention lists of ckpt names (ref `new_trainer.py:100-108`)
        self._retained: list[list[str]] = [[] for _ in self.strides]
        self._ckptr = ocp.StandardCheckpointer()
        self._ledger_path = self.directory / "ckpts.json"
        if self._ledger_path.is_file():
            ledger = json.loads(self._ledger_path.read_text())
            self._retained = ledger.get("retained", self._retained)

    # -- save ---------------------------------------------------------------

    def should_save(self, epoch: int) -> bool:
        return any(epoch % s == 0 for s in self.strides)

    def save(self, state: Any, epoch: int, step: int, loss: float) -> str | None:
        hit = [i for i, s in enumerate(self.strides) if epoch % s == 0]
        if not hit:
            return None
        name = _ckpt_name(epoch, step, loss)
        path = self.directory / name
        self._ckptr.save(path.resolve(), self._save_tree(state), force=True)
        self._ckptr.wait_until_finished()
        to_delete: set[str] = set()
        keep: set[str] = set()
        for i in hit:
            self._retained[i].append(name)
            k = self.keep_last[i]
            if k >= 0 and len(self._retained[i]) > k:
                to_delete.update(self._retained[i][:-k] if k else self._retained[i])
                self._retained[i] = self._retained[i][-k:] if k else []
        for lst in self._retained:
            keep.update(lst)
        # conflict-aware GC: only delete names not retained by another stride
        for name_ in to_delete - keep:
            shutil.rmtree(self.directory / name_, ignore_errors=True)
        self._ledger_path.write_text(json.dumps({"retained": self._retained}))
        return str(path)

    # -- load ---------------------------------------------------------------

    def latest(self) -> str | None:
        # a specific checkpoint dir was given instead of the run dir
        # (ref CLI semantics: --checkpoint_path accepts either)
        if self.directory.name.startswith("epoch-"):
            return str(self.directory)
        cands = sorted(
            p.name for p in self.directory.iterdir()
            if p.is_dir() and p.name.startswith("epoch-")
        )
        return str(self.directory / cands[-1]) if cands else None

    def restore(
        self,
        state: Any,
        checkpoint_path: str | None = None,
        resume_type: str = "resume",
    ) -> tuple[Any, int, int]:
        """Restore full state ('resume') or params only ('finetune').

        Returns (state, epoch, step).
        """
        path = Path(checkpoint_path or self.latest() or "")
        if not path.name:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        epoch, step = parse_ckpt_name(path.name)
        tree = self._save_tree(state)
        restored = self._ckptr.restore(path.resolve(), tree)
        if resume_type == "finetune":
            new_state = jax.tree_util.tree_map(lambda s: s, state)
            new_state = self._merge_params_only(state, restored)
            return new_state, epoch, step
        return self._from_save_tree(state, restored), epoch, step

    def restore_raw(self, checkpoint_path: str | None = None):
        """Restore the raw checkpoint pytree (no target structure needed) —
        for inference-time loading of a subset (e.g. generator params only).
        Returns (tree, epoch, step)."""
        path = Path(checkpoint_path or self.latest() or "")
        if not path.name:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        epoch, step = parse_ckpt_name(path.name)
        with ocp.PyTreeCheckpointer() as ckptr:
            tree = ckptr.restore(path.resolve())
        return tree, epoch, step

    # -- pytree packing -----------------------------------------------------

    @staticmethod
    def _save_tree(state: Any):
        """Strip non-array leaves (apply_fn/tx) from (possibly nested) states."""

        def strip(s):
            if hasattr(s, "params") and hasattr(s, "opt_state"):
                return {
                    "step": s.step,
                    "params": s.params,
                    "opt_state": s.opt_state,
                    "rng": jax.random.key_data(s.rng)
                    if jax.dtypes.issubdtype(s.rng.dtype, jax.dtypes.prng_key)
                    else s.rng,
                }
            return s
        if isinstance(state, dict):
            return {k: strip(v) for k, v in state.items()}
        return strip(state)

    @staticmethod
    def _from_save_tree(state: Any, restored: Any):
        def merge(s, r):
            if hasattr(s, "params") and hasattr(s, "opt_state"):
                rng = r["rng"]
                if not jax.dtypes.issubdtype(
                    np.asarray(rng).dtype, jax.dtypes.prng_key
                ):
                    rng = jax.random.wrap_key_data(jax.numpy.asarray(rng))
                return s.replace(
                    step=jax.numpy.asarray(r["step"]),
                    params=r["params"],
                    opt_state=r["opt_state"],
                    rng=rng,
                )
            return r
        if isinstance(state, dict):
            return {k: merge(v, restored[k]) for k, v in state.items()}
        return merge(state, restored)

    @staticmethod
    def _merge_params_only(state: Any, restored: Any):
        def merge(s, r):
            if hasattr(s, "params"):
                return s.replace(params=r["params"])
            return s
        if isinstance(state, dict):
            return {k: merge(v, restored[k]) for k, v in state.items()}
        return merge(state, restored)
