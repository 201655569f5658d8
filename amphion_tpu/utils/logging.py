"""Logging helpers: rotating file+console logger and step-time rolling window.

Behavioral parity with reference `utils/util.py:510-560` (`ValueWindow`,
logger setup), written fresh.
"""

from __future__ import annotations

import logging
import sys
from collections import deque
from pathlib import Path

_LOGGERS: dict[str, logging.Logger] = {}


def get_logger(name: str = "amphion_tpu", log_file: str | None = None,
               level: str = "info") -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    logger.propagate = False
    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(name)s | %(message)s", "%H:%M:%S"
    )
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGERS[name] = logger
    return logger


class ValueWindow:
    """Rolling window average of scalar values (e.g. step durations)."""

    def __init__(self, window_size: int = 100):
        self._window_size = window_size
        self._values: deque[float] = deque(maxlen=window_size)

    def append(self, x: float) -> None:
        self._values.append(float(x))

    @property
    def sum(self) -> float:
        return float(sum(self._values))

    @property
    def count(self) -> int:
        return len(self._values)

    @property
    def average(self) -> float:
        return self.sum / max(1, self.count)

    def reset(self) -> None:
        self._values.clear()


def model_summary(params, logger=None) -> int:
    """Log per-top-level-module parameter counts (ref
    `models/base/new_trainer.py:706-714`); returns the total count."""
    import jax

    log = (logger or get_logger()).info
    total = 0
    tree = params if isinstance(params, dict) else {"params": params}
    for name, sub in tree.items():
        n = sum(x.size for x in jax.tree_util.tree_leaves(sub))
        total += n
        log(f"  {name}: {n / 1e6:.2f}M params")
    log(f"  total: {total / 1e6:.2f}M params")
    return total
