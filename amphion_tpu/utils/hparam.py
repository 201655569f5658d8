"""Legacy TF-style HParams (reference: `utils/hparam.py:295`, used by the
reference's debatts stack). Provided for config-surface parity: supports
the classic ``parse("a=1,b=2.5,c=True,d=x,y")`` override strings on top of
keyword defaults. New code should use `amphion_tpu.utils.config`.
"""

from __future__ import annotations

import json
import re
from typing import Any


def _parse_value(raw: str, old: Any):
    if isinstance(old, bool):
        if raw.lower() in ("true", "1"):
            return True
        if raw.lower() in ("false", "0"):
            return False
        raise ValueError(f"invalid bool {raw!r}")
    if isinstance(old, int) and not isinstance(old, bool):
        return int(raw)
    if isinstance(old, float):
        return float(raw)
    if isinstance(old, list):
        return [_parse_value(v, old[0] if old else "") for v in raw.split(",")]
    return raw


class HParams:
    def __init__(self, **kwargs: Any):
        self._types: dict[str, type] = {}
        for k, v in kwargs.items():
            self.add_hparam(k, v)

    def add_hparam(self, name: str, value: Any) -> None:
        if hasattr(self, name):
            raise ValueError(f"hyperparameter {name!r} already exists")
        self._types[name] = type(value)
        setattr(self, name, value)

    def set_hparam(self, name: str, value: Any) -> None:
        if name not in self._types:
            raise KeyError(name)
        setattr(self, name, value)

    def get(self, name: str, default: Any = None) -> Any:
        return getattr(self, name, default)

    def parse(self, values: str) -> "HParams":
        """Parse 'name=value' pairs; list values use comma within brackets or
        repeated names (TF semantics simplified)."""
        if not values:
            return self
        # split on commas not inside brackets
        parts = re.split(r",(?![^\[]*\])", values)
        for part in parts:
            if not part.strip():
                continue
            name, _, raw = part.partition("=")
            name = name.strip()
            raw = raw.strip().strip("[]")
            if name not in self._types:
                raise KeyError(f"unknown hyperparameter {name!r}")
            setattr(self, name, _parse_value(raw, getattr(self, name)))
        return self

    def values(self) -> dict:
        return {k: getattr(self, k) for k in self._types}

    def to_json(self) -> str:
        return json.dumps(self.values(), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "HParams":
        return cls(**json.loads(s))

    def __repr__(self) -> str:
        return f"HParams({self.values()!r})"
