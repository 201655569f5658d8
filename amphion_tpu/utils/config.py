"""Config system: JSON5 files with `base_config` inheritance.

Behavioral parity with the reference config loader (reference:
`utils/util.py:385-505` — `override_config`, `load_config`, `JsonHParams`),
re-implemented from scratch:

- Config files are JSON5 (comments + trailing commas allowed).
- A config may name a parent via the `base_config` key; parents are resolved
  recursively and children override parents with deep-merge semantics.
- Relative `base_config` paths are anchored at the directory of the config
  file itself, or at `$WORK_DIR` if set.
- The resolved dict is wrapped in an attribute-style `JsonHParams`.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

import json5


def override_config(base: dict, new: dict) -> dict:
    """Deep-merge ``new`` into a copy of ``base`` (dicts merge, leaves replace)."""
    out = dict(base)
    for k, v in new.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = override_config(out[k], v)
        else:
            out[k] = v
    return out


def _resolve_base_path(base_ref: str, child_path: Path) -> Path:
    """Resolve a ``base_config`` reference relative to the child config file.

    Accepts either a path relative to the child's directory, relative to
    ``$WORK_DIR`` (reference behavior, `utils/util.py:433-436`), or relative
    to the repo root (detected as the directory containing ``amphion_tpu``).
    """
    candidates = [child_path.parent / base_ref]
    work_dir = os.environ.get("WORK_DIR")
    if work_dir:
        candidates.append(Path(work_dir) / base_ref)
    # repo root = parent of the amphion_tpu package
    repo_root = Path(__file__).resolve().parents[2]
    candidates.append(repo_root / base_ref)
    candidates.append(Path(base_ref))
    for c in candidates:
        if c.is_file():
            return c
    raise FileNotFoundError(
        f"base_config {base_ref!r} (referenced from {child_path}) not found; "
        f"tried {[str(c) for c in candidates]}"
    )


def _load_config_dict(path: Path) -> dict:
    with open(path, "r") as f:
        cfg = json5.load(f)
    if not isinstance(cfg, dict):
        raise TypeError(f"config {path} must be a JSON object")
    base_ref = cfg.pop("base_config", None)
    if base_ref:
        parent = _load_config_dict(_resolve_base_path(base_ref, path))
        cfg = override_config(parent, cfg)
    return cfg


class JsonHParams:
    """Attribute-style view over a nested config dict (ref `utils/util.py:478`)."""

    def __init__(self, **kwargs: Any):
        for k, v in kwargs.items():
            if isinstance(v, dict):
                v = JsonHParams(**v)
            elif isinstance(v, list):
                v = [JsonHParams(**x) if isinstance(x, dict) else x for x in v]
            self.__dict__[k] = v

    # dict-like access
    def keys(self):
        return self.__dict__.keys()

    def items(self):
        return self.__dict__.items()

    def values(self):
        return self.__dict__.values()

    def get(self, key: str, default: Any = None) -> Any:
        return self.__dict__.get(key, default)

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.__dict__.items():
            if isinstance(v, JsonHParams):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [x.to_dict() if isinstance(x, JsonHParams) else x for x in v]
            else:
                out[k] = v
        return out

    def __contains__(self, key: str) -> bool:
        return key in self.__dict__

    def __getitem__(self, key: str) -> Any:
        return self.__dict__[key]

    def __setitem__(self, key: str, value: Any) -> None:
        if isinstance(value, dict):
            value = JsonHParams(**value)
        self.__dict__[key] = value

    def __setattr__(self, key: str, value: Any) -> None:
        self.__setitem__(key, value)

    def __len__(self) -> int:
        return len(self.__dict__)

    def __repr__(self) -> str:
        return f"JsonHParams({self.__dict__!r})"


def load_config(config_fn: str | os.PathLike, lowercase: bool = False) -> JsonHParams:
    """Load a JSON5 config with ``base_config`` inheritance into `JsonHParams`."""
    path = Path(config_fn)
    cfg = _load_config_dict(path)
    if lowercase:
        cfg = {k.lower(): v for k, v in cfg.items()}
    return JsonHParams(**cfg)


def save_config(save_path: str | os.PathLike, cfg: JsonHParams | dict) -> None:
    """Dump a resolved config as plain JSON (ref `utils/util.py:465-475`)."""
    if isinstance(cfg, JsonHParams):
        cfg = cfg.to_dict()
    with open(save_path, "w") as f:
        json.dump(cfg, f, indent=2, sort_keys=False)
