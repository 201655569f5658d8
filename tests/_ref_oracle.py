"""Shared helper: make the read-only reference tree importable as a torch
oracle by stubbing its optional dependencies (same stub set as
test_weight_conversion.py's fixture)."""

import importlib.machinery
import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")

_STUB_NAMES = (
    "lhotse", "lhotse.dataset", "lhotse.dataset.collation",
    "lhotse.dataset.input_strategies", "lhotse.utils",
    "torchaudio", "torchaudio.functional",
    "torchaudio.functional.functional",
    "torchaudio.models", "parselmouth", "torchcrepe",
    "torchaudio.transforms", "librosa", "librosa.filters",
    "librosa.util", "ruamel", "ruamel.yaml", "pyworld",
    "soundfile", "omegaconf", "omegaconf.listconfig",
)


def install_ref_stubs() -> dict:
    """Put the reference on sys.path and stub its absent optional deps.
    Returns the dict of installed stub modules (for teardown)."""
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    stubs = {}

    def _stub(name):
        if name in sys.modules:
            return
        mod = types.ModuleType(name)
        mod.__path__ = []

        def _getattr(attr):
            if attr.startswith("__"):
                raise AttributeError(attr)
            return object

        mod.__getattr__ = _getattr
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None,
                                                      is_package=True)
        sys.modules[name] = mod
        stubs[name] = mod

    for name in _STUB_NAMES:
        _stub(name)
    if "numba" not in sys.modules:
        nb = types.ModuleType("numba")
        nb.jit = lambda *a, **k: (lambda f: f)
        nb.__spec__ = importlib.machinery.ModuleSpec("numba", loader=None)
        sys.modules["numba"] = nb
        stubs["numba"] = nb
    return stubs


def remove_ref_stubs(stubs: dict) -> None:
    if str(REFERENCE) in sys.path:
        sys.path.remove(str(REFERENCE))
    for name in stubs:
        sys.modules.pop(name, None)
