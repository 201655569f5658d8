import json

from amphion_tpu.utils.config import JsonHParams, load_config, override_config


def test_override_config_deep_merge():
    base = {"a": 1, "b": {"x": 1, "y": 2}, "c": [1, 2]}
    new = {"b": {"y": 3, "z": 4}, "c": [5]}
    out = override_config(base, new)
    assert out == {"a": 1, "b": {"x": 1, "y": 3, "z": 4}, "c": [5]}
    # base untouched
    assert base["b"]["y"] == 2


def test_base_config_inheritance(tmp_path):
    (tmp_path / "base.json").write_text(
        '{\n  // comment\n  "train": {"lr": 1e-4, "epochs": 10,},\n  "model_type": "Base",\n}'
    )
    (tmp_path / "child.json").write_text(
        json.dumps({"base_config": "base.json", "train": {"lr": 2e-4}})
    )
    cfg = load_config(tmp_path / "child.json")
    assert cfg.train.lr == 2e-4
    assert cfg.train.epochs == 10
    assert cfg.model_type == "Base"


def test_jsonhparams_access():
    h = JsonHParams(**{"a": {"b": [1, {"c": 2}]}, "d": 3})
    assert h.a.b[1].c == 2
    assert h["d"] == 3
    assert h.get("missing", 7) == 7
    assert "a" in h
    h.e = {"f": 1}
    assert h.e.f == 1
    back = h.to_dict()
    assert back["a"]["b"][1]["c"] == 2


def test_legacy_hparams():
    from amphion_tpu.utils.hparam import HParams

    h = HParams(lr=0.1, steps=100, name="m", flag=False, dims=[1, 2])
    h.parse("lr=0.5,steps=20,flag=true,name=x,dims=[3,4]")
    assert h.lr == 0.5 and h.steps == 20 and h.flag is True
    assert h.name == "x" and h.dims == [3, 4]
    back = HParams.from_json(h.to_json())
    assert back.lr == 0.5
    import pytest as _pytest

    with _pytest.raises(KeyError):
        h.parse("unknown=1")


def test_all_shipped_configs_resolve():
    """Every config/*.json (incl. config/svc/) resolves its base_config
    inheritance chain and carries the family's model_type / task fields
    (the reference ships one file per model family — config/*.json)."""
    import os
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    os.environ.setdefault("WORK_DIR", str(root))
    files = sorted((root / "config").rglob("*.json"))
    assert len(files) >= 18
    for f in files:
        cfg = load_config(f)
        assert cfg.preprocess.sample_rate > 0, f
        if f.name not in ("base.json", "tts.json") and f.parent.name != "svc":
            assert cfg.get("model_type", ""), f
