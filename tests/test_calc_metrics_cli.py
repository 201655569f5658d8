"""End-to-end tests for the full 16-metric CLI (`bins/calc_metrics.py`,
ref `bins/calc_metrics.py:45-62`): every metric family dispatches offline —
DSP metrics + corpus FAD through the CLI itself, speaker similarity through
the native WavLM-SV embedder path the CLI uses."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from amphion_tpu.data.audio_io import save_wav  # noqa: E402


def _make_pairs(tmp_path, n=2, fs=16000):
    ref_dir, deg_dir = tmp_path / "ref", tmp_path / "deg"
    rng = np.random.default_rng(0)
    t = np.arange(fs) / fs
    for i in range(n):
        # vibrato pitch so F0 correlation metrics are well-conditioned
        f0 = 180.0 + 40 * i + 20.0 * np.sin(2 * np.pi * 3.0 * t)
        phase = 2 * np.pi * np.cumsum(f0) / fs
        clean = (0.5 * np.sin(phase)).astype(np.float32)
        noisy = clean + 0.02 * rng.standard_normal(fs).astype(np.float32)
        save_wav(ref_dir / f"utt{i}.wav", clean, fs)
        save_wav(deg_dir / f"utt{i}.wav", noisy, fs)
    return ref_dir, deg_dir


def test_cli_dsp_and_fad(tmp_path, monkeypatch, capsys):
    from bins.calc_metrics import main

    ref_dir, deg_dir = _make_pairs(tmp_path)
    metrics = ["fpc", "f0rmse", "f0_periodicity_rmse", "v_uv_f1",
               "energy_rmse", "energy_pc", "mcd", "mstft", "pesq",
               "si_sdr", "si_snr", "stoi", "fad"]
    monkeypatch.setattr(sys, "argv", [
        "calc_metrics", "--ref_dir", str(ref_dir), "--deg_dir", str(deg_dir),
        "--metrics", *metrics, "--fs", "16000",
        "--dump_dir", str(tmp_path / "out")])
    main()
    report = json.loads((tmp_path / "out" / "metrics.json").read_text())
    assert sorted(report) == sorted(metrics)
    for m in metrics:
        assert np.isfinite(report[m]["mean"]), m
    assert report["fad"]["n"] == 1  # corpus-level
    assert report["si_sdr"]["mean"] > 10  # low-noise pair
    assert report["fpc"]["mean"] > 0.9


def test_native_speaker_similarity_path(tmp_path):
    """The CLI's speaker path: convert a tiny HF WavLMForXVector through
    bins/convert_checkpoint.py, embed through native_wavlm_embedder, and
    require parity with the torch embeddings on the same audio."""
    torch = pytest.importorskip("torch")
    from tests.test_speaker_embedder import _tiny_pair

    from amphion_tpu.evaluation.metrics.similarity import (
        native_wavlm_embedder,
        speaker_similarity,
    )
    from bins.convert_checkpoint import _save_tree

    ref, ours, params = _tiny_pair(seed=3)
    ckpt = tmp_path / "spk"
    _save_tree({"params": params}, ckpt)

    embedder = native_wavlm_embedder(str(ckpt), cfg=ours.cfg)
    rng = np.random.default_rng(3)
    a = rng.standard_normal(2000).astype(np.float32) * 0.1
    b = rng.standard_normal(2000).astype(np.float32) * 0.1

    e = embedder(a, 16000)
    with torch.no_grad():
        # embedder normalizes per-utterance (HF feature-extractor
        # semantics); feed torch the same normalized audio
        an = (a - a.mean()) / max(float(a.std()), 1e-7)
        ref_e = ref(torch.from_numpy(an)[None]).embeddings[0].numpy()
    np.testing.assert_allclose(e, ref_e, atol=2e-4)

    sim = speaker_similarity(a, b, 16000, embedder=embedder)
    assert -1.0 <= sim <= 1.0
    assert speaker_similarity(a, a, 16000, embedder=embedder) > 0.999


def test_default_embedder_guidance(monkeypatch):
    from amphion_tpu.evaluation.metrics.similarity import default_embedder

    monkeypatch.delenv("AMPHION_SPEAKER_CKPT", raising=False)
    with pytest.raises(RuntimeError, match="convert_checkpoint"):
        default_embedder()
