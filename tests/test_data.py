import numpy as np
import pytest

from amphion_tpu.data.audio_io import load_wav, resample, save_wav
from amphion_tpu.data.dataset import (
    OfflineFeatureDataset,
    Prefetcher,
    SegmentAudioDataset,
    pad_batch,
)
from amphion_tpu.data.metadata import Utterance, load_metadata, save_metadata
from amphion_tpu.data.samplers import (
    LengthBucketSampler,
    ScheduledSampler,
    VariableSampler,
    batch_by_size,
)


def test_wav_roundtrip(tmp_path, rng):
    x = np.clip(rng.standard_normal(24000) * 0.3, -0.99, 0.99).astype(np.float32)
    save_wav(tmp_path / "a.wav", x, 24000)
    y, sr = load_wav(tmp_path / "a.wav")
    assert sr == 24000
    np.testing.assert_allclose(x, y, atol=1e-3)


def test_resample_tone():
    sr1, sr2 = 48000, 24000
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr1, sr2)
    assert len(y) == sr2
    # energy of a pure tone survives resampling
    assert abs(np.abs(y[100:-100]).max() - 1.0) < 0.05


def test_metadata_roundtrip(tmp_path):
    utts = [
        Utterance("ljspeech", "LJ001-0001", "/x/a.wav", 2.5, 0, text="hi"),
        Utterance("ljspeech", "LJ001-0002", "/x/b.wav", 3.0, 1, singer="s"),
    ]
    save_metadata(tmp_path / "train.json", utts)
    back = load_metadata(tmp_path / "train.json")
    assert back[0].uid == "LJ001-0001" and back[0].text == "hi"
    assert back[1].singer == "s"


def test_metadata_reference_capitalization(tmp_path):
    import json

    (tmp_path / "t.json").write_text(
        json.dumps([{"Dataset": "m4singer", "Uid": "u1", "Path": "/p.wav",
                     "Duration": 1.0, "Singer": "Alto-1", "index": 0}])
    )
    utts = load_metadata(tmp_path / "t.json")
    assert utts[0].dataset == "m4singer" and utts[0].singer == "Alto-1"


def test_scheduled_sampler_no_cross_dataset():
    s = ScheduledSampler([10, 7, 5], batch_size=3, shuffle=True, drop_last=True)
    offsets = [(0, 10), (10, 17), (17, 22)]
    batches = list(s)
    assert len(batches) == len(s) == 3 + 2 + 1
    for b in batches:
        owners = {next(i for i, (lo, hi) in enumerate(offsets) if lo <= x < hi) for x in b}
        assert len(owners) == 1


def test_batch_by_size_budget():
    lengths = [5, 9, 3, 8, 7, 2, 10]
    batches = batch_by_size(np.arange(7), lambda i: lengths[i], max_tokens=20)
    seen = [i for b in batches for i in b]
    assert sorted(seen) == list(range(7))
    for b in batches:
        assert max(lengths[i] for i in b) * len(b) <= 20


def test_variable_sampler_skip_steps():
    vs = VariableSampler([[0], [1], [2], [3]], shuffle=False)
    vs.set_skip_steps(2)
    assert list(vs) == [[2], [3]]
    assert list(vs) == [[0], [1], [2], [3]]  # skip consumed


def test_length_bucket_sampler_static_shapes():
    rng = np.random.default_rng(0)
    lengths = rng.integers(50, 2000, size=200).tolist()
    s = LengthBucketSampler(lengths, max_tokens=4000, min_bucket=64)
    n_shapes = set()
    covered = []
    for idxs, bucket in s:
        assert all(lengths[i] <= bucket for i in idxs)
        assert bucket * len(idxs) <= 4000 or len(idxs) == 1
        n_shapes.add((len(idxs), bucket))
        covered += idxs
    assert sorted(covered) == list(range(200))
    assert len(n_shapes) <= 20  # bounded compilation


def test_segment_dataset_and_pad(tmp_path, rng):
    paths = []
    for i, dur in enumerate([0.5, 1.2]):
        x = (rng.standard_normal(int(8000 * dur)) * 0.1).astype(np.float32)
        save_wav(tmp_path / f"{i}.wav", x, 8000)
        paths.append(str(tmp_path / f"{i}.wav"))
    utts = [Utterance("t", f"u{i}", p, 1.0, i) for i, p in enumerate(paths)]
    ds = SegmentAudioDataset(utts, 8000, segment_samples=8000)
    for i in range(2):
        item = ds[i]
        assert item["audio"].shape == (8000,)
    batch, lens = pad_batch([np.ones((3, 2)), np.ones((5, 2))])
    assert batch.shape == (2, 5, 2)
    assert lens.tolist() == [3, 5]


def test_offline_feature_dataset(tmp_path):
    d = tmp_path / "proc" / "ds" / "mels"
    d.mkdir(parents=True)
    np.save(d / "u1.npy", np.zeros((80, 10)))
    ds = OfflineFeatureDataset(
        [Utterance("ds", "u1", "x", 1.0)], tmp_path / "proc", {"mel": "mels"}
    )
    assert ds[0]["mel"].shape == (80, 10)


def test_prefetcher_order():
    pf = Prefetcher(lambda: iter(range(10)), depth=3)
    assert list(pf) == list(range(10))
    assert list(pf) == list(range(10))  # re-iterable


def test_audio_features_extractor_facade():
    """Batched on-the-fly facade (ref `processors/audio_features_extractor.py`
    `AudioFeaturesExtractor`): mel/F0/energy shapes + masking semantics."""
    from amphion_tpu.utils.config import JsonHParams
    from amphion_tpu.data.processors.features import AudioFeaturesExtractor

    cfg = JsonHParams(preprocess={
        "sample_rate": 8000, "n_fft": 512, "win_size": 320, "hop_size": 80,
        "n_mel": 20, "fmin": 0, "fmax": 4000,
    })
    ex = AudioFeaturesExtractor(cfg)
    t = np.arange(8000, dtype=np.float32) / 8000
    wavs = np.stack([
        0.6 * np.sin(2 * np.pi * 220 * t),
        0.6 * np.sin(2 * np.pi * 330 * t),
    ])
    mel = ex.get_mel_spectrogram(wavs)
    assert mel.shape == (2, 20, 100)
    energy = ex.get_energy(wavs, mel_spec=mel)
    assert energy.shape == (2, 100)
    assert float(np.asarray(energy).min()) >= 0.0

    f0, uv = ex.get_f0(wavs, wav_lens=[8000, 4000], return_uv=True)
    assert f0.shape == (2, 100) and uv.shape == (2, 100)
    voiced0 = np.asarray(f0[0])[np.asarray(uv[0]) > 0]
    assert abs(np.median(voiced0) - 220.0) < 15.0
    # frames past wav_lens must be masked out
    assert np.all(np.asarray(f0[1])[50:] == 0.0)
