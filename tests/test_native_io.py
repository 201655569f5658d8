"""Native C++ IO core: parity with the scipy path (audio_io.py) and the
batched segment loader contract."""

import numpy as np
import pytest

from amphion_tpu.data import native_io
from amphion_tpu.data.audio_io import load_wav, resample, save_wav

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths = []
    for i, sr in enumerate([16000, 22050, 24000]):
        t = np.arange(int(sr * 1.3)) / sr
        x = (0.5 * np.sin(2 * np.pi * (200 + 100 * i) * t)
             + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
        p = root / f"{i}.wav"
        save_wav(p, x, sr)
        paths.append(p)
    return paths


def test_wav_info(wavs):
    sr, n = native_io.wav_info(wavs[0])
    x, file_sr = load_wav(wavs[0])
    assert sr == file_sr and n == len(x)


def test_load_matches_scipy_no_resample(wavs):
    for p in wavs:
        ours, sr1 = native_io.load_wav(p)
        ref, sr2 = load_wav(p)
        assert sr1 == sr2
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_resample_matches_scipy(wavs):
    # Kaiser-sinc polyphase vs scipy.resample_poly: interior parity
    for p in wavs:
        ours, sr = native_io.load_wav(p, sr=24000)
        ref, _ = load_wav(p, sr=24000)
        assert sr == 24000
        n = min(len(ours), len(ref))
        assert abs(len(ours) - len(ref)) <= 2
        # exclude filter edge transients
        lo, hi = 500, n - 500
        err = np.abs(ours[lo:hi] - ref[lo:hi])
        denom = np.abs(ref[lo:hi]).max() + 1e-9
        assert err.max() / denom < 0.02, err.max() / denom


def test_batch_segments(wavs):
    seg = 8000
    paths = [str(wavs[0])] * 3 + [str(p) for p in wavs]
    out = native_io.batch_segments(
        paths, starts=[0, 100, 4000, 0, 0, 0], segment_len=seg, sr=16000,
    )
    assert out.shape == (6, seg) and out.dtype == np.float32
    single, _ = native_io.load_wav(wavs[0], sr=16000)
    np.testing.assert_allclose(out[0], single[:seg], atol=1e-6)
    np.testing.assert_allclose(out[1], single[100 : 100 + seg], atol=1e-6)
    np.testing.assert_allclose(out[2], single[4000 : 4000 + seg], atol=1e-6)
    assert np.isfinite(out).all()


def test_batch_segments_zero_pads_short_clips(wavs):
    single, _ = native_io.load_wav(wavs[0], sr=16000)
    seg = len(single) + 1000
    out = native_io.batch_segments([str(wavs[0])], [0], seg, 16000)
    np.testing.assert_allclose(out[0, : len(single)], single, atol=1e-6)
    assert (out[0, len(single):] == 0).all()


def test_emilia_dataset_native_batch(tmp_path):
    """EmiliaDataset.batch streams through the C++ loader."""
    import json

    from amphion_tpu.data.emilia_dataset import EmiliaDataset

    rng = np.random.default_rng(0)
    for i in range(4):
        x = (0.3 * np.sin(2 * np.pi * 200 * np.arange(20000) / 16000)
             ).astype(np.float32)
        save_wav(tmp_path / f"{i}.wav", x, 16000)
        (tmp_path / f"{i}.json").write_text(json.dumps({"text": f"u{i}"}))
    ds = EmiliaDataset(tmp_path, sample_rate=16000, segment_seconds=0.5)
    assert len(ds) == 4 and ds.meta[0]["text"] == "u0"
    batch = ds.batch([0, 1, 2, 3])
    assert batch.shape == (4, 8000) and np.isfinite(batch).all()
    # crop must come from the real audio
    assert np.abs(batch).max() > 0.1
