"""Device-native SSL front ends vs their HF numpy oracles
(`ops/ssl_frontend.py` vs SeamlessM4TFeatureExtractor /
WhisperFeatureExtractor)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


class TestSeamlessFbank:
    def test_filters_match_hf(self):
        from transformers.audio_utils import mel_filter_bank

        from amphion_tpu.ops.ssl_frontend import kaldi_mel_filters

        ref = mel_filter_bank(
            num_frequency_bins=257, num_mel_filters=80, min_frequency=20,
            max_frequency=8000, sampling_rate=16000, norm=None,
            mel_scale="kaldi", triangularize_in_mel_space=True)
        np.testing.assert_allclose(kaldi_mel_filters(), ref, atol=1e-6)

    @pytest.mark.parametrize("n", [8000, 8080])  # even and odd frame counts
    def test_fbank_matches_hf(self, n):
        from transformers import SeamlessM4TFeatureExtractor

        from amphion_tpu.ops.ssl_frontend import seamless_fbank

        rng = np.random.RandomState(4)
        wav = (rng.randn(n) * 0.2).astype(np.float32)
        fe = SeamlessM4TFeatureExtractor(feature_size=80)
        ref = fe(wav, sampling_rate=16000,
                 return_tensors="np").input_features[0]
        ours = np.asarray(seamless_fbank(wav[None]))[0]
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3)


class TestWhisperLogMel:
    def test_filters_match_hf(self):
        from transformers.audio_utils import mel_filter_bank

        from amphion_tpu.ops.ssl_frontend import slaney_mel_filters

        ref = mel_filter_bank(
            num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
            max_frequency=8000.0, sampling_rate=16000, norm="slaney",
            mel_scale="slaney")
        np.testing.assert_allclose(slaney_mel_filters(), ref, atol=1e-7)

    def test_log_mel_matches_hf(self):
        from transformers import WhisperFeatureExtractor

        from amphion_tpu.ops.ssl_frontend import whisper_log_mel

        rng = np.random.RandomState(5)
        wav = (rng.randn(24000) * 0.2).astype(np.float32)
        fe = WhisperFeatureExtractor(feature_size=80)
        ref = fe(wav, sampling_rate=16000,
                 return_tensors="np").input_features[0]
        padded = np.zeros(480000, np.float32)
        padded[:24000] = wav
        ours = np.asarray(whisper_log_mel(padded[None]))[0]
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestBucketedFbank:
    def test_masked_stats_match_unpadded(self):
        """Bucket-padded extraction with num_valid_samples must equal the
        unpadded result on valid frames (the per-bin normalization is
        global over time, so naive padding would perturb every frame)."""
        import numpy as np

        from amphion_tpu.ops.ssl_frontend import (
            num_fbank_frames,
            seamless_fbank,
        )

        rng = np.random.RandomState(6)
        wav = (rng.randn(8080) * 0.2).astype(np.float32)
        ref = np.asarray(seamless_fbank(wav[None]))[0]
        padded = np.zeros((1, 16000), np.float32)
        padded[0, :8080] = wav
        ours = np.asarray(seamless_fbank(
            padded, num_valid_samples=np.array([8080])))[0]
        n_stacked = (num_fbank_frames(8080) + 1) // 2
        assert ref.shape[0] == n_stacked
        # masked vs unmasked statistics differ only by f32 reduction order
        np.testing.assert_allclose(ours[:n_stacked], ref, atol=1e-4)
        # padded region is zeroed
        assert np.abs(ours[n_stacked:]).max() == 0.0


def test_compute_feature_stats_welford(tmp_path):
    """Streaming per-dim stats == direct mean/std over the concatenation
    (ref whisper_stats_path contents: {"mean": (D,), "std": (D,)})."""
    import numpy as np

    from amphion_tpu.data.processors.content import compute_feature_stats

    rng = np.random.default_rng(0)
    files = []
    chunks = []
    for i in range(3):
        x = (rng.standard_normal((50 + 30 * i, 8)) * (i + 1) + i).astype(
            np.float32)
        f = tmp_path / f"feat{i}.npy"
        np.save(f, x)
        files.append(f)
        chunks.append(x)
    mean, std = compute_feature_stats(files, out_path=tmp_path / "stats.npz")
    allx = np.concatenate(chunks).astype(np.float64)
    np.testing.assert_allclose(mean, allx.mean(0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(std, allx.std(0), rtol=1e-4, atol=1e-5)
    z = np.load(tmp_path / "stats.npz")
    np.testing.assert_array_equal(z["mean"], mean)
