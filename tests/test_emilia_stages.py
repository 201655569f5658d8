"""Tests for the native Emilia pipeline stages (separation / diarization /
DNSMOS proxy) — ref preprocessors/Emilia/main.py model stages."""

import numpy as np

from amphion_tpu.data.emilia.pipeline import EmiliaPipeline
from amphion_tpu.data.emilia.stages import (dnsmos_proxy, spectral_diarizer,
                                            spectral_gate_separator)

SR = 24000


def _tone(seconds, freq, amp=0.3):
    t = np.arange(int(seconds * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _speechy(seconds, f_base):
    """FM+AM modulated harmonic — non-stationary like real speech."""
    t = np.arange(int(seconds * SR)) / SR
    f0 = f_base * (1 + 0.2 * np.sin(2 * np.pi * 2.3 * t))
    x = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / SR)
    x *= (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)) ** 2
    return x.astype(np.float32)


class TestSpectralGate:
    def test_suppresses_noise_in_silence(self):
        rng = np.random.default_rng(0)
        clean = np.concatenate([_speechy(2.0, 220),
                                np.zeros(SR, np.float32)])
        noise = 0.05 * rng.normal(size=len(clean)).astype(np.float32)
        denoised = spectral_gate_separator(clean + noise, SR)
        assert denoised.shape == clean.shape
        # noise power in the trailing silence drops hard
        tail = slice(len(clean) - SR + 2048, len(clean) - 2048)
        before = np.mean(noise[tail] ** 2)
        after = np.mean(denoised[tail] ** 2)
        assert after < before * 0.25

    def test_preserves_clean_speechlike_signal(self):
        clean = _speechy(2.0, 220)
        out = spectral_gate_separator(clean, SR)
        assert np.mean(out ** 2) > 0.8 * np.mean(clean ** 2)


class TestDiarizer:
    def test_single_speaker_one_turn(self):
        x = _tone(4.0, 220)
        turns = spectral_diarizer(x, SR)
        assert len({spk for _, _, spk in turns}) == 1

    def test_two_speakers_detected(self):
        rng = np.random.default_rng(0)
        x = np.concatenate([_speechy(4.0, 130), _speechy(4.0, 700)])
        x = x + 0.02 * rng.normal(size=len(x)).astype(np.float32)
        turns = spectral_diarizer(x, SR)
        speakers = {spk for _, _, spk in turns}
        assert len(speakers) == 2
        # the switch should be near 4 s
        switch = turns[0][1]
        assert 2.5 < switch < 5.5

    def test_turns_cover_signal(self):
        x = _tone(3.0, 300)
        turns = spectral_diarizer(x, SR)
        assert turns[0][0] == 0.0
        assert abs(turns[-1][1] - 3.0) < 0.1


class TestDnsmosProxy:
    def test_clean_speechlike_scores_high(self):
        # amplitude-modulated harmonic signal ~ speech-like
        t = np.arange(3 * SR) / SR
        f0 = 150 + 30 * np.sin(2 * np.pi * 2 * t)
        x = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / SR)
        x *= 0.5 + 0.5 * np.sin(2 * np.pi * 3 * t) ** 2
        assert dnsmos_proxy(x.astype(np.float32), SR) >= 3.0

    def test_white_noise_scores_low(self):
        x = np.random.default_rng(0).normal(size=3 * SR).astype(np.float32) * 0.3
        assert dnsmos_proxy(x, SR) < 3.0

    def test_clipped_penalized(self):
        x = np.clip(_tone(2.0, 220, amp=3.0), -1, 1)
        assert dnsmos_proxy(x, SR) < dnsmos_proxy(_tone(2.0, 220), SR)


class TestPipelineIntegration:
    def test_with_native_stages(self, tmp_path):
        rng = np.random.default_rng(0)
        t = np.arange(5 * SR) / SR
        f0 = 150 + 30 * np.sin(2 * np.pi * 2 * t)
        x = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / SR).astype(np.float32)
        x += 0.01 * rng.normal(size=len(x)).astype(np.float32)
        from amphion_tpu.data.audio_io import save_wav

        (tmp_path / "raw").mkdir()
        save_wav(tmp_path / "raw" / "clip.wav", x, SR)
        pipe = EmiliaPipeline.with_native_stages(min_snr_db=0.0, min_dnsmos=1.0)
        records = pipe.process_dir(tmp_path / "raw", tmp_path / "out")
        assert records, "pipeline dropped everything"
        for r in records:
            assert "dnsmos" in r and 1.0 <= r["dnsmos"] <= 5.0
            assert r["speaker"].startswith("spk")
