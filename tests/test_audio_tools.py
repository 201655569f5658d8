"""Tests for audio_tools (slicer/VAD-cut/MFA prep) and the new corpus
adapters + preprocess bins (ref utils/audio_slicer.py, utils/cut_by_vad.py,
utils/mfa_prepare.py, preprocessors/*)."""

import json

import numpy as np
import pytest

from amphion_tpu.data.audio_io import load_wav, save_wav
from amphion_tpu.utils.audio_tools import (Slicer, cut_by_vad, frame_rms,
                                           prepare_mfa_corpus,
                                           slice_audio_file)

SR = 16000


def _speech_like(seconds, freq=220.0):
    t = np.arange(int(seconds * SR)) / SR
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _with_silences(pieces_and_gaps):
    """[(dur, is_speech), ...] -> one signal."""
    parts = []
    for dur, speech in pieces_and_gaps:
        parts.append(_speech_like(dur) if speech
                     else np.zeros(int(dur * SR), np.float32))
    return np.concatenate(parts)


class TestFrameRMS:
    def test_constant_signal(self):
        y = np.ones(SR, np.float32) * 0.5
        rms = frame_rms(y, 400, 160)
        assert rms.shape[0] == 1 + SR // 160
        np.testing.assert_allclose(rms[5:-5], 0.5, rtol=1e-3)

    def test_silence(self):
        assert frame_rms(np.zeros(SR, np.float32), 400, 160).max() == 0.0


class TestSlicer:
    def test_short_audio_passthrough(self):
        y = _speech_like(0.5)
        chunks = Slicer(sr=SR, min_length=1000).slice(y)
        assert len(chunks) == 1

    def test_splits_on_long_silence(self):
        y = _with_silences([(2.0, True), (1.0, False), (2.0, True)])
        chunks = Slicer(sr=SR, min_length=1000, min_interval=300,
                        max_sil_kept=200).slice(y)
        assert len(chunks) == 2
        # each chunk keeps its speech (~2 s) plus <= 2*max_sil_kept silence
        for c in chunks:
            assert 1.8 * SR <= len(c) <= 2.6 * SR

    def test_no_split_on_short_silence(self):
        y = _with_silences([(2.0, True), (0.1, False), (2.0, True)])
        chunks = Slicer(sr=SR, min_length=1000, min_interval=300).slice(y)
        assert len(chunks) == 1

    def test_positions_are_consistent(self):
        y = _with_silences([(2.0, True), (1.0, False), (2.0, True)])
        chunks, pos = Slicer(sr=SR, min_length=1000, max_sil_kept=200).slice(
            y, return_positions=True)
        for c, (b, e) in zip(chunks, pos):
            np.testing.assert_array_equal(c, y[b:e])

    def test_file_roundtrip(self, tmp_path):
        y = _with_silences([(2.0, True), (1.0, False), (2.0, True)])
        save_wav(tmp_path / "in.wav", y, SR)
        outs = slice_audio_file(tmp_path / "in.wav", tmp_path / "out",
                                min_length=1000, max_sil_kept=200)
        assert len(outs) == 2 and all(p.exists() for p in outs)


class TestCutByVad:
    def test_energy_vad_cutting(self, tmp_path):
        y = _with_silences([(1.5, True), (0.8, False), (1.5, True),
                            (0.8, False), (1.5, True)])
        (tmp_path / "raw").mkdir()
        save_wav(tmp_path / "raw" / "a.wav", y, SR)
        outs = cut_by_vad(tmp_path / "raw", tmp_path / "cut",
                          target_len_sec=2.0)
        assert len(outs) >= 2
        total = sum(len(load_wav(p)[0]) for p in outs)
        assert total <= len(y)  # silence removed

    def test_precomputed_vad_json(self, tmp_path):
        y = _with_silences([(1.0, True), (1.0, False), (1.0, True)])
        (tmp_path / "raw").mkdir()
        save_wav(tmp_path / "raw" / "a.wav", y, SR)
        (tmp_path / "raw" / "a.json").write_text(json.dumps(
            {"voice_activity": [[0.0, 1.0], [2.0, 3.0]]}))
        outs = cut_by_vad(tmp_path / "raw", tmp_path / "cut",
                          target_len_sec=10.0)
        assert len(outs) == 1
        assert abs(len(load_wav(outs[0])[0]) - 2 * SR) < SR // 10


class TestMFAPrep:
    def test_layout(self, tmp_path):
        save_wav(tmp_path / "u1.wav", _speech_like(0.3), SR)
        meta = [{"uid": "u1", "path": str(tmp_path / "u1.wav"),
                 "speaker": "spk_a", "text": "hello world"}]
        out = prepare_mfa_corpus(meta, tmp_path / "mfa")
        assert (out / "spk_a" / "u1.wav").exists()
        assert (out / "spk_a" / "u1.lab").read_text() == "hello world"


class TestNewAdapters:
    def _fake_corpus(self, tmp_path, speakers=("s1", "s2"), per=3):
        for s in speakers:
            d = tmp_path / s
            d.mkdir(parents=True)
            for i in range(per):
                save_wav(d / f"{i}.wav", _speech_like(0.2), SR)
        return tmp_path

    def test_customsvcdataset(self, tmp_path):
        from amphion_tpu.data.preprocessors import preprocess_dataset

        root = self._fake_corpus(tmp_path / "raw")
        train, test = preprocess_dataset(
            "customsvcdataset", str(root), str(tmp_path / "proc"))
        assert len(train) + len(test) == 6
        assert {u.singer for u in train + test} == {"s1", "s2"}

    def test_vctkfewsinger_selects_top(self, tmp_path):
        from amphion_tpu.data.preprocessors import SUPPORTED_DATASETS

        root = tmp_path / "raw"
        self._fake_corpus(root, speakers=("big",), per=5)
        self._fake_corpus(root, speakers=("small",), per=1)
        train, test = SUPPORTED_DATASETS["vctkfewsinger"](
            str(root), str(tmp_path / "proc"), n_speakers=1)
        assert {u.singer for u in train + test} == {"big"}

    def test_eval_adapters_all_test(self, tmp_path):
        from amphion_tpu.data.preprocessors import SUPPORTED_DATASETS

        root = self._fake_corpus(tmp_path / "raw")
        train, test = SUPPORTED_DATASETS["svcceval"](
            str(root), str(tmp_path / "proc"))
        assert len(train) == 0 and len(test) == 6

    def test_merge_datasets(self, tmp_path):
        from amphion_tpu.data.preprocessors import preprocess_dataset
        from amphion_tpu.data.preprocessors.processor import merge_datasets

        for name in ("c1", "c2"):
            root = self._fake_corpus(tmp_path / name, per=2)
            preprocess_dataset("customsvcdataset", str(root),
                               str(tmp_path / "proc"), dataset_name=name)
        train, test = merge_datasets(str(tmp_path / "proc"), ["c1", "c2"])
        assert len(train) + len(test) == 8
        assert [u.index for u in train] == list(range(len(train)))

    def test_ljspeech_vocoder(self, tmp_path):
        from amphion_tpu.data.preprocessors import SUPPORTED_DATASETS

        wavs = tmp_path / "raw" / "wavs"
        wavs.mkdir(parents=True)
        for i in range(4):
            save_wav(wavs / f"LJ{i}.wav", _speech_like(0.2), SR)
        train, test = SUPPORTED_DATASETS["ljspeech_vocoder"](
            str(tmp_path / "raw"), str(tmp_path / "proc"))
        assert len(train) + len(test) == 4
        assert all(u.text is None or u.text == "" for u in train + test)


class TestBinsImport:
    def test_new_bins_importable(self):
        import bins.codec.inference
        import bins.svc.preprocess
        import bins.tta.preprocess

        assert callable(bins.codec.inference.main)
        assert callable(bins.svc.preprocess.main)
        assert callable(bins.tta.preprocess.main)
