import json

import numpy as np
import pytest

from amphion_tpu.data.audio_io import save_wav
from amphion_tpu.data.metadata import load_metadata
from amphion_tpu.data.preprocessors import SUPPORTED_DATASETS, preprocess_dataset
from amphion_tpu.data.processors.acoustic import extract_acoustic_features
from amphion_tpu.data.processors.phone import extract_phone_sequences
from amphion_tpu.ops.mel import MelConfig
from amphion_tpu.text.cleaners import english_cleaners, number_to_words
from amphion_tpu.text.g2p import G2PModule, LexiconG2P
from amphion_tpu.text.symbol_table import SymbolTable
from amphion_tpu.text.symbols import SYMBOLS, symbols_to_ids


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234567) == (
        "one million two hundred thirty four thousand five hundred sixty seven"
    )


def test_english_cleaners():
    out = english_cleaners("Dr. Smith paid $5.50 on Jan 3rd, 1984!")
    assert "doctor smith" in out
    assert "five dollars fifty cents" in out
    assert "nineteen eighty four" in out
    assert out == out.lower()


def test_symbols():
    assert SYMBOLS[0] == "_"
    ids = symbols_to_ids(["_", "a", "@AA1"])
    assert len(ids) == 3 and len(set(ids)) == 3


def test_symbol_table_roundtrip(tmp_path):
    t = SymbolTable.from_symbols(["_", "a", "b"])
    t.add("c")
    t.to_file(tmp_path / "sym.dict")
    back = SymbolTable.from_file(tmp_path / "sym.dict")
    assert back["c"] == t["c"] and len(back) == 4


def test_lexicon_g2p(tmp_path):
    lex = tmp_path / "lex.txt"
    lex.write_text("HELLO  HH AH0 L OW1\nWORLD  W ER1 L D\nA  AH0\n")
    g2p = LexiconG2P(lex)
    phones = g2p("Hello world!")
    assert "@HH" in phones and "@W" in phones and " " in phones
    # OOV letter fallback
    phones2 = g2p("ba")
    assert "@AH0" in phones2  # 'a' in lexicon


def test_g2p_module_char_backend():
    g2p = G2PModule("char")
    table = g2p.build_symbol_table(["hello world"])
    ids = g2p.to_ids("hello", table)
    assert len(ids) == 5


def _make_ljspeech(tmp_path, rng):
    root = tmp_path / "LJSpeech-1.1"
    (root / "wavs").mkdir(parents=True)
    rows = []
    for i in range(4):
        uid = f"LJ001-{i:04d}"
        x = (rng.standard_normal(4000) * 0.1).astype(np.float32)
        save_wav(root / "wavs" / f"{uid}.wav", x, 22050)
        rows.append(f"{uid}|Raw text {i}|Normalized text {i}")
    (root / "metadata.csv").write_text("\n".join(rows))
    return root


def test_ljspeech_adapter(tmp_path, rng):
    root = _make_ljspeech(tmp_path, rng)
    out = tmp_path / "processed"
    train, test = preprocess_dataset("ljspeech", str(root), str(out))
    assert len(train) + len(test) == 4
    meta = load_metadata(out / "ljspeech" / "train.json")
    assert meta[0].dataset == "ljspeech"
    assert meta[0].text.startswith("Normalized")
    stats = json.loads((out / "ljspeech" / "statistics.json").read_text())
    assert stats["n_utterances"] == 4


def test_registry_coverage():
    expected = {"ljspeech", "vctk", "libritts", "librilight", "hifitts",
                "opencpop", "m4singer", "opensinger", "popbutfy", "popcs",
                "kising", "csd", "opera", "nus48e", "svcc", "pjs",
                "audiofolder"}
    assert expected <= set(SUPPORTED_DATASETS)


def test_acoustic_extraction_pipeline(tmp_path, rng):
    root = _make_ljspeech(tmp_path, rng)
    out = tmp_path / "processed"
    train, test = preprocess_dataset("ljspeech", str(root), str(out))
    cfg = MelConfig(sample_rate=8000, n_fft=64, win_size=32, hop_size=8,
                    n_mel=16, fmax=4000)
    stats = extract_acoustic_features(train, out / "ljspeech", cfg)
    u = train[0]
    mel = np.load(out / "ljspeech" / "mels" / f"{u.uid}.npy")
    assert mel.shape[0] == 16
    f0 = np.load(out / "ljspeech" / "f0" / f"{u.uid}.npy")
    assert f0.shape[0] == mel.shape[1]
    assert len(stats["mel_min"]) == 16

    table = extract_phone_sequences(train, out / "ljspeech", backend="char")
    ids = json.loads(
        (out / "ljspeech" / "phones" / f"{u.uid}.json").read_text()
    )
    assert len(ids) > 0
    assert (out / "ljspeech" / "symbols.dict").is_file()


def test_intersperse_blank():
    """ref `utils/data_utils.py:15`: [1,74,5,31] -> 0-interleaved."""
    from amphion_tpu.text import intersperse

    assert intersperse([1, 74, 5, 31], 0) == [0, 1, 0, 74, 0, 5, 0, 31, 0]
    assert intersperse([], 0) == [0]
