"""Grapheme-to-phoneme (reference: `text/g2p_module.py:98`,
`processors/phone_extractor.py:16`).

Backends:
- ``LexiconG2P``: pronunciation-dictionary lookup (CMUdict / librispeech
  lexicon format: ``WORD  PH1 PH2 ...``) with letter-wise spelling fallback
  for OOVs — covers the reference's 'lexicon' backend.
- character backend: cleaned characters as symbols (VITS-style char input).
- espeak backend hook: uses the ``phonemizer`` package when present (the
  reference's default English backend); raises a clear error otherwise.
- ``multilingual``: the native en/zh/ja/ko/fr/de IPA tokenizer
  (amphion_tpu.text.multilingual) — the offline counterpart of the
  reference's MaskGCT g2p package (models/tts/maskgct/g2p/).
"""

from __future__ import annotations

from pathlib import Path

from amphion_tpu.text.cleaners import english_cleaners
from amphion_tpu.text.symbol_table import SymbolTable
from amphion_tpu.text.symbols import SYMBOLS


class LexiconG2P:
    def __init__(self, lexicon_path: str | Path):
        self.lexicon: dict[str, list[str]] = {}
        with open(lexicon_path) as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) >= 2 and not parts[0].startswith(";;;"):
                    word = parts[0].upper().split("(")[0]
                    if word not in self.lexicon:
                        self.lexicon[word] = parts[1:]

    def __call__(self, text: str) -> list[str]:
        text = english_cleaners(text)
        phones: list[str] = []
        for word in text.split():
            w = word.strip("!'(),.:;?").upper()
            if not w:
                continue
            if w in self.lexicon:
                phones.extend("@" + p for p in self.lexicon[w])
            else:
                # letter-wise spelling fallback
                for ch in w:
                    if ch in self.lexicon:
                        phones.extend("@" + p for p in self.lexicon[ch])
                    else:
                        phones.append(ch.lower())
            phones.append(" ")
        if phones and phones[-1] == " ":
            phones.pop()
        return phones


class G2PModule:
    """Dispatching front end (ref `g2p_module.py` backends)."""

    def __init__(self, backend: str = "char", lexicon_path: str | None = None,
                 language: str = "en-us"):
        self.backend = backend
        self.language = language
        if backend == "lexicon":
            assert lexicon_path, "lexicon backend needs lexicon_path"
            self._lex = LexiconG2P(lexicon_path)
        elif backend == "multilingual":
            from amphion_tpu.text.multilingual import PhonemeTokenizer

            self._multi = PhonemeTokenizer()
        elif backend == "espeak":
            try:
                from phonemizer.backend import EspeakBackend  # optional

                self._espeak = EspeakBackend(
                    language, preserve_punctuation=True, with_stress=True
                )
            except ImportError as e:
                raise ImportError(
                    "espeak backend requires the 'phonemizer' package; use "
                    "backend='lexicon' or 'char' instead"
                ) from e

    def phonemes(self, text: str) -> list[str]:
        if self.backend == "lexicon":
            return self._lex(text)
        if self.backend == "multilingual":
            lang = self.language.split("-")[0]
            lang = lang if lang in self._multi.LANGS else "auto"
            ph = self._multi.to_ipa(text, lang)
            return [p for p in ph.split("|") if p]
        if self.backend == "espeak":
            out = self._espeak.phonemize([english_cleaners(text)], strip=True)
            return list(out[0])
        return list(english_cleaners(text))  # char backend

    def build_symbol_table(self, texts: list[str]) -> SymbolTable:
        table = SymbolTable.from_symbols(["_"])  # pad = 0
        for t in texts:
            for p in self.phonemes(t):
                table.add(p)
        return table

    def to_ids(self, text: str, table: SymbolTable) -> list[int]:
        return [table[p] for p in self.phonemes(text) if p in table]


def intersperse(ids: list[int], item: int = 0) -> list[int]:
    """[a, b] -> [item, a, item, b, item] (ref `utils/data_utils.py:15`;
    applied to phone sequences when `preprocess.add_blank`,
    `models/tts/base/tts_dataset.py:212`, `vits_inference.py:124`)."""
    out = [item] * (2 * len(ids) + 1)
    out[1::2] = ids
    return out
