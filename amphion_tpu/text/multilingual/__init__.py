"""Multilingual phoneme tokenizer (en/zh/ja/ko/fr/de), fully offline.

TPU-native counterpart of the reference's MaskGCT g2p package
(models/tts/maskgct/g2p/g2p/__init__.py PhonemeBpeTokenizer): language
segmentation -> per-language IPA conversion -> phoneme-id tokenization.
The reference stack (LangSegment + pypinyin + espeak + a BERT polyphone
model) is replaced by native rule systems:

- segmentation by Unicode script (segment.py),
- zh: jieba + pinyin lexicons + tone sandhi + pinyin->IPA (mandarin.py),
- ja: kana->IPA rules (japanese.py),
- ko: hangul decomposition + phonological rules (korean.py),
- en: normalization + lexicon/NRL-style LTS (english.py),
- fr/de: rule LTS (french.py / german.py).

Phoneme strings use "|" between phones and "|_|" between words, matching
the reference separator convention. The vocabulary is built
deterministically from the converters' own symbol inventories, so every
emitted phone has an id; ids are stable across runs for a given package
version.
"""

from __future__ import annotations

from amphion_tpu.text.multilingual.segment import Segment, segment_text
from amphion_tpu.text.multilingual.mandarin import chinese_to_ipa
from amphion_tpu.text.multilingual.japanese import japanese_to_ipa
from amphion_tpu.text.multilingual.korean import korean_to_ipa
from amphion_tpu.text.multilingual.english import english_to_ipa
from amphion_tpu.text.multilingual.french import french_to_ipa
from amphion_tpu.text.multilingual.german import german_to_ipa

PAD, UNK, BOS, EOS, WORD_SEP = "<pad>", "<unk>", "<bos>", "<eos>", "_"
_PUNCT = [",", ".", "!", "?", ";", ":", "'", "…"]
_TONES = [str(t) for t in range(1, 6)]


def _inventory() -> list[str]:
    """Union of every phone the per-language converters can emit."""
    from amphion_tpu.text.multilingual import (english, french, german,
                                               japanese, korean, mandarin)

    phones: set[str] = set()
    phones.update(english.ARPA_IPA.values())
    for rules in (english._RULES, french._RULES_FR, german._RULES_DE):
        for _, _, _, out in rules:
            phones.update(out)
    for tbl in (mandarin._INITIAL_IPA, mandarin._SYLLABIC):
        phones.update(v for v in tbl.values() if v)
    for seq in mandarin._FINAL_IPA.values():
        phones.update(seq)
    phones.add("ɚ")
    for base in japanese._KANA_IPA.values():
        phones.update(base)
    phones.update(japanese._PALATAL.values())
    phones.update(japanese._SMALL_VOWEL.values())
    phones.update({"ɴ", "ŋ", "m", "n"})
    phones.update(p + "ː" for p in list(phones) if len(p) <= 2)  # long variants
    for tbl in (korean._ONSET_IPA, korean._VOWEL_IPA, korean._CODA_IPA):
        phones.update(v for v in tbl.values() if v)
    phones.discard("")
    return sorted(phones)


class PhonemeTokenizer:
    """text -> (phoneme string, token ids); languages en/zh/ja/ko/fr/de/auto.

    Optional lexicons extend coverage: ``en_lexicon`` (CMU ARPAbet dict),
    ``zh_char_lexicon`` / ``zh_word_lexicon`` (char/word -> pinyin),
    ``ja_lexicon`` (kanji surface -> kana).
    """

    LANGS = ("en", "zh", "ja", "ko", "fr", "de")

    def __init__(self, en_lexicon=None, zh_char_lexicon=None,
                 zh_word_lexicon=None, ja_lexicon=None):
        self.en_lexicon = en_lexicon
        self.zh_char_lexicon = zh_char_lexicon
        self.zh_word_lexicon = zh_word_lexicon
        self.ja_lexicon = ja_lexicon
        symbols = [PAD, UNK, BOS, EOS, WORD_SEP] + _PUNCT + _TONES + _inventory()
        self.vocab: dict[str, int] = {}
        for s in symbols:  # first occurrence wins (tones overlap inventory)
            if s not in self.vocab:
                self.vocab[s] = len(self.vocab)
        self.id_to_symbol = {i: s for s, i in self.vocab.items()}

    def __len__(self) -> int:
        return len(self.vocab)

    def to_ipa(self, text: str, language: str = "auto") -> str:
        if language == "auto":
            segs = segment_text(text)
        else:
            segs = [Segment(text, language)]
        parts = []
        for seg in segs:
            if seg.lang == "zh":
                ph = chinese_to_ipa(seg.text, self.zh_char_lexicon,
                                    self.zh_word_lexicon)
            elif seg.lang == "ja":
                ph = japanese_to_ipa(seg.text, self.ja_lexicon)
            elif seg.lang == "ko":
                ph = korean_to_ipa(seg.text)
            elif seg.lang == "fr":
                ph = french_to_ipa(seg.text)
            elif seg.lang == "de":
                ph = german_to_ipa(seg.text)
            elif seg.lang == "en":
                ph = english_to_ipa(seg.text, self.en_lexicon)
            else:
                raise ValueError(f"unknown language: {seg.lang}")
            if ph:
                parts.append(ph)
        return "|_|".join(parts)

    def phoneme_to_ids(self, phoneme_str: str) -> list[int]:
        ids = []
        for tok in phoneme_str.split("|"):
            if not tok:
                continue
            ids.append(self.vocab.get(tok, self.vocab[UNK]))
        return ids

    def tokenize(self, text: str, language: str = "auto"
                 ) -> tuple[str, list[int]]:
        """Mirrors the reference API: returns (phoneme string, token ids)."""
        ph = self.to_ipa(text, language)
        return ph, self.phoneme_to_ids(ph)


__all__ = ["PhonemeTokenizer", "segment_text", "Segment", "chinese_to_ipa",
           "japanese_to_ipa", "korean_to_ipa", "english_to_ipa",
           "french_to_ipa", "german_to_ipa"]
