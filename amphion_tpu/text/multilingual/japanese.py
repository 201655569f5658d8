"""Japanese kana-to-IPA, rule-based (no MeCab/pyopenjtalk available offline).

Reference behavior (models/tts/maskgct/g2p/g2p/japanese.py): romaji/kana
conversion tables + espeak. Ours converts hiragana/katakana directly to
IPA with the standard allophony rules:

- youon digraphs (きゃ/シュ/ちょ ...) before base kana,
- sokuon っ -> gemination (copies the following onset as ː-marked stop),
- chouon ー -> long vowel (ː),
- ん -> place-assimilated nasal (m before labials, ŋ before velars,
  ɴ utterance-finally, n otherwise),
- high-vowel devoicing is NOT modeled (espeak doesn't either),
- /u/ is rendered ɯ, /f/ -> ɸ, /r/ -> ɾ, し -> ɕi, つ -> tsɯ etc.

Kanji has no offline reading dictionary: callers may pass a
``lexicon`` dict (surface -> kana) for kanji vocabulary; unmatched kanji
are skipped with their surroundings intact. Numbers are read in on'yomi.
"""

from __future__ import annotations

import re

# base kana -> IPA phoneme tuple (onset..., vowel)
_KANA_IPA: dict[str, tuple[str, ...]] = {
    "あ": ("a",), "い": ("i",), "う": ("ɯ",), "え": ("e",), "お": ("o",),
    "か": ("k", "a"), "き": ("k", "i"), "く": ("k", "ɯ"), "け": ("k", "e"), "こ": ("k", "o"),
    "が": ("g", "a"), "ぎ": ("g", "i"), "ぐ": ("g", "ɯ"), "げ": ("g", "e"), "ご": ("g", "o"),
    "さ": ("s", "a"), "し": ("ɕ", "i"), "す": ("s", "ɯ"), "せ": ("s", "e"), "そ": ("s", "o"),
    "ざ": ("dz", "a"), "じ": ("dʑ", "i"), "ず": ("dz", "ɯ"), "ぜ": ("dz", "e"), "ぞ": ("dz", "o"),
    "た": ("t", "a"), "ち": ("tɕ", "i"), "つ": ("ts", "ɯ"), "て": ("t", "e"), "と": ("t", "o"),
    "だ": ("d", "a"), "ぢ": ("dʑ", "i"), "づ": ("dz", "ɯ"), "で": ("d", "e"), "ど": ("d", "o"),
    "な": ("n", "a"), "に": ("ɲ", "i"), "ぬ": ("n", "ɯ"), "ね": ("n", "e"), "の": ("n", "o"),
    "は": ("h", "a"), "ひ": ("ç", "i"), "ふ": ("ɸ", "ɯ"), "へ": ("h", "e"), "ほ": ("h", "o"),
    "ば": ("b", "a"), "び": ("b", "i"), "ぶ": ("b", "ɯ"), "べ": ("b", "e"), "ぼ": ("b", "o"),
    "ぱ": ("p", "a"), "ぴ": ("p", "i"), "ぷ": ("p", "ɯ"), "ぺ": ("p", "e"), "ぽ": ("p", "o"),
    "ま": ("m", "a"), "み": ("m", "i"), "む": ("m", "ɯ"), "め": ("m", "e"), "も": ("m", "o"),
    "や": ("j", "a"), "ゆ": ("j", "ɯ"), "よ": ("j", "o"),
    "ら": ("ɾ", "a"), "り": ("ɾ", "i"), "る": ("ɾ", "ɯ"), "れ": ("ɾ", "e"), "ろ": ("ɾ", "o"),
    "わ": ("w", "a"), "ゐ": ("i",), "ゑ": ("e",), "を": ("o",),
    "ゔ": ("v", "ɯ"),
}
# youon: second element of digraph
_SMALL_Y = {"ゃ": "a", "ゅ": "ɯ", "ょ": "o"}
# palatalized onset for digraphs
_PALATAL = {
    "k": "kʲ", "g": "gʲ", "s": "ɕ", "ɕ": "ɕ", "dz": "dʑ", "dʑ": "dʑ",
    "t": "tɕ", "tɕ": "tɕ", "n": "ɲ", "ɲ": "ɲ", "h": "ç", "ç": "ç",
    "ɸ": "ɸʲ", "b": "bʲ", "p": "pʲ", "m": "mʲ", "ɾ": "ɾʲ",
}
_SMALL_VOWEL = {"ぁ": "a", "ぃ": "i", "ぅ": "ɯ", "ぇ": "e", "ぉ": "o"}
_LABIAL = {"p", "pʲ", "b", "bʲ", "m", "mʲ"}
_VELAR = {"k", "kʲ", "g", "gʲ"}

_DIGIT_ON = ["ぜろ", "いち", "に", "さん", "よん", "ご", "ろく", "なな", "はち", "きゅう"]
_UNITS = [(10000, "まん"), (1000, "せん"), (100, "ひゃく"), (10, "じゅう")]
_NUM_EXC = {
    (1000, 3): "さんぜん", (1000, 8): "はっせん",
    (100, 3): "さんびゃく", (100, 6): "ろっぴゃく", (100, 8): "はっぴゃく",
}


def _number_to_kana(num: int) -> str:
    if num == 0:
        return _DIGIT_ON[0]
    if num >= 100000000:
        return "".join(_DIGIT_ON[int(d)] for d in str(num))
    out = []
    if num >= 10000:
        high, num = divmod(num, 10000)
        out.append((_number_to_kana(high) if high > 1 else "いち") + "まん")
    for base, unit in _UNITS[1:]:
        d, num = divmod(num, base)
        if d:
            if (base, d) in _NUM_EXC:
                out.append(_NUM_EXC[(base, d)])
            else:
                out.append(("" if d == 1 else _DIGIT_ON[d]) + unit)
    if num:
        out.append(_DIGIT_ON[num])
    return "".join(out)


def _kata_to_hira(text: str) -> str:
    out = []
    for ch in text:
        cp = ord(ch)
        if 0x30A1 <= cp <= 0x30F6:  # katakana -> hiragana offset
            out.append(chr(cp - 0x60))
        else:
            out.append(ch)
    return "".join(out)


def kana_to_ipa(kana: str) -> list[str]:
    """Convert a hiragana/katakana string to a flat IPA phone list."""
    kana = _kata_to_hira(kana)
    phones: list[str] = []
    gem = False  # pending sokuon
    i = 0
    while i < len(kana):
        ch = kana[i]
        if ch == "っ":
            gem = True
            i += 1
            continue
        if ch == "ー":
            if phones and phones[-1] in "aiɯeo":
                phones[-1] = phones[-1] + "ː"
            i += 1
            continue
        if ch == "ん":
            nxt = kana[i + 1] if i + 1 < len(kana) else ""
            nxt_on = _KANA_IPA.get(nxt, ("",))[0]
            if nxt_on in _LABIAL:
                phones.append("m")
            elif nxt_on in _VELAR:
                phones.append("ŋ")
            elif nxt == "":
                phones.append("ɴ")
            else:
                phones.append("n")
            i += 1
            continue
        base = _KANA_IPA.get(ch)
        if base is None:
            if ch in _SMALL_VOWEL:  # isolated small vowel: treat as plain
                phones.append(_SMALL_VOWEL[ch])
            i += 1
            continue
        # youon digraph?
        if i + 1 < len(kana) and kana[i + 1] in _SMALL_Y and len(base) == 2:
            onset = _PALATAL.get(base[0], base[0] + "ʲ")
            vowel = _SMALL_Y[kana[i + 1]]
            i += 2
        elif i + 1 < len(kana) and kana[i + 1] in _SMALL_VOWEL and len(base) == 2:
            onset, vowel = base[0], _SMALL_VOWEL[kana[i + 1]]
            i += 2
        else:
            onset = base[0] if len(base) == 2 else ""
            vowel = base[-1]
            i += 1
        if gem and onset:
            phones.append(onset + "ː" if not onset.endswith("ː") else onset)
            gem = False
        elif onset:
            phones.append(onset)
        phones.append(vowel)
    return phones


def japanese_to_ipa(text: str, lexicon: dict[str, str] | None = None) -> str:
    """kana (+ optional kanji lexicon) -> '|'-joined IPA, '|_|' between words."""
    text = re.sub(r"\d+", lambda m: _number_to_kana(int(m.group(0))), text)
    if lexicon:
        for surface in sorted(lexicon, key=len, reverse=True):
            text = text.replace(surface, lexicon[surface])
    # split on whitespace / middle dot; kana runs otherwise stay one word
    words = re.split(r"[\s・]+", text)
    out = []
    for w in words:
        phones = kana_to_ipa(w)
        if phones:
            out.append("|".join(phones))
    return "|_|".join(out)
