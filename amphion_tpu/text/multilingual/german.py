"""German grapheme-to-IPA, rule-based.

Reference behavior (models/tts/maskgct/g2p/g2p/german.py): text cleaning +
espeak de. German orthography is highly regular: digraphs (sch/ch/ei/eu/ie),
final-obstruent devoicing, s-voicing before vowels, ß, umlauts.
"""

from __future__ import annotations

import re

_ONES_DE = ["null", "eins", "zwei", "drei", "vier", "fünf", "sechs",
            "sieben", "acht", "neun", "zehn", "elf", "zwölf", "dreizehn",
            "vierzehn", "fünfzehn", "sechzehn", "siebzehn", "achtzehn",
            "neunzehn"]
_TENS_DE = ["", "zehn", "zwanzig", "dreißig", "vierzig", "fünfzig",
            "sechzig", "siebzig", "achtzig", "neunzig"]


def number_to_words_de(num: int) -> str:
    if num < 0:
        return "minus " + number_to_words_de(-num)
    if num < 20:
        return _ONES_DE[num]
    if num < 100:
        t, o = divmod(num, 10)
        if o == 0:
            return _TENS_DE[t]
        one = "ein" if o == 1 else _ONES_DE[o]
        return one + "und" + _TENS_DE[t]
    if num < 1000:
        h, low = divmod(num, 100)
        s = ("ein" if h == 1 else _ONES_DE[h]) + "hundert"
        return s if low == 0 else s + number_to_words_de(low)
    if num < 10 ** 6:
        k, low = divmod(num, 1000)
        s = ("ein" if k == 1 else number_to_words_de(k)) + "tausend"
        return s if low == 0 else s + number_to_words_de(low)
    m, low = divmod(num, 10 ** 6)
    s = ("eine Million" if m == 1 else number_to_words_de(m) + " Millionen")
    return s if low == 0 else s + " " + number_to_words_de(low)


_VOW = "aeiouyäöü"
# fmt: off
_RULES_DE: list[tuple[str, str, str, tuple[str, ...]]] = [
    ("", "tsch", "", ("tʃ",)), ("", "schen", "#", ("ʃ", "ə", "n")),
    ("", "sch", "", ("ʃ",)),
    ("", "tion", "", ("ts", "j", "oː", "n")),
    ("#", "st", "", ("ʃ", "t")), ("#", "sp", "", ("ʃ", "p")),
    ("", "chs", "", ("k", "s")),
    ("a", "ch", "", ("x",)), ("o", "ch", "", ("x",)), ("u", "ch", "", ("x",)),
    ("", "ch", "", ("ç",)),
    ("", "ck", "", ("k",)), ("", "ph", "", ("f",)), ("", "th", "", ("t",)),
    ("", "qu", "", ("k", "v")), ("", "pf", "", ("pf",)), ("", "tz", "", ("ts",)),
    ("", "ng", "", ("ŋ",)), ("", "nk", "", ("ŋ", "k")),
    ("", "ei", "", ("aɪ",)), ("", "ai", "", ("aɪ",)), ("", "eu", "", ("ɔʏ",)),
    ("", "äu", "", ("ɔʏ",)), ("", "au", "", ("aʊ",)),
    ("", "ie", "", ("iː",)), ("", "ee", "", ("eː",)), ("", "aa", "", ("aː",)),
    ("", "oo", "", ("oː",)),
    ("", "ah", "", ("aː",)), ("", "eh", "", ("eː",)), ("", "ih", "", ("iː",)),
    ("", "oh", "", ("oː",)), ("", "uh", "", ("uː",)), ("", "äh", "", ("ɛː",)),
    ("", "öh", "", ("øː",)), ("", "üh", "", ("yː",)),
    ("", "ä", "", ("ɛ",)), ("", "ö", "", ("œ",)), ("", "ü", "", ("ʏ",)),
    ("", "ß", "", ("s",)),
    ("", "a", "CC", ("a",)), ("", "a", "C#", ("a",)), ("", "a", "CV", ("aː",)),
    ("", "a", "", ("a",)),
    ("", "e", "#", ("ə",)), ("", "e", "n#", ("ə",)), ("", "e", "r#", ("ɐ",)),
    ("", "e", "CC", ("ɛ",)), ("", "e", "CV", ("eː",)), ("", "e", "", ("ɛ",)),
    ("", "i", "CC", ("ɪ",)), ("", "i", "CV", ("iː",)), ("", "i", "", ("ɪ",)),
    ("", "o", "CC", ("ɔ",)), ("", "o", "CV", ("oː",)), ("", "o", "", ("ɔ",)),
    ("", "u", "CC", ("ʊ",)), ("", "u", "CV", ("uː",)), ("", "u", "", ("ʊ",)),
    ("", "y", "", ("ʏ",)),
    ("#", "s", "V", ("z",)), ("V", "s", "V", ("z",)), ("", "ss", "", ("s",)),
    ("", "s", "", ("s",)),
    ("", "b", "#", ("p",)), ("", "d", "#", ("t",)), ("", "g", "#", ("k",)),
    ("", "b", "", ("b",)), ("", "d", "", ("d",)), ("", "g", "", ("g",)),
    ("", "w", "", ("v",)), ("", "v", "", ("f",)), ("", "z", "", ("ts",)),
    ("", "j", "", ("j",)), ("", "r", "#", ("ɐ",)), ("", "r", "", ("ʁ",)),
    ("", "c", "", ("k",)), ("", "f", "", ("f",)), ("", "h", "", ("h",)),
    ("", "k", "", ("k",)), ("", "l", "", ("l",)), ("", "m", "", ("m",)),
    ("", "n", "", ("n",)), ("", "p", "", ("p",)), ("", "t", "", ("t",)),
    ("", "x", "", ("k", "s")), ("", "'", "", ()), ("", "-", "", ()),
]
# fmt: on
_MAXLEN_DE = max(len(r[1]) for r in _RULES_DE)


def _ctx_match(word: str, pos: int, end: int, left: str, right: str) -> bool:
    def ok(spec: str, idx: int, direction: int) -> bool:
        for s in (spec if direction > 0 else spec[::-1]):
            if s == "#":
                return idx >= len(word) if direction > 0 else idx < 0
            if idx < 0 or idx >= len(word):
                return False
            ch = word[idx]
            if s == "V" and ch not in _VOW:
                return False
            if s == "C" and (ch in _VOW or not ch.isalpha()):
                return False
            if s not in "VC#" and ch != s:
                return False
            idx += direction
        return True

    return ok(left, pos - 1, -1) and ok(right, end, 1)


def word_to_ipa_de(word: str) -> list[str]:
    word = word.lower()
    phones: list[str] = []
    i = 0
    while i < len(word):
        matched = False
        for ln in range(min(_MAXLEN_DE, len(word) - i), 0, -1):
            g = word[i:i + ln]
            for left, graph, right, out in _RULES_DE:
                if graph == g and _ctx_match(word, i, i + ln, left, right):
                    phones.extend(out)
                    i += ln
                    matched = True
                    break
            if matched:
                break
        if not matched:
            i += 1
    out: list[str] = []
    for p in phones:  # collapse geminates (doppel consonants are short)
        if out and out[-1] == p and p[0] not in _VOW + "ɛɔəɐʏʊɪ":
            continue
        out.append(p)
    return out


def german_to_ipa(text: str) -> str:
    text = re.sub(r"\d+", lambda m: " %s " % number_to_words_de(int(m.group(0))), text)
    words = re.findall(r"[a-zA-Zäöüß'-]+|[,.!?;:…]", text)
    out = []
    for w in words:
        if not (w[0].isalpha() or w[0] in "äöüß"):
            out.append(w)
            continue
        phones = word_to_ipa_de(w)
        if phones:
            out.append("|".join(phones))
    return "|_|".join(out)
