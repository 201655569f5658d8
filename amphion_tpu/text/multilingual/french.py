"""French grapheme-to-IPA, rule-based.

Reference behavior (models/tts/maskgct/g2p/g2p/french.py): text cleaning +
espeak fr-fr. French orthography is regular enough for rule LTS: digraph
table ordered longest-first with context conditions, nasal vowels, final
consonant deletion, soft c/g. Liaison is not modeled (espeak mostly
doesn't either without syntax).
"""

from __future__ import annotations

import re

_ONES_FR = ["zéro", "un", "deux", "trois", "quatre", "cinq", "six", "sept",
            "huit", "neuf", "dix", "onze", "douze", "treize", "quatorze",
            "quinze", "seize", "dix-sept", "dix-huit", "dix-neuf"]
_TENS_FR = ["", "dix", "vingt", "trente", "quarante", "cinquante",
            "soixante", "soixante-dix", "quatre-vingt", "quatre-vingt-dix"]


def number_to_words_fr(num: int) -> str:
    if num < 0:
        return "moins " + number_to_words_fr(-num)
    if num < 20:
        return _ONES_FR[num]
    if num < 100:
        t, o = divmod(num, 10)
        if t in (7, 9):  # 70-79 / 90-99 use the 60/80 base + teens
            return _TENS_FR[t - 1] + "-" + _ONES_FR[10 + o]
        base = _TENS_FR[t]
        if o == 0:
            return base + ("s" if t == 8 else "")
        return base + ("-et-" if o == 1 and t != 8 else "-") + _ONES_FR[o]
    if num < 1000:
        h, low = divmod(num, 100)
        s = ("cent" if h == 1 else _ONES_FR[h] + " cent")
        return s if low == 0 else s + " " + number_to_words_fr(low)
    if num < 10 ** 6:
        k, low = divmod(num, 1000)
        s = ("mille" if k == 1 else number_to_words_fr(k) + " mille")
        return s if low == 0 else s + " " + number_to_words_fr(low)
    m, low = divmod(num, 10 ** 6)
    s = number_to_words_fr(m) + (" million" if m == 1 else " millions")
    return s if low == 0 else s + " " + number_to_words_fr(low)


_VOW = "aeiouyàâéèêëîïôùûüœ"
# fmt: off
# (left, grapheme, right, phones); '#'=edge, 'V'=vowel, 'C'=consonant, ''=any
_RULES_FR: list[tuple[str, str, str, tuple[str, ...]]] = [
    ("", "eaux", "#", ("o",)), ("", "eau", "", ("o",)),
    ("", "aient", "#", ("ɛ",)), ("", "aint", "", ("ɛ̃",)),
    ("", "oient", "#", ("wa",)),
    ("", "tion", "", ("s", "j", "ɔ̃")), ("", "ient", "#", ("j", "ɛ̃")),
    ("", "ain", "V", ("ɛ", "n")), ("", "ain", "", ("ɛ̃",)),
    ("", "aim", "", ("ɛ̃",)), ("", "ein", "V", ("ɛ", "n")),
    ("", "ein", "", ("ɛ̃",)),
    ("", "oin", "", ("w", "ɛ̃")), ("", "ouill", "", ("u", "j")),
    ("", "euill", "", ("œ", "j")), ("", "euil", "", ("œ", "j")),
    ("", "aill", "", ("a", "j")), ("", "eill", "", ("ɛ", "j")),
    ("", "ill", "", ("i", "j")),
    ("", "gn", "", ("ɲ",)), ("", "ch", "", ("ʃ",)), ("", "ph", "", ("f",)),
    ("", "th", "", ("t",)), ("", "qu", "", ("k",)), ("#", "h", "", ()),
    ("", "h", "", ()),
    ("", "eux", "#", ("ø",)), ("", "eu", "", ("ø",)), ("", "œu", "", ("œ",)),
    ("", "ou", "", ("u",)), ("", "oi", "", ("w", "a")),
    ("", "au", "", ("o",)), ("", "ai", "", ("ɛ",)), ("", "ei", "", ("ɛ",)),
    ("", "an", "V", ("a", "n")), ("", "an", "n", ("a",)), ("", "an", "", ("ɑ̃",)),
    ("", "am", "CV", ("a", "m")), ("", "am", "p", ("ɑ̃",)), ("", "am", "b", ("ɑ̃",)),
    ("", "en", "V", ("ə", "n")), ("", "en", "n", ("ɛ",)), ("", "en", "", ("ɑ̃",)),
    ("", "em", "p", ("ɑ̃",)), ("", "em", "b", ("ɑ̃",)),
    ("", "in", "V", ("i", "n")), ("", "in", "n", ("i",)), ("", "in", "", ("ɛ̃",)),
    ("", "im", "p", ("ɛ̃",)), ("", "im", "b", ("ɛ̃",)),
    ("", "on", "V", ("ɔ", "n")), ("", "on", "n", ("ɔ",)), ("", "on", "", ("ɔ̃",)),
    ("", "om", "p", ("ɔ̃",)), ("", "om", "b", ("ɔ̃",)),
    ("", "un", "V", ("y", "n")), ("", "un", "#", ("œ̃",)),
    ("", "er", "#", ("e",)), ("", "ez", "#", ("e",)), ("", "et", "#", ("ɛ",)),
    ("", "es", "#", ()), ("", "ent", "#", ()),
    ("", "é", "", ("e",)), ("", "è", "", ("ɛ",)), ("", "ê", "", ("ɛ",)),
    ("", "ë", "", ("ɛ",)), ("", "à", "", ("a",)), ("", "â", "", ("ɑ",)),
    ("", "î", "", ("i",)), ("", "ï", "", ("i",)), ("", "ô", "", ("o",)),
    ("", "ù", "", ("y",)), ("", "û", "", ("y",)), ("", "ü", "", ("y",)),
    ("", "ç", "", ("s",)), ("", "œ", "", ("œ",)),
    ("", "e", "#", ()), ("", "e", "s#", ()),
    ("", "e", "CC", ("ɛ",)), ("", "e", "", ("ə",)),
    ("", "a", "", ("a",)), ("", "i", "V", ("j",)), ("", "i", "", ("i",)),
    ("", "o", "", ("ɔ",)), ("", "u", "V", ("ɥ",)), ("", "u", "", ("y",)),
    ("C", "y", "", ("i",)), ("", "y", "", ("j",)),
    ("", "c", "e", ("s",)), ("", "c", "i", ("s",)), ("", "c", "y", ("s",)),
    ("", "c", "#", ("k",)), ("", "c", "", ("k",)),
    ("", "g", "e", ("ʒ",)), ("", "g", "i", ("ʒ",)), ("", "g", "y", ("ʒ",)),
    ("", "gu", "V", ("g",)), ("", "g", "", ("g",)),
    ("V", "s", "V", ("z",)), ("", "ss", "", ("s",)),
    ("", "s", "#", ()), ("", "s", "", ("s",)),
    ("", "x", "#", ()), ("", "x", "", ("k", "s")),
    ("", "j", "", ("ʒ",)), ("", "r", "", ("ʁ",)),
    ("", "t", "#", ()), ("", "d", "#", ()), ("", "p", "#", ()),
    ("", "z", "#", ()), ("", "b", "", ("b",)), ("", "d", "", ("d",)),
    ("", "f", "", ("f",)), ("", "k", "", ("k",)), ("", "l", "", ("l",)),
    ("", "m", "", ("m",)), ("", "n", "", ("n",)), ("", "p", "", ("p",)),
    ("", "t", "", ("t",)), ("", "v", "", ("v",)), ("", "w", "", ("w",)),
    ("", "z", "", ("z",)), ("", "q", "", ("k",)), ("", "'", "", ()),
    ("", "-", "", ()),
]
# fmt: on
_MAXLEN_FR = max(len(r[1]) for r in _RULES_FR)


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


def word_to_ipa_fr(word: str) -> list[str]:
    word = word.lower()
    # elision: c'est -> cest (keeps soft-c context), l'ami -> lami
    word = word.replace("'", "")
    phones: list[str] = []
    i = 0
    while i < len(word):
        matched = False
        for ln in range(min(_MAXLEN_FR, len(word) - i), 0, -1):
            g = word[i:i + ln]
            for left, graph, right, out in _RULES_FR:
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
    for p in phones:  # collapse geminate consonants (belle -> bɛl)
        if out and out[-1] == p and p[0] not in _VOW + "ɛɔəøœɑ̃ɔ̃ɛ̃":
            continue
        out.append(p)
    return out


def french_to_ipa(text: str) -> str:
    text = re.sub(r"\d+", lambda m: " %s " % number_to_words_fr(int(m.group(0))), text)
    words = re.findall(r"[a-zA-Zàâéèêëîïôùûüçœ'-]+|[,.!?;:…]", text)
    out = []
    for w in words:
        if not (w[0].isalpha() or w[0] in "àâéèêëîïôùûüçœ"):
            out.append(w)
            continue
        phones = word_to_ipa_fr(w)
        if phones:
            out.append("|".join(phones))
    return "|_|".join(out)
