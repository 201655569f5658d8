"""Korean grapheme-to-IPA, fully algorithmic (no external libraries).

Reference behavior (models/tts/maskgct/g2p/g2p/korean.py): normalize
Latin acronyms to hangul, then phonemize with espeak. espeak is not
available offline, so we implement the standard pipeline natively:

1. hangul syllable decomposition (pure Unicode arithmetic),
2. the major Standard-Korean phonological rules across syllable
   boundaries (liaison, nasalization, lenition of ㅎ, fortis after
   obstruents, coda neutralization),
3. jamo -> IPA mapping (revised-romanization-adjacent IPA set).

Output convention matches the package: IPA symbols joined by "|",
words separated by "|_|".
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------- jamo maps
_CHO = [
    "g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s", "ss", "", "j",
    "jj", "ch", "k", "t", "p", "h",
]
_JUNG = [
    "a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa", "wae",
    "oe", "yo", "u", "wo", "we", "wi", "yu", "eu", "ui", "i",
]
_JONG = [
    "", "g", "kk", "gs", "n", "nj", "nh", "d", "l", "lg", "lm", "lb",
    "ls", "lt", "lp", "lh", "m", "b", "bs", "s", "ss", "ng", "j", "ch",
    "k", "t", "p", "h",
]

# onset romanization -> IPA
_ONSET_IPA = {
    "g": "k", "kk": "k͈", "n": "n", "d": "t", "tt": "t͈", "r": "ɾ",
    "m": "m", "b": "p", "pp": "p͈", "s": "s", "ss": "s͈", "": "",
    "j": "tɕ", "jj": "t͈ɕ", "ch": "tɕʰ", "k": "kʰ", "t": "tʰ",
    "p": "pʰ", "h": "h",
}
# vowel romanization -> IPA
_VOWEL_IPA = {
    "a": "a", "ae": "ɛ", "ya": "ja", "yae": "jɛ", "eo": "ʌ", "e": "e",
    "yeo": "jʌ", "ye": "je", "o": "o", "wa": "wa", "wae": "wɛ",
    "oe": "we", "yo": "jo", "u": "u", "wo": "wʌ", "we": "we",
    "wi": "wi", "yu": "ju", "eu": "ɯ", "ui": "ɰi", "i": "i",
}
# coda (after neutralization) -> IPA
_CODA_IPA = {"k": "k̚", "n": "n", "t": "t̚", "l": "ɭ", "m": "m",
             "p": "p̚", "ng": "ŋ", "": ""}

# coda neutralization to the 7 releasable codas (+ cluster simplification)
_CODA_NEUTRAL = {
    "": "", "g": "k", "kk": "k", "gs": "k", "n": "n", "nj": "n",
    "nh": "n", "d": "t", "l": "l", "lg": "k", "lm": "m", "lb": "l",
    "ls": "l", "lt": "l", "lp": "p", "lh": "l", "m": "m", "b": "p",
    "bs": "p", "s": "t", "ss": "t", "ng": "ng", "j": "t", "ch": "t",
    "k": "k", "t": "t", "p": "p", "h": "t",
}
# final-consonant of a cluster that resurfaces on liaison
_CLUSTER_SPLIT = {
    "gs": ("g", "s"), "nj": ("n", "j"), "nh": ("n", "h"),
    "lg": ("l", "g"), "lm": ("l", "m"), "lb": ("l", "b"),
    "ls": ("l", "s"), "lt": ("l", "t"), "lp": ("l", "p"),
    "lh": ("l", "h"),
}
_PLAIN_TO_FORTIS = {"g": "kk", "d": "tt", "b": "pp", "s": "ss", "j": "jj"}
_PLAIN_TO_ASP = {"g": "k", "d": "t", "b": "p", "j": "ch"}

# Latin acronym / letter reading (ref korean.py english_dictionary)
_LETTER_HANGUL = {
    "A": "에이", "B": "비", "C": "씨", "D": "디", "E": "이", "F": "에프",
    "G": "지", "H": "에이치", "I": "아이", "J": "제이", "K": "케이",
    "L": "엘", "M": "엠", "N": "엔", "O": "오", "P": "피", "Q": "큐",
    "R": "알", "S": "에스", "T": "티", "U": "유", "V": "브이",
    "W": "더블유", "X": "엑스", "Y": "와이", "Z": "제트",
}
_WORD_HANGUL = {
    "KOREA": "코리아", "IDOL": "아이돌", "IT": "아이티", "IQ": "아이큐",
    "UP": "업", "DOWN": "다운", "PC": "피씨", "CCTV": "씨씨티비",
    "SNS": "에스엔에스", "AI": "에이아이", "CEO": "씨이오",
}

_DIGIT_HANGUL = ["영", "일", "이", "삼", "사", "오", "육", "칠", "팔", "구"]
_UNIT_HANGUL = [(10000, "만"), (1000, "천"), (100, "백"), (10, "십")]


def _number_to_hangul(num: int) -> str:
    if num == 0:
        return _DIGIT_HANGUL[0]
    if num >= 100000000:  # fall back to digit-by-digit beyond 억 range
        return "".join(_DIGIT_HANGUL[int(d)] for d in str(num))
    out = []
    if num >= 10000:
        high, num = divmod(num, 10000)
        out.append(_number_to_hangul(high) + "만" if high > 1 else "만")
    for base, unit in _UNIT_HANGUL[1:]:
        d, num = divmod(num, base)
        if d:
            out.append(("" if d == 1 else _DIGIT_HANGUL[d]) + unit)
    if num:
        out.append(_DIGIT_HANGUL[num])
    return "".join(out)


def normalize_korean(text: str) -> str:
    def _word(m: re.Match) -> str:
        w = m.group(0)
        if w.upper() in _WORD_HANGUL:
            return _WORD_HANGUL[w.upper()]
        return "".join(_LETTER_HANGUL.get(c.upper(), "") for c in w)

    text = re.sub(r"[A-Za-z]+", _word, text)
    text = re.sub(r"\d+", lambda m: _number_to_hangul(int(m.group(0))), text)
    return text


def _decompose(ch: str) -> tuple[str, str, str] | None:
    cp = ord(ch)
    if not (0xAC00 <= cp <= 0xD7A3):
        return None
    idx = cp - 0xAC00
    jong = idx % 28
    jung = (idx // 28) % 21
    cho = idx // (28 * 21)
    return _CHO[cho], _JUNG[jung], _JONG[jong]


def _apply_sandhi(syls: list[list[str]]) -> list[list[str]]:
    """Cross-boundary phonology on [onset, vowel, coda] romanized triples."""
    for i in range(len(syls) - 1):
        coda, onset = syls[i][2], syls[i + 1][0]
        # liaison: coda resurfaces as next onset before a vowel
        if onset == "":
            if coda in _CLUSTER_SPLIT:
                keep, move = _CLUSTER_SPLIT[coda]
                syls[i][2] = keep
                syls[i + 1][0] = "ss" if (coda == "ls" and move == "s") else move
                continue
            if coda and coda != "ng":
                syls[i][2] = ""
                syls[i + 1][0] = "" if coda == "h" else coda
                continue
        # ㅎ-related: coda h + plain stop -> aspirated; stop + h onset -> aspirated
        if coda in ("h", "nh", "lh") and onset in _PLAIN_TO_ASP:
            syls[i][2] = {"h": "", "nh": "n", "lh": "l"}[coda]
            syls[i + 1][0] = _PLAIN_TO_ASP[onset]
            continue
        neutral = _CODA_NEUTRAL.get(coda, coda)
        if neutral in ("k", "t", "p") and onset == "h":
            syls[i][2] = ""
            syls[i + 1][0] = _PLAIN_TO_ASP[{"k": "g", "t": "d", "p": "b"}[neutral]]
            continue
        syls[i][2] = neutral
        # nasalization: obstruent coda + nasal onset
        if neutral in ("k", "t", "p") and onset in ("n", "m"):
            syls[i][2] = {"k": "ng", "t": "n", "p": "m"}[neutral]
            continue
        # ㄹ assimilation: n+l or l+n -> l+l ; obstruent+r -> nasal+n
        if onset == "r":
            if neutral == "n":
                syls[i][2] = "l"
                syls[i + 1][0] = "r"
            elif neutral in ("k", "t", "p", "m", "ng"):
                syls[i][2] = {"k": "ng", "t": "n", "p": "m",
                              "m": "m", "ng": "ng"}[neutral]
                syls[i + 1][0] = "n"
            continue
        if neutral == "l" and onset == "n":
            syls[i + 1][0] = "r"
            continue
        # post-obstruent tensing
        if neutral in ("k", "t", "p") and onset in _PLAIN_TO_FORTIS:
            syls[i + 1][0] = _PLAIN_TO_FORTIS[onset]
    if syls:
        syls[-1][2] = _CODA_NEUTRAL.get(syls[-1][2], syls[-1][2])
    return syls


def _syllable_ipa(onset: str, vowel: str, coda: str, initial: bool) -> list[str]:
    phones = []
    on = _ONSET_IPA.get(onset, "")
    # intervocalic ㄹ is a tap; word-initial stays ɾ too (simplified)
    if on:
        phones.append(on)
    phones.append(_VOWEL_IPA[vowel])
    if coda:
        phones.append(_CODA_IPA.get(coda, coda))
    return phones


def korean_word_to_ipa(word: str) -> list[str]:
    syls: list[list[str]] = []
    out: list[str] = []
    for ch in word:
        dec = _decompose(ch)
        if dec is None:
            # flush pending syllables, keep the char as-is (punct)
            for i, s in enumerate(_apply_sandhi(syls)):
                out.extend(_syllable_ipa(*s, initial=(i == 0)))
            syls = []
            if ch.strip():
                out.append(ch)
            continue
        syls.append(list(dec))
    for i, s in enumerate(_apply_sandhi(syls)):
        out.extend(_syllable_ipa(*s, initial=(i == 0)))
    return out


def korean_to_ipa(text: str) -> str:
    """Full pipeline: normalize -> per-word jamo phonology -> IPA string."""
    text = normalize_korean(text)
    words = text.split()
    word_phones = ["|".join(korean_word_to_ipa(w)) for w in words]
    return "|_|".join(p for p in word_phones if p)
