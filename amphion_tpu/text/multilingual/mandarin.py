"""Mandarin grapheme-to-IPA: jieba word segmentation + native pinyin rules.

Reference behavior (models/tts/maskgct/g2p/g2p/mandarin.py): jieba + pypinyin
-> bopomofo -> espeak IPA, with a BERT polyphone disambiguator. pypinyin and
the BERT weights are unavailable offline, so ours is:

1. jieba word segmentation (available in-image),
2. word-level pinyin lexicon (common polyphonic words) then a built-in
   per-character table of ~400 high-frequency characters; callers can pass
   ``char_lexicon`` / ``word_lexicon`` to extend coverage (e.g. a full
   Unihan kMandarin dump) — the tables here make common text work out of
   the box,
3. tone sandhi (3-3 -> 2-3, 不 / 一 rules, neutral tone 5),
4. pinyin syllable -> IPA (initial/final split, standard Mandarin IPA),
   tones emitted as separate "1".."5" tokens after each syllable.

Also accepts raw pinyin-with-tone-digits input (e.g. opencpop transcripts:
"ni3 hao3") — detected per word.
"""

from __future__ import annotations

import re

from amphion_tpu.text.multilingual.pinyin_data import (
    CHAR_PINYIN as _BASE_CHAR_PINYIN,
)
from amphion_tpu.text.multilingual.pinyin_data import WORD_PINYIN as _BASE_WORDS
from amphion_tpu.text.multilingual.polyphone_inventory import (
    POLY_CHAR_DEFAULTS,
    POLY_WORDS,
)

# effective lexicons: the frequency-ranked base tables extended with the
# polyphone-inventory realizations (reference polydict.json grounding —
# see polyphone_inventory.py); base entries win on collision.
CHAR_PINYIN = {**POLY_CHAR_DEFAULTS, **_BASE_CHAR_PINYIN}
WORD_PINYIN = {**POLY_WORDS, **_BASE_WORDS}

_INITIALS = ["zh", "ch", "sh", "b", "p", "m", "f", "d", "t", "n", "l",
             "g", "k", "h", "j", "q", "x", "r", "z", "c", "s"]

_INITIAL_IPA = {
    "b": "p", "p": "pʰ", "m": "m", "f": "f", "d": "t", "t": "tʰ",
    "n": "n", "l": "l", "g": "k", "k": "kʰ", "h": "x", "j": "tɕ",
    "q": "tɕʰ", "x": "ɕ", "zh": "ʈʂ", "ch": "ʈʂʰ", "sh": "ʂ", "r": "ɻ",
    "z": "ts", "c": "tsʰ", "s": "s", "": "",
}

_FINAL_IPA = {
    "a": ("a",), "o": ("o",), "e": ("ɤ",), "ê": ("ɛ",), "i": ("i",),
    "u": ("u",), "v": ("y",), "er": ("ɚ",),
    "ai": ("ai",), "ei": ("ei",), "ao": ("ɑu",), "ou": ("ou",),
    "an": ("a", "n"), "en": ("ə", "n"), "ang": ("ɑ", "ŋ"),
    "eng": ("ə", "ŋ"), "ong": ("ʊ", "ŋ"),
    "ia": ("j", "a"), "ie": ("j", "ɛ"), "iao": ("j", "ɑu"),
    "iou": ("j", "ou"), "ian": ("j", "ɛ", "n"), "in": ("i", "n"),
    "iang": ("j", "ɑ", "ŋ"), "ing": ("i", "ŋ"), "iong": ("j", "ʊ", "ŋ"),
    "ua": ("w", "a"), "uo": ("w", "o"), "uai": ("w", "ai"),
    "uei": ("w", "ei"), "uan": ("w", "a", "n"), "uen": ("w", "ə", "n"),
    "uang": ("w", "ɑ", "ŋ"), "ueng": ("w", "ə", "ŋ"),
    "ve": ("ɥ", "ɛ"), "van": ("ɥ", "ɛ", "n"), "vn": ("y", "n"),
}
_SYLLABIC = {"z": "ɹ̩", "c": "ɹ̩", "s": "ɹ̩",
             "zh": "ɻ̩", "ch": "ɻ̩", "sh": "ɻ̩", "r": "ɻ̩"}

# y/w spellings -> canonical final (v = ü)
_Y_W = {
    "yi": "i", "ya": "ia", "ye": "ie", "yao": "iao", "you": "iou",
    "yan": "ian", "yin": "in", "yang": "iang", "ying": "ing",
    "yong": "iong", "yu": "v", "yue": "ve", "yuan": "van", "yun": "vn",
    "wu": "u", "wa": "ua", "wo": "uo", "wai": "uai", "wei": "uei",
    "wan": "uan", "wen": "uen", "wang": "uang", "weng": "ueng",
}

_DIGIT_ZH = "零一二三四五六七八九"
_UNITS_ZH = [(100000000, "亿"), (10000, "万"), (1000, "千"), (100, "百"), (10, "十")]

_PINYIN_WORD_RE = re.compile(r"^([a-zü:]+[1-5])+$")
_PINYIN_SYL_RE = re.compile(r"[a-zü:]+[1-5]")


def _number_to_hanzi(num: int) -> str:
    if num == 0:
        return "零"
    if num >= 10 ** 12:
        return "".join(_DIGIT_ZH[int(d)] for d in str(num))
    out = []
    need_zero = False
    for base, unit in _UNITS_ZH:
        d, num = divmod(num, base)
        if d:
            if need_zero:
                out.append("零")
                need_zero = False
            if base == 10 and d == 1 and not out:
                out.append(unit)  # 十三 not 一十三
            else:
                out.append(_number_to_hanzi(d) if d >= 10 else _DIGIT_ZH[d])
                out.append(unit)
        elif out:
            need_zero = True
    if num:
        if need_zero:
            out.append("零")
        out.append(_DIGIT_ZH[num])
    return "".join(out)


def parse_pinyin(syl: str) -> tuple[str, str, int] | None:
    """'zhuang1' -> ('zh', 'uang', 1). Returns None if unparseable."""
    syl = syl.replace("ü", "v").replace("u:", "v").lower()
    m = re.match(r"^([a-zv]+)([1-5])?$", syl)
    if not m:
        return None
    body, tone = m.group(1), int(m.group(2) or 5)
    if body in _Y_W:
        return "", _Y_W[body], tone
    if body.startswith(("y", "w")) and body not in _Y_W:
        return None
    initial = ""
    for ini in _INITIALS:
        if body.startswith(ini):
            initial = ini
            break
    final = body[len(initial):]
    # spelling normalizations
    if final == "iu":
        final = "iou"
    elif final == "ui":
        final = "uei"
    elif final == "un" and initial not in ("j", "q", "x"):
        final = "uen"
    if initial in ("j", "q", "x"):
        final = {"u": "v", "ue": "ve", "uan": "van", "un": "vn"}.get(final, final)
    if final == "" and initial in _SYLLABIC:
        final = "i"
    if final not in _FINAL_IPA and final != "i":
        return None
    return initial, final, tone


def pinyin_to_ipa(syl: str) -> list[str] | None:
    """One tone-digit pinyin syllable -> IPA phone list (tone as last token)."""
    erhua = False
    parsed = parse_pinyin(syl)
    if parsed is None and syl[:-1].endswith("r") and len(syl) > 2:
        parsed = parse_pinyin(syl[:-2].rstrip("r") + syl[-1])
        erhua = parsed is not None
    if parsed is None:
        return None
    initial, final, tone = parsed
    phones = []
    if _INITIAL_IPA[initial]:
        phones.append(_INITIAL_IPA[initial])
    if final == "i" and initial in _SYLLABIC:
        phones.append(_SYLLABIC[initial])
    else:
        phones.extend(_FINAL_IPA[final])
    if erhua:
        phones.append("ɚ")
    phones.append(str(tone))
    return phones


def _char_pinyin(word: str, char_lexicon: dict | None,
                 word_lexicon: dict | None, prev_word: str = "",
                 next_word: str = "", poly_model=None) -> list[str] | None:
    """Pinyin syllables for one jieba word via lexicons; None if any char OOV.

    Lookup order: whole-word lexicon hit → greedy longest sub-word match
    against the polyphone lexicon (catches compounds jieba keeps joined,
    e.g. 中国银行) → caller char lexicon (user override) → context rules
    (`polyphone.disambiguate`, the layer the reference fills with a BERT
    classifier) → per-char defaults."""
    from amphion_tpu.text.multilingual.polyphone import disambiguate

    for lex in (word_lexicon, WORD_PINYIN):
        if lex and word in lex:
            return lex[word].split()
    syls: list[str] = []
    i = 0
    n = len(word)
    while i < n:
        hit = None
        for j in range(min(n, i + 4), i + 1, -1):  # longest match first
            sub = word[i:j]
            for lex in (word_lexicon, WORD_PINYIN):
                if lex and sub in lex:
                    hit = lex[sub].split()
                    break
            if hit:
                break
        if hit:
            syls.extend(hit)
            i = j
            continue
        # caller-supplied char lexicon FIRST (user override wins), then
        # the context rules, then (optionally) the trained context
        # classifier for out-of-lexicon polyphones, then defaults.
        py = ((char_lexicon or {}).get(word[i])
              or disambiguate(word[i], word, i, prev_word, next_word)
              or _model_reading(poly_model, word, i, prev_word, next_word)
              or CHAR_PINYIN.get(word[i]))
        if py is None:
            return None
        syls.append(py.split()[0])
        i += 1
    return syls


def _model_reading(poly_model, word: str, i: int, prev_word: str,
                   next_word: str) -> str | None:
    """Optional trained classifier layer (`polyphone_model`): consulted
    only for inventory polyphones the lexicon/rules did not resolve —
    the role the reference fills with its ONNX BERT
    (chinese_model_g2p.py). poly_model = (module, params)."""
    if poly_model is None:
        return None
    from amphion_tpu.text.multilingual.polyphone_inventory import INVENTORY

    ch = word[i]
    if ch not in INVENTORY or len(INVENTORY[ch]) < 2:
        return None
    from amphion_tpu.text.multilingual.polyphone_model import (
        predict_reading,
    )

    sent = prev_word + word + next_word
    return predict_reading(
        poly_model[0], poly_model[1], sent, len(prev_word) + i,
        word_span=(len(prev_word), len(prev_word) + len(word)))


def _tone_sandhi(words: list[list[str]]) -> list[list[str]]:
    """3-3 -> 2-3 within words and across adjacent words; 不/一 rules."""
    flat = [(wi, si) for wi, w in enumerate(words) for si in range(len(w))]
    for k in range(len(flat) - 1):
        (wi, si), (wj, sj) = flat[k], flat[k + 1]
        cur, nxt = words[wi][si], words[wj][sj]
        if cur[-1] == "3" and nxt[-1] == "3":
            words[wi][si] = cur[:-1] + "2"
        if cur[:-1] == "bu" and nxt[-1] == "4":
            words[wi][si] = "bu2"
        if cur[:-1] == "yi":
            words[wi][si] = "yi2" if nxt[-1] == "4" else (
                "yi4" if nxt[-1] in "123" else cur)
    return words


def chinese_to_pinyin(text: str, char_lexicon: dict | None = None,
                      word_lexicon: dict | None = None,
                      poly_model=None) -> list[list[str]]:
    """hanzi (or tone-digit pinyin) -> per-word pinyin syllables
    (lexical readings, PRE tone-sandhi — the polyphone-accuracy surface;
    `chinese_to_ipa` applies sandhi + IPA on top).

    ``poly_model``: optional (module, params) from
    `polyphone_model.train_classifier` — consulted for inventory
    polyphones between the context rules and the char defaults."""
    import jieba

    # don't confuse pinyin tone digits (ni3) with numbers to verbalize
    text = re.sub(r"(?<![a-zA-Zü:])\d+",
                  lambda m: _number_to_hanzi(int(m.group(0))), text)
    raw_words: list[str] = []
    for chunk in re.split(r"\s+", text.strip()):
        if not chunk:
            continue
        if _PINYIN_WORD_RE.match(chunk.lower()):
            raw_words.append(chunk.lower())  # already pinyin
        else:
            raw_words.extend(w for w in jieba.cut(chunk) if w.strip())

    from amphion_tpu.text.multilingual.polyphone import disambiguate

    words_pinyin: list[list[str]] = []
    for wi, w in enumerate(raw_words):
        prev_w = raw_words[wi - 1] if wi > 0 else ""
        next_w = raw_words[wi + 1] if wi + 1 < len(raw_words) else ""
        if _PINYIN_WORD_RE.match(w):
            words_pinyin.append(_PINYIN_SYL_RE.findall(w))
            continue
        syls = _char_pinyin(w, char_lexicon, word_lexicon, prev_w, next_w,
                            poly_model)
        if syls is None:
            # per-char fallback: keep what we know, skip unknown hanzi
            syls = []
            for i, ch in enumerate(w):
                py = (disambiguate(ch, w, i, prev_w, next_w)
                      or (char_lexicon or {}).get(ch) or CHAR_PINYIN.get(ch))
                if py:
                    syls.append(py.split()[0])
        if syls:
            words_pinyin.append(syls)
    return words_pinyin


def chinese_to_ipa(text: str, char_lexicon: dict | None = None,
                   word_lexicon: dict | None = None) -> str:
    """hanzi (or tone-digit pinyin) -> '|'-joined IPA, '|_|' between words."""
    words_pinyin = chinese_to_pinyin(text, char_lexicon, word_lexicon)
    words_pinyin = _tone_sandhi(words_pinyin)
    out = []
    for syls in words_pinyin:
        phones: list[str] = []
        for s in syls:
            ipa = pinyin_to_ipa(s)
            if ipa:
                phones.extend(ipa)
        if phones:
            out.append("|".join(phones))
    return "|_|".join(out)
