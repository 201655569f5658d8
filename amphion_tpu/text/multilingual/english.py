"""English grapheme-to-IPA: normalization + lexicon + rule letter-to-sound.

Reference behavior (models/tts/maskgct/g2p/g2p/english.py): inflect-based
number expansion + abbreviation expansion, then espeak IPA. Offline we:

1. expand numbers/currency/ordinals natively (no ``inflect``),
2. expand the same abbreviation list,
3. per word: CMU-style lexicon lookup if the caller provides one
   (ARPAbet -> IPA mapping below), else an NRL-style context-sensitive
   letter-to-sound rule pass that emits IPA directly.

The rule set is a compact general-American system: it won't match espeak
on every word, but it is deterministic, dependency-free, and covers
regular orthography; ship a lexicon for production vocabularies.
"""

from __future__ import annotations

import re

_ABBREV = [(re.compile(r"\b%s\." % x[0], re.IGNORECASE), x[1]) for x in [
    ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"), ("st", "saint"),
    ("co", "company"), ("jr", "junior"), ("maj", "major"), ("gen", "general"),
    ("drs", "doctors"), ("rev", "reverend"), ("lt", "lieutenant"),
    ("hon", "honorable"), ("sgt", "sergeant"), ("capt", "captain"),
    ("esq", "esquire"), ("ltd", "limited"), ("col", "colonel"), ("ft", "fort"),
]]

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALE = [(10 ** 9, "billion"), (10 ** 6, "million"), (1000, "thousand"),
          (100, "hundred")]
_ORD_EXC = {"one": "first", "two": "second", "three": "third",
            "five": "fifth", "eight": "eighth", "nine": "ninth",
            "twelve": "twelfth"}


def number_to_words(num: int) -> str:
    if num < 0:
        return "minus " + number_to_words(-num)
    if num < 20:
        return _ONES[num]
    if num < 100:
        t, o = divmod(num, 10)
        return _TENS[t] + ("" if o == 0 else " " + _ONES[o])
    for base, name in _SCALE:
        if num >= base:
            high, low = divmod(num, base)
            s = number_to_words(high) + " " + name
            return s if low == 0 else s + " " + number_to_words(low)
    return _ONES[0]


def ordinal_to_words(num: int) -> str:
    words = number_to_words(num)
    head, _, last = words.rpartition(" ")
    if last in _ORD_EXC:
        last = _ORD_EXC[last]
    elif last.endswith("y"):
        last = last[:-1] + "ieth"
    else:
        last = last + "th"
    return (head + " " + last).strip()


def _expand_year(num: int) -> str:
    if 1000 < num < 3000 and num % 100 != 0 and num % 1000 >= 100:
        return number_to_words(num // 100) + " " + number_to_words(num % 100)
    return number_to_words(num)


def _expand_dollars(m: re.Match) -> str:
    parts = m.group(1).split(".")
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1][:2]) if len(parts) > 1 and parts[1] else 0
    out = []
    if dollars:
        out.append("%s dollar%s" % (number_to_words(dollars),
                                    "" if dollars == 1 else "s"))
    if cents:
        out.append("%s cent%s" % (number_to_words(cents),
                                  "" if cents == 1 else "s"))
    return " " + (", ".join(out) or "zero dollars") + " "


def normalize_english(text: str) -> str:
    for regex, repl in _ABBREV:
        text = regex.sub(repl, text)
    text = re.sub(r"([0-9][0-9,]+[0-9])", lambda m: m.group(1).replace(",", ""), text)
    text = re.sub(r"£([0-9.]*[0-9]+)", r"\1 pounds", text)
    text = re.sub(r"\$([0-9.]*[0-9]+)", _expand_dollars, text)
    text = re.sub(r"([0-9]+)\.([0-9]+)",
                  lambda m: "%s point %s" % (
                      number_to_words(int(m.group(1))),
                      " ".join(_ONES[int(d)] for d in m.group(2))), text)
    text = re.sub(r"([0-9]+)%",
                  lambda m: number_to_words(int(m.group(1))) + " percent", text)
    text = re.sub(r"([0-9]+)(st|nd|rd|th)",
                  lambda m: ordinal_to_words(int(m.group(1))), text)
    text = re.sub(r"[0-9]+", lambda m: " %s " % _expand_year(int(m.group(0))), text)
    return text


# ARPAbet -> IPA (for caller-supplied CMU-format lexicons)
ARPA_IPA = {
    "AA": "ɑ", "AE": "æ", "AH": "ʌ", "AH0": "ə", "AO": "ɔ", "AW": "aʊ",
    "AY": "aɪ", "B": "b", "CH": "tʃ", "D": "d", "DH": "ð", "EH": "ɛ",
    "ER": "ɝ", "EY": "eɪ", "F": "f", "G": "g", "HH": "h", "IH": "ɪ",
    "IY": "i", "JH": "dʒ", "K": "k", "L": "l", "M": "m", "N": "n",
    "NG": "ŋ", "OW": "oʊ", "OY": "ɔɪ", "P": "p", "R": "ɹ", "S": "s",
    "SH": "ʃ", "T": "t", "TH": "θ", "UH": "ʊ", "UW": "u", "V": "v",
    "W": "w", "Y": "j", "Z": "z", "ZH": "ʒ",
}


def arpa_to_ipa(phones: list[str]) -> list[str]:
    out = []
    for p in phones:
        base = p.rstrip("012")
        if p.endswith("0") and base == "AH":
            out.append(ARPA_IPA["AH0"])
        else:
            out.append(ARPA_IPA.get(base, ""))
    return [p for p in out if p]


# function words whose pronunciation the rules get wrong (irregular or
# voiced-th); checked before the rule pass
_FUNCTION_WORDS: dict[str, tuple[str, ...]] = {
    "the": ("ð", "ə"), "this": ("ð", "ɪ", "s"), "that": ("ð", "æ", "t"),
    "these": ("ð", "i", "z"), "those": ("ð", "oʊ", "z"),
    "they": ("ð", "eɪ"), "them": ("ð", "ɛ", "m"), "their": ("ð", "ɛ", "ɹ"),
    "there": ("ð", "ɛ", "ɹ"), "then": ("ð", "ɛ", "n"), "than": ("ð", "æ", "n"),
    "though": ("ð", "oʊ"), "thus": ("ð", "ʌ", "s"), "thou": ("ð", "aʊ"),
    "of": ("ʌ", "v"), "to": ("t", "u"), "do": ("d", "u"),
    "does": ("d", "ʌ", "z"), "done": ("d", "ʌ", "n"), "was": ("w", "ʌ", "z"),
    "is": ("ɪ", "z"), "as": ("æ", "z"), "has": ("h", "æ", "z"),
    "his": ("h", "ɪ", "z"), "says": ("s", "ɛ", "z"), "said": ("s", "ɛ", "d"),
    "what": ("w", "ʌ", "t"), "who": ("h", "u"), "whom": ("h", "u", "m"),
    "whose": ("h", "u", "z"), "where": ("w", "ɛ", "ɹ"),
    "were": ("w", "ɝ"), "are": ("ɑ", "ɹ"), "have": ("h", "æ", "v"),
    "gives": ("g", "ɪ", "v", "z"), "give": ("g", "ɪ", "v"),
    "live": ("l", "ɪ", "v"), "love": ("l", "ʌ", "v"),
    "some": ("s", "ʌ", "m"), "come": ("k", "ʌ", "m"),
    "once": ("w", "ʌ", "n", "s"), "two": ("t", "u"),
    "would": ("w", "ʊ", "d"), "could": ("k", "ʊ", "d"),
    "should": ("ʃ", "ʊ", "d"), "you": ("j", "u"), "your": ("j", "ɔ", "ɹ"),
    "very": ("v", "ɛ", "ɹ", "i"), "many": ("m", "ɛ", "n", "i"),
    "any": ("ɛ", "n", "i"), "only": ("oʊ", "n", "l", "i"),
    "people": ("p", "i", "p", "ə", "l"), "again": ("ə", "g", "ɛ", "n"),
    "against": ("ə", "g", "ɛ", "n", "s", "t"), "been": ("b", "ɪ", "n"),
    "both": ("b", "oʊ", "θ"), "gone": ("g", "ɔ", "n"),
    "one": ("w", "ʌ", "n"), "none": ("n", "ʌ", "n"),
    "woman": ("w", "ʊ", "m", "ə", "n"), "women": ("w", "ɪ", "m", "ə", "n"),
    "water": ("w", "ɔ", "t", "ɝ"), "other": ("ʌ", "ð", "ɝ"),
    "mother": ("m", "ʌ", "ð", "ɝ"), "father": ("f", "ɑ", "ð", "ɝ"),
    "brother": ("b", "ɹ", "ʌ", "ð", "ɝ"), "weather": ("w", "ɛ", "ð", "ɝ"),
    "whether": ("w", "ɛ", "ð", "ɝ"), "rather": ("ɹ", "æ", "ð", "ɝ"),
    "either": ("i", "ð", "ɝ"), "neither": ("n", "i", "ð", "ɝ"),
    "with": ("w", "ɪ", "ð"), "without": ("w", "ɪ", "ð", "aʊ", "t"),
    "within": ("w", "ɪ", "ð", "ɪ", "n"), "into": ("ɪ", "n", "t", "u"),
    "onto": ("ɑ", "n", "t", "u"), "says": ("s", "ɛ", "z"),
    "great": ("g", "ɹ", "eɪ", "t"), "heart": ("h", "ɑ", "ɹ", "t"),
    "pretty": ("p", "ɹ", "ɪ", "t", "i"), "busy": ("b", "ɪ", "z", "i"),
    "friend": ("f", "ɹ", "ɛ", "n", "d"), "sure": ("ʃ", "ʊ", "ɹ"),
    "eye": ("aɪ",), "eyes": ("aɪ", "z"), "island": ("aɪ", "l", "ə", "n", "d"),
    "hour": ("aʊ", "ɹ"), "honest": ("ɑ", "n", "ə", "s", "t"),
    "iron": ("aɪ", "ɝ", "n"), "answer": ("æ", "n", "s", "ɝ"),
    "often": ("ɔ", "f", "ə", "n"), "listen": ("l", "ɪ", "s", "ə", "n"),
    "beautiful": ("b", "j", "u", "t", "ə", "f", "ə", "l"),
    "world": ("w", "ɝ", "l", "d"), "word": ("w", "ɝ", "d"),
    "work": ("w", "ɝ", "k"), "worth": ("w", "ɝ", "θ"),
}

# NRL-style LTS rules: (left-context, grapheme, right-context) -> IPA phones.
# Contexts: '#'=word edge, 'V'=a vowel letter, 'C'=a consonant letter,
# ''=any. Longest grapheme match first at each position, then rule order.
_V = set("aeiouy")


def _ctx_match(word: str, pos: int, end: int, left: str, right: str) -> bool:
    def ok(spec: str, idx: int, direction: int) -> bool:
        for s in (spec if direction > 0 else spec[::-1]):
            if s == "#":
                if direction > 0:
                    return idx >= len(word)
                return idx < 0
            if idx < 0 or idx >= len(word):
                return False
            ch = word[idx]
            if s == "V" and ch not in _V:
                return False
            if s == "C" and (ch in _V or not ch.isalpha()):
                return False
            if s not in "VC#" and ch != s:
                return False
            idx += direction
        return True

    return ok(left, pos - 1, -1) and ok(right, end, 1)


# fmt: off
_RULES: list[tuple[str, str, str, tuple[str, ...]]] = [
    # (left, grapheme, right, phones)
    ("", "tion", "", ("ʃ", "ə", "n")), ("", "sion", "", ("ʒ", "ə", "n")),
    ("", "ture", "#", ("tʃ", "ɝ")), ("", "tious", "", ("ʃ", "ə", "s")),
    ("", "cious", "", ("ʃ", "ə", "s")), ("", "ough", "#", ("oʊ",)),
    ("#", "one", "#", ("w", "ʌ", "n")), ("", "augh", "", ("ɔ",)),
    ("", "igh", "", ("aɪ",)), ("", "eigh", "", ("eɪ",)),
    ("#", "wh", "", ("w",)), ("", "qu", "", ("k", "w")),
    ("", "ph", "", ("f",)), ("", "gh", "#", ("f",)), ("", "gh", "", ()),
    ("", "sch", "", ("s", "k")), ("", "ch", "", ("tʃ",)),
    ("", "sh", "", ("ʃ",)), ("#", "th", "e#", ("ð",)),
    ("#", "th", "", ("θ",)), ("V", "th", "V", ("ð",)), ("", "th", "", ("θ",)),
    ("", "ck", "", ("k",)), ("", "ng", "#", ("ŋ",)), ("", "ng", "", ("ŋ", "g")),
    ("#", "kn", "", ("n",)), ("#", "gn", "", ("n",)), ("#", "wr", "", ("ɹ",)),
    ("#", "ps", "", ("s",)), ("", "mb", "#", ("m",)), ("", "dge", "", ("dʒ",)),
    ("", "tch", "", ("tʃ",)),
    # vowel digraphs
    ("", "eau", "", ("oʊ",)), ("", "ee", "", ("i",)),
    ("", "ea", "", ("i",)), ("", "ai", "", ("eɪ",)), ("", "ay", "", ("eɪ",)),
    ("", "oa", "", ("oʊ",)), ("", "oo", "k", ("ʊ",)), ("", "oo", "", ("u",)),
    ("", "ou", "s#", ("ə",)), ("", "ou", "", ("aʊ",)), ("", "ow", "#", ("oʊ",)),
    ("", "ow", "", ("aʊ",)), ("", "oy", "", ("ɔɪ",)), ("", "oi", "", ("ɔɪ",)),
    ("", "au", "", ("ɔ",)), ("", "aw", "", ("ɔ",)), ("", "ew", "", ("u",)),
    ("", "ey", "#", ("i",)), ("", "ie", "#", ("aɪ",)), ("", "ie", "", ("i",)),
    ("", "ei", "", ("eɪ",)), ("", "ue", "", ("u",)), ("", "ui", "", ("u",)),
    # r-colored vowels
    ("", "ar", "", ("ɑ", "ɹ")), ("", "er", "#", ("ɝ",)), ("", "er", "", ("ɝ",)),
    ("", "ir", "", ("ɝ",)), ("", "ur", "", ("ɝ",)), ("", "or", "", ("ɔ", "ɹ")),
    # magic-e long vowels (and long vowel before -tion)
    ("", "a", "tion", ("eɪ",)),
    ("", "a", "Ce#", ("eɪ",)), ("", "i", "Ce#", ("aɪ",)),
    ("", "o", "Ce#", ("oʊ",)), ("", "u", "Ce#", ("u",)),
    ("", "e", "Ce#", ("i",)),
    # single vowels
    ("", "a", "ll", ("ɔ",)), ("#", "a", "#", ("ə",)), ("", "a", "", ("æ",)),
    ("", "e", "#", ()), ("", "e", "d#", ()), ("", "e", "", ("ɛ",)),
    ("", "i", "nd#", ("aɪ",)), ("", "i", "", ("ɪ",)),
    ("", "o", "#", ("oʊ",)), ("", "o", "", ("ɑ",)),
    ("", "u", "", ("ʌ",)),
    ("C", "y", "#", ("i",)), ("#", "y", "", ("j",)), ("", "y", "", ("ɪ",)),
    # consonants
    ("", "c", "e", ("s",)), ("", "c", "i", ("s",)), ("", "c", "y", ("s",)),
    ("", "c", "", ("k",)),
    ("", "g", "e#", ("dʒ",)), ("", "g", "i", ("dʒ",)), ("", "g", "y", ("dʒ",)),
    ("", "g", "", ("g",)),
    ("V", "s", "#", ("z",)), ("V", "s", "V", ("z",)), ("", "s", "", ("s",)),
    ("", "x", "", ("k", "s")), ("", "j", "", ("dʒ",)),
    ("", "b", "", ("b",)), ("", "d", "", ("d",)), ("", "f", "", ("f",)),
    ("", "h", "", ("h",)), ("", "k", "", ("k",)), ("", "l", "", ("l",)),
    ("", "m", "", ("m",)), ("", "n", "", ("n",)), ("", "p", "", ("p",)),
    ("", "r", "", ("ɹ",)), ("", "t", "", ("t",)), ("", "v", "", ("v",)),
    ("", "w", "", ("w",)), ("", "z", "", ("z",)), ("", "'", "", ()),
]
# fmt: on
_MAXLEN = max(len(r[1]) for r in _RULES)


def _collapse_geminates(phones: list[str]) -> list[str]:
    out: list[str] = []
    for p in phones:
        if out and out[-1] == p and p[0] not in "aeiouɑæʌɔɛɪʊəɝː":
            continue
        out.append(p)
    return out


def word_to_ipa_rules(word: str) -> list[str]:
    """Rule-based LTS for one lowercase word -> IPA phone list."""
    word = word.lower()
    if word in _FUNCTION_WORDS:
        return list(_FUNCTION_WORDS[word])
    phones: list[str] = []
    i = 0
    while i < len(word):
        matched = False
        for ln in range(min(_MAXLEN, len(word) - i), 0, -1):
            g = word[i:i + ln]
            for left, graph, right, out in _RULES:
                if graph != g:
                    continue
                if _ctx_match(word, i, i + ln, left, right):
                    phones.extend(out)
                    i += ln
                    matched = True
                    break
            if matched:
                break
        if not matched:
            i += 1  # skip unknown char
    return _collapse_geminates(phones)


def english_to_ipa(text: str, lexicon: dict[str, list[str]] | None = None) -> str:
    """text -> '|'-joined IPA with '|_|' word separators.

    ``lexicon`` maps UPPERCASE words to ARPAbet phone lists (CMU format).
    """
    text = normalize_english(text)
    words = re.findall(r"[A-Za-z']+|[,.!?;:…]", text)
    out = []
    for w in words:
        if not w[0].isalpha():
            out.append(w)
            continue
        if lexicon and w.upper() in lexicon:
            phones = arpa_to_ipa(lexicon[w.upper()])
        else:
            phones = word_to_ipa_rules(w)
        if phones:
            out.append("|".join(phones))
    return "|_|".join(out)
