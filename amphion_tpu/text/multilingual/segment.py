"""Unicode-script language segmentation.

TPU-native replacement for the reference's ``LangSegment`` dependency
(ref: models/tts/maskgct/g2p/g2p/__init__.py:44-50 segments mixed-language
text before per-language cleaning). We segment by Unicode script ranges:
Han -> zh, Hiragana/Katakana -> ja, Hangul -> ko, Latin -> the declared
default Latin language (en unless the caller says fr/de). Digits and
punctuation attach to the current run so numbers are normalized by the
surrounding language's rules.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Segment:
    text: str
    lang: str


def _script_of(ch: str) -> str | None:
    cp = ord(ch)
    # CJK unified ideographs + extensions + compatibility
    if (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0xF900 <= cp <= 0xFAFF
    ):
        return "zh"
    # Hiragana / Katakana (incl. halfwidth katakana, prolonged sound mark)
    if 0x3040 <= cp <= 0x30FF or 0x31F0 <= cp <= 0x31FF or 0xFF66 <= cp <= 0xFF9D:
        return "ja"
    # Hangul syllables + jamo
    if 0xAC00 <= cp <= 0xD7A3 or 0x1100 <= cp <= 0x11FF or 0x3130 <= cp <= 0x318F:
        return "ko"
    if ch.isascii() and (ch.isalpha() or ch == "'"):
        return "latin"
    # Latin-1 / Latin Extended letters (French/German accents)
    if 0x00C0 <= cp <= 0x024F:
        return "latin"
    return None  # neutral: digit, space, punctuation


def segment_text(text: str, latin_lang: str = "en") -> list[Segment]:
    """Split ``text`` into maximal single-language runs.

    Neutral characters (digits, spaces, punctuation) are appended to the
    run in progress; a leading neutral prefix joins the first run.
    """
    segs: list[Segment] = []
    cur_lang: str | None = None
    cur: list[str] = []
    pending: list[str] = []  # neutral chars before any language is known

    for ch in text:
        script = _script_of(ch)
        if script is None:
            (cur if cur_lang is not None else pending).append(ch)
            continue
        lang = latin_lang if script == "latin" else script
        if lang == cur_lang:
            cur.append(ch)
        else:
            if cur_lang is not None and cur:
                segs.append(Segment("".join(cur), cur_lang))
            cur = pending + [ch]
            pending = []
            cur_lang = lang
    if cur_lang is not None and (cur or pending):
        segs.append(Segment("".join(cur + pending), cur_lang))
    elif pending:
        segs.append(Segment("".join(pending), latin_lang))
    return [s for s in segs if s.text.strip()]
