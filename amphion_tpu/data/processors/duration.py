"""Phone-duration tooling: MFA corpus export + TextGrid alignment import.

Reference: `utils/mfa_prepare.py` (exports wav+lab layout for the Montreal
Forced Aligner) and `utils/duration.py` (reads MFA TextGrids into per-frame
durations for FastSpeech2, `egs/tts/FastSpeech2/prepare_mfa.sh`). The
TextGrid parser is native (no textgrid package).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

from amphion_tpu.data.metadata import Utterance


def prepare_mfa_corpus(utterances: list[Utterance], output_dir: str | Path,
                       sample_rate: int | None = None) -> Path:
    """Export <out>/<speaker>/<uid>.{wav,lab} for MFA (ref `mfa_prepare.py`)."""
    from amphion_tpu.data.audio_io import load_wav, save_wav

    out = Path(output_dir)
    for u in utterances:
        if not u.text:
            continue
        spk = u.speaker or u.singer or "spk"
        d = out / spk
        d.mkdir(parents=True, exist_ok=True)
        if sample_rate is not None:
            x, _ = load_wav(u.path, sr=sample_rate)
            save_wav(d / f"{u.uid}.wav", x, sample_rate)
        else:
            import shutil

            shutil.copy(u.path, d / f"{u.uid}.wav")
        (d / f"{u.uid}.lab").write_text(u.text.strip() + "\n")
    return out


def parse_textgrid(path: str | Path, tier_name: str = "phones") -> list[tuple[float, float, str]]:
    """Parse a (long-format) Praat TextGrid tier → [(xmin, xmax, label)]."""
    text = Path(path).read_text(encoding="utf-8", errors="replace")
    # find the requested tier block
    tiers = re.split(r'item\s*\[\d+\]:', text)
    target = None
    for block in tiers[1:]:
        m = re.search(r'name\s*=\s*"([^"]*)"', block)
        if m and m.group(1) == tier_name:
            target = block
            break
    if target is None:
        raise ValueError(f"tier {tier_name!r} not found in {path}")
    intervals = []
    for m in re.finditer(
        r'intervals\s*\[\d+\]:\s*xmin\s*=\s*([\d.eE+-]+)\s*xmax\s*=\s*'
        r'([\d.eE+-]+)\s*text\s*=\s*"([^"]*)"',
        target,
    ):
        intervals.append((float(m.group(1)), float(m.group(2)), m.group(3)))
    return intervals


def textgrid_to_durations(
    path: str | Path,
    hop_size: int,
    sample_rate: int,
    tier_name: str = "phones",
    silence_labels: tuple = ("", "sil", "sp", "spn"),
) -> tuple[list[str], np.ndarray]:
    """TextGrid → (phone list, integer frame durations) for FastSpeech2.

    Frame boundaries are rounded so durations sum exactly to the total
    frame count (largest-remainder on the final phone).
    """
    intervals = parse_textgrid(path, tier_name)
    fps = sample_rate / hop_size
    phones, durs = [], []
    for xmin, xmax, label in intervals:
        lab = label.strip()
        phones.append(lab if lab not in silence_labels else "sil")
        durs.append(int(round(xmax * fps)) - int(round(xmin * fps)))
    return phones, np.maximum(np.asarray(durs, np.int32), 0)
