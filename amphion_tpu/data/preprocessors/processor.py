"""Corpus adapters: normalize raw corpora into {train,test}.json metadata.

Same contract as the reference's preprocessor dispatch (reference:
`preprocessors/processor.py:36-70` + one module per corpus): each adapter
walks a raw corpus layout and emits unified utterance records
(`amphion_tpu/data/metadata.py`). Adapters are registered by dataset name;
`audiofolder` handles any flat/nested folder of wavs with optional
transcript sidecars, which covers ad-hoc corpora the reference lacks.
"""

from __future__ import annotations

import json
import random
from pathlib import Path
from typing import Callable

from amphion_tpu.data.audio_io import load_wav
from amphion_tpu.data.metadata import Utterance, save_metadata

SUPPORTED_DATASETS: dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        SUPPORTED_DATASETS[name] = fn
        return fn

    return deco


def _duration(path: Path) -> float:
    try:
        x, sr = load_wav(path)
        return len(x) / sr
    except Exception:
        return 0.0


def _walk_wavs(root: Path, exts=(".wav", ".flac")) -> list[Path]:
    out = []
    for ext in exts:
        out.extend(root.rglob(f"*{ext}"))
    return sorted(p for p in out if p.is_file())


def _finalize(name: str, utts: list[Utterance], output_dir: Path,
              test_fraction: float = 0.02, seed: int = 0):
    for i, u in enumerate(utts):
        u.index = i
    rng = random.Random(seed)
    idx = list(range(len(utts)))
    rng.shuffle(idx)
    n_test = max(1, int(len(utts) * test_fraction)) if utts else 0
    test_ids = set(idx[:n_test])
    train = [u for i, u in enumerate(utts) if i not in test_ids]
    test = [u for i, u in enumerate(utts) if i in test_ids]
    out = output_dir / name
    save_metadata(out / "train.json", train)
    save_metadata(out / "test.json", test)
    stats = {
        "dataset": name,
        "n_utterances": len(utts),
        "n_train": len(train),
        "n_test": len(test),
        "total_hours": sum(u.duration for u in utts) / 3600.0,
    }
    with open(out / "statistics.json", "w") as f:
        json.dump(stats, f, indent=2)
    return train, test


@register("ljspeech")
def ljspeech(input_dir: str, output_dir: str, **kw):
    """LJSpeech: metadata.csv with 'id|raw|normalized' rows, wavs/ dir."""
    root = Path(input_dir)
    utts = []
    with open(root / "metadata.csv", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) < 2:
                continue
            uid = parts[0]
            text = parts[2] if len(parts) > 2 and parts[2] else parts[1]
            wav = root / "wavs" / f"{uid}.wav"
            if wav.is_file():
                utts.append(
                    Utterance("ljspeech", uid, str(wav), _duration(wav),
                              speaker="LJSpeech", text=text, language="en")
                )
    return _finalize("ljspeech", utts, Path(output_dir), **kw)


@register("vctk")
def vctk(input_dir: str, output_dir: str, **kw):
    """VCTK: wav48*/pXXX/*.wav with txt/pXXX/*.txt transcripts."""
    root = Path(input_dir)
    wav_root = next(
        (root / d for d in ("wav48_silence_trimmed", "wav48", "wavs")
         if (root / d).is_dir()), root,
    )
    utts = []
    for wav in _walk_wavs(wav_root, (".wav", ".flac")):
        uid = wav.stem.replace("_mic1", "").replace("_mic2", "")
        spk = uid.split("_")[0]
        txt = root / "txt" / spk / f"{uid}.txt"
        text = txt.read_text().strip() if txt.is_file() else None
        utts.append(
            Utterance("vctk", uid, str(wav), _duration(wav), speaker=spk,
                      text=text, language="en")
        )
    return _finalize("vctk", utts, Path(output_dir), **kw)


@register("libritts")
def libritts(input_dir: str, output_dir: str, **kw):
    """LibriTTS: <split>/<spk>/<chapter>/<uid>.wav + .normalized.txt."""
    root = Path(input_dir)
    utts = []
    for wav in _walk_wavs(root):
        norm = wav.with_suffix(".normalized.txt")
        orig = wav.with_suffix(".original.txt")
        text = None
        for cand in (norm, orig):
            if cand.is_file():
                text = cand.read_text().strip()
                break
        spk = wav.stem.split("_")[0]
        utts.append(
            Utterance("libritts", wav.stem, str(wav), _duration(wav),
                      speaker=spk, text=text, language="en")
        )
    return _finalize("libritts", utts, Path(output_dir), **kw)


@register("librilight")
def librilight(input_dir: str, output_dir: str, **kw):
    """Libri-Light: untranscribed <spk>/<book>/*.flac."""
    root = Path(input_dir)
    utts = [
        Utterance("librilight", w.stem, str(w), _duration(w),
                  speaker=w.relative_to(root).parts[0]
                  if len(w.relative_to(root).parts) > 1 else "unknown",
                  language="en")
        for w in _walk_wavs(root)
    ]
    return _finalize("librilight", utts, Path(output_dir), **kw)


@register("hifitts")
def hifitts(input_dir: str, output_dir: str, **kw):
    """Hi-Fi TTS: per-speaker json manifests with audio_filepath/text."""
    root = Path(input_dir)
    utts = []
    for manifest in sorted(root.glob("*.json")):
        spk = manifest.stem.split("_")[0]
        with open(manifest) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                wav = root / rec.get("audio_filepath", "")
                if wav.is_file():
                    utts.append(
                        Utterance("hifitts", wav.stem, str(wav),
                                  rec.get("duration", _duration(wav)),
                                  speaker=spk,
                                  text=rec.get("text_normalized", rec.get("text")),
                                  language="en")
                    )
    return _finalize("hifitts", utts, Path(output_dir), **kw)


@register("opencpop")
def opencpop(input_dir: str, output_dir: str, **kw):
    """Opencpop: segments/transcriptions.txt 'uid|text|phones|...' + wavs."""
    root = Path(input_dir)
    trans = root / "segments" / "transcriptions.txt"
    if not trans.is_file():
        trans = root / "transcriptions.txt"
    utts = []
    with open(trans, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) < 2:
                continue
            uid = parts[0]
            wav = root / "segments" / "wavs" / f"{uid}.wav"
            if not wav.is_file():
                wav = root / "wavs" / f"{uid}.wav"
            if wav.is_file():
                utts.append(
                    Utterance("opencpop", uid, str(wav), _duration(wav),
                              singer="opencpop", text=parts[1], language="zh")
                )
    return _finalize("opencpop", utts, Path(output_dir), **kw)


@register("m4singer")
def m4singer(input_dir: str, output_dir: str, **kw):
    """M4Singer: meta.json with item_name/singer fields + per-song dirs."""
    root = Path(input_dir)
    meta = root / "meta.json"
    utts = []
    if meta.is_file():
        with open(meta, encoding="utf-8") as f:
            records = json.load(f)
        for rec in records:
            item = rec.get("item_name", "")
            singer = item.split("#")[0] if "#" in item else rec.get("singer", "unknown")
            wav = root / item / f"{rec.get('segment_id', 0)}.wav"
            if not wav.is_file():
                cands = list((root / item).glob("*.wav")) if (root / item).is_dir() else []
                wav = cands[0] if cands else None
            if wav and wav.is_file():
                utts.append(
                    Utterance("m4singer", item.replace("/", "_"), str(wav),
                              _duration(wav), singer=singer,
                              text=rec.get("txt"), language="zh")
                )
    else:
        for wav in _walk_wavs(root):
            singer = wav.parent.name.split("#")[0]
            utts.append(
                Utterance("m4singer", f"{wav.parent.name}_{wav.stem}".replace("/", "_"),
                          str(wav), _duration(wav), singer=singer, language="zh")
            )
    return _finalize("m4singer", utts, Path(output_dir), **kw)


def _singing_walker(name: str, language: str = "en", singer_from: str = "parent"):
    @register(name)
    def adapter(input_dir: str, output_dir: str, **kw):
        root = Path(input_dir)
        utts = []
        for wav in _walk_wavs(root):
            singer = (
                wav.parent.name if singer_from == "parent"
                else wav.relative_to(root).parts[0]
            )
            uid = "_".join(wav.relative_to(root).with_suffix("").parts)
            utts.append(
                Utterance(name, uid, str(wav), _duration(wav), singer=singer,
                          language=language)
            )
        return _finalize(name, utts, Path(output_dir), **kw)

    adapter.__name__ = name
    return adapter


# singing corpora whose layout is <singer-or-song>/.../*.wav
for _name, _lang in [
    ("opensinger", "zh"), ("popbutfy", "en"), ("popcs", "zh"), ("kising", "zh"),
    ("csd", "ko"), ("opera", "zh"), ("nus48e", "en"), ("svcc", "en"),
    ("pjs", "ja"), ("vocalist", "en"), ("lijian", "zh"), ("cdmusiceval", "zh"),
]:
    _singing_walker(_name, _lang)


@register("ljspeech_vocoder")
def ljspeech_vocoder(input_dir: str, output_dir: str, **kw):
    """LJSpeech for vocoder training: wavs only, no transcripts
    (ref preprocessors/ljspeech_vocoder.py)."""
    root = Path(input_dir)
    utts = [
        Utterance("ljspeech_vocoder", wav.stem, str(wav), _duration(wav),
                  speaker="LJSpeech", language="en")
        for wav in _walk_wavs(root / "wavs" if (root / "wavs").is_dir() else root)
    ]
    return _finalize("ljspeech_vocoder", utts, Path(output_dir), **kw)


@register("svcceval")
def svcceval(input_dir: str, output_dir: str, **kw):
    """SVCC evaluation split: same layout as svcc, all utterances go to
    test (ref preprocessors/svcceval.py keeps eval data unsplit)."""
    root = Path(input_dir)
    utts = [
        Utterance("svcceval", "_".join(w.relative_to(root).with_suffix("").parts),
                  str(w), _duration(w), singer=w.parent.name, language="en")
        for w in _walk_wavs(root)
    ]
    return _finalize("svcceval", utts, Path(output_dir), test_fraction=1.0)


@register("vctkfewsinger")
def vctkfewsinger(input_dir: str, output_dir: str, n_speakers: int = 16, **kw):
    """VCTK reduced to the N speakers with the most audio
    (ref preprocessors/vctkfewsinger.py chooses a few-singer subset)."""
    root = Path(input_dir)
    by_spk: dict[str, list[Path]] = {}
    for w in _walk_wavs(root):
        by_spk.setdefault(w.parent.name, []).append(w)
    chosen = sorted(by_spk, key=lambda s: -len(by_spk[s]))[:n_speakers]
    utts = [
        Utterance("vctkfewsinger",
                  "_".join(w.relative_to(root).with_suffix("").parts),
                  str(w), _duration(w), singer=spk, language="en")
        for spk in chosen for w in by_spk[spk]
    ]
    return _finalize("vctkfewsinger", utts, Path(output_dir), **kw)


@register("vctksample")
def vctksample(input_dir: str, output_dir: str, per_speaker: int = 8, **kw):
    """Small per-speaker sample of VCTK (ref preprocessors/vctksample.py)."""
    root = Path(input_dir)
    by_spk: dict[str, list[Path]] = {}
    for w in _walk_wavs(root):
        by_spk.setdefault(w.parent.name, []).append(w)
    utts = [
        Utterance("vctksample",
                  "_".join(w.relative_to(root).with_suffix("").parts),
                  str(w), _duration(w), speaker=spk, language="en")
        for spk, ws in sorted(by_spk.items()) for w in ws[:per_speaker]
    ]
    return _finalize("vctksample", utts, Path(output_dir), **kw)


@register("customsvcdataset")
def customsvcdataset(input_dir: str, output_dir: str,
                     dataset_name: str = "customsvcdataset", **kw):
    """User-supplied SVC corpus: <singer>/*.wav, singer from the directory
    (ref preprocessors/customsvcdataset.py)."""
    root = Path(input_dir)
    utts = [
        Utterance(dataset_name,
                  "_".join(w.relative_to(root).with_suffix("").parts),
                  str(w), _duration(w), singer=w.parent.name)
        for w in _walk_wavs(root)
    ]
    return _finalize(dataset_name, utts, Path(output_dir), **kw)


@register("coco")
def coco(input_dir: str, output_dir: str, **kw):
    """Coco singing corpus: <song>/<clip>.wav, held-out test songs by name
    (ref preprocessors/coco.py get_test_songs)."""
    root = Path(input_dir)
    utts = [
        Utterance("coco", "_".join(w.relative_to(root).with_suffix("").parts),
                  str(w), _duration(w), singer=w.parent.name, language="zh")
        for w in _walk_wavs(root)
    ]
    return _finalize("coco", utts, Path(output_dir), **kw)


@register("cocoeval")
def cocoeval(input_dir: str, output_dir: str, **kw):
    """Coco evaluation split: everything goes to test.json
    (ref preprocessors/cocoeval.py)."""
    root = Path(input_dir)
    utts = [
        Utterance("cocoeval",
                  "_".join(w.relative_to(root).with_suffix("").parts),
                  str(w), _duration(w), singer=w.parent.name, language="zh")
        for w in _walk_wavs(root)
    ]
    return _finalize("cocoeval", utts, Path(output_dir), test_fraction=1.0)


def merge_datasets(processed_dir: str, datasets: list[str],
                   output_name: str = "bigdata") -> tuple[list, list]:
    """Concatenate several processed datasets into one 'bigdata' metadata
    set with remapped indices (ref preprocessors/bigdata.py)."""
    from amphion_tpu.data.metadata import load_metadata

    root = Path(processed_dir)
    train_all, test_all = [], []
    for ds in datasets:
        train_all.extend(load_metadata(root / ds / "train.json"))
        test_all.extend(load_metadata(root / ds / "test.json"))
    for i, u in enumerate(train_all):
        u.index = i
    for i, u in enumerate(test_all):
        u.index = i
    out = root / output_name
    save_metadata(out / "train.json", train_all)
    save_metadata(out / "test.json", test_all)
    return train_all, test_all


@register("audiofolder")
def audiofolder(input_dir: str, output_dir: str, dataset_name: str = "audiofolder",
                **kw):
    """Generic adapter: any folder of wavs; optional sidecar .txt or .lab
    transcripts; speaker = parent directory name."""
    root = Path(input_dir)
    utts = []
    for wav in _walk_wavs(root):
        text = None
        for ext in (".txt", ".lab"):
            side = wav.with_suffix(ext)
            if side.is_file():
                text = side.read_text().strip()
                break
        uid = "_".join(wav.relative_to(root).with_suffix("").parts)
        utts.append(
            Utterance(dataset_name, uid, str(wav), _duration(wav),
                      speaker=wav.parent.name, text=text)
        )
    return _finalize(dataset_name, utts, Path(output_dir), **kw)


def preprocess_dataset(dataset: str, input_dir: str, output_dir: str, **kw):
    """Dispatch by dataset name (ref `processor.py:36`)."""
    if dataset not in SUPPORTED_DATASETS:
        raise ValueError(
            f"unsupported dataset {dataset!r}; supported: "
            f"{sorted(SUPPORTED_DATASETS)} (use 'audiofolder' for custom data)"
        )
    return SUPPORTED_DATASETS[dataset](input_dir, output_dir, **kw)
