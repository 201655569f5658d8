"""Integration tests: config-driven trainers over a synthetic corpus.

Exercises the full bins/ path (corpus adapter → feature extraction →
trainer construction → a couple of optimization steps → checkpoint) with
tiny model configs on the CPU mesh.
"""

import json
import types

import numpy as np
import pytest

from amphion_tpu.data.audio_io import save_wav
from amphion_tpu.utils.config import JsonHParams


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    raw = root / "LJSpeech-1.1"
    (raw / "wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    words = ["hello world", "good morning", "synthetic speech", "jax tpu",
             "alignment search", "tiny corpus"]
    for i in range(6):
        uid = f"LJ001-{i:04d}"
        t = np.arange(6000) / 8000
        x = 0.4 * np.sin(2 * np.pi * (150 + 40 * i) * t) * np.exp(-t * 0.5)
        save_wav(raw / "wavs" / f"{uid}.wav", x.astype(np.float32), 8000)
        rows.append(f"{uid}|{words[i]}|{words[i]}")
    (raw / "metadata.csv").write_text("\n".join(rows))

    from amphion_tpu.data.metadata import load_metadata
    from amphion_tpu.data.preprocessors import preprocess_dataset
    from amphion_tpu.data.processors.phone import extract_phone_sequences

    processed = root / "processed"
    train, test = preprocess_dataset("ljspeech", str(raw), str(processed))
    extract_phone_sequences(train + test, processed / "ljspeech", backend="char")
    return root, processed


def _base_cfg(root, processed, **extra):
    cfg = {
        "dataset": ["ljspeech"],
        "dataset_path": {"ljspeech": str(root / "LJSpeech-1.1")},
        "log_dir": str(root / "ckpts"),
        "preprocess": {
            "processed_dir": str(processed), "sample_rate": 8000, "n_mel": 16,
            "n_fft": 64, "win_size": 32, "hop_size": 8, "fmin": 0,
            "fmax": 4000, "f0_min": 50, "f0_max": 1100, "phone_dir": "phones",
            "symbols_dict": "symbols.dict",
        },
        "train": {
            "batch_size": 2, "max_steps": 2, "save_checkpoints_steps": 2,
            "log_interval": 1, "seed": 0,
            "adamw": {"lr": 1e-3, "adam_b1": 0.8, "adam_b2": 0.99},
            "exponential_lr": {"lr_decay": 0.999},
        },
    }
    for k, v in extra.items():
        cfg[k] = v
    return JsonHParams(**cfg)


def _args(name):
    return types.SimpleNamespace(exp_name=name, resume=False,
                                 resume_type="resume", log_level="info")


def test_valle_trainer_integration(corpus):
    root, processed = corpus
    # extract codes with a tiny random codec
    from bins.tts.preprocess import extract_codes
    from amphion_tpu.data.metadata import load_metadata
    from amphion_tpu.utils.logging import get_logger

    cfg = _base_cfg(
        root, processed,
        model={
            "codec": {"strides": [2, 4], "num_quantizers": 3,
                      "codebook_size": 16, "codebook_dim": 4,
                      "encoder_dim": 4, "latent_dim": 8, "decoder_dim": 4},
            "valle": {"audio_vocab": 16, "num_quantizers": 3, "hidden": 32,
                      "num_layers": 1, "num_heads": 4, "max_position": 1024},
        },
    )
    cfg.train["max_tokens"] = 1024
    cfg.train["min_bucket"] = 64
    utts = load_metadata(processed / "ljspeech" / "train.json")
    extract_codes(utts, processed / "ljspeech", cfg, "", get_logger("t"))

    from amphion_tpu.runtime.tts_trainer import VALLETrainer

    trainer = VALLETrainer(_args("valle_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2
    assert trainer.ckpt.latest() is not None


def test_maskgct_trainer_integration(corpus):
    root, processed = corpus
    from bins.tts.preprocess import extract_semantic
    from amphion_tpu.data.metadata import load_metadata
    from amphion_tpu.utils.logging import get_logger

    cfg = _base_cfg(
        root, processed,
        model={
            "semantic_codec": {"codebook_size": 16, "hidden": 8,
                               "codebook_dim": 4, "num_blocks": 1},
            "t2s": {"hidden": 32, "num_layers": 1, "num_heads": 4,
                    "codebook_size": 16},
            "s2a": {"hidden": 32, "num_layers": 1, "num_heads": 4,
                    "codebook_size": 16},
        },
    )
    cfg.train["max_tokens"] = 1024
    cfg.train["min_bucket"] = 64
    utts = load_metadata(processed / "ljspeech" / "train.json")
    # codes already extracted by the VALL-E test if it ran first; be
    # independent anyway
    from bins.tts.preprocess import extract_codes

    codec_cfg = JsonHParams(**{
        "preprocess": cfg.preprocess.to_dict(),
        "model": {"codec": {"strides": [2, 4], "num_quantizers": 3,
                            "codebook_size": 16, "codebook_dim": 4,
                            "encoder_dim": 4, "latent_dim": 8,
                            "decoder_dim": 4}},
    })
    extract_codes(utts, processed / "ljspeech", codec_cfg, "", get_logger("t"))
    extract_semantic(utts, processed / "ljspeech", cfg, "", get_logger("t"))

    from amphion_tpu.runtime.tts_trainer import MaskGCTTrainer

    trainer = MaskGCTTrainer(_args("maskgct_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2


def test_fs2_trainer_integration(corpus):
    root, processed = corpus
    from amphion_tpu.data.metadata import load_metadata

    # synthetic TextGrids: 3 equal phones over 0.75 s
    tg_dir = processed / "ljspeech" / "textgrids"
    tg_dir.mkdir(parents=True, exist_ok=True)
    utts = load_metadata(processed / "ljspeech" / "train.json")
    for u in utts:
        body = ['File type = "ooTextFile"', 'Object class = "TextGrid"',
                "xmin = 0", "xmax = 0.75", "tiers? <exists>", "size = 1",
                "item []:", "    item [1]:",
                '        class = "IntervalTier"', '        name = "phones"',
                "        xmin = 0", "        xmax = 0.75",
                "        intervals: size = 3"]
        for i, ph in enumerate(["AA1", "B", "sil"]):
            body += [f"        intervals [{i+1}]:",
                     f"            xmin = {i*0.25}",
                     f"            xmax = {(i+1)*0.25}",
                     f'            text = "{ph}"']
        (tg_dir / f"{u.uid}.TextGrid").write_text("\n".join(body))

    cfg = _base_cfg(
        root, processed,
        model={"fastspeech2": {"hidden": 16, "n_enc_layers": 1,
                               "n_dec_layers": 1, "n_heads": 2,
                               "ffn_hidden": 32, "kernel_size": 3}},
    )
    cfg.train["max_frames"] = 256

    from amphion_tpu.runtime.tts_trainer import FastSpeech2Trainer

    trainer = FastSpeech2Trainer(_args("fs2_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2
