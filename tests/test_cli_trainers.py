"""Integration tests: config-driven trainers over a synthetic corpus.

Exercises the full bins/ path (corpus adapter → feature extraction →
trainer construction → a couple of optimization steps → checkpoint) with
tiny model configs on the CPU mesh.
"""

import json
import types

import jax
import jax.numpy as jnp
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


def test_valle_zeroshot_inference_cli(corpus):
    """Train 1 step, then run the zero-shot inference path: prompt audio +
    prompt text + target text → wav (AR continuation + NAR + codec decode)."""
    root, processed = corpus
    from bins.tts.preprocess import extract_codes
    from amphion_tpu.data.metadata import load_metadata
    from amphion_tpu.utils.logging import get_logger

    cfg = _base_cfg(
        root, processed,
        model_type="VALLE",
        model={
            "codec": {"strides": [2, 4], "num_quantizers": 3,
                      "codebook_size": 16, "codebook_dim": 4,
                      "encoder_dim": 4, "latent_dim": 8, "decoder_dim": 4},
            "valle": {"audio_vocab": 16, "num_quantizers": 3, "hidden": 32,
                      "num_layers": 1, "num_heads": 4, "max_position": 1024},
        },
    )
    cfg.train["max_steps"] = 1
    cfg.train["save_checkpoints_steps"] = 1
    cfg.train["max_tokens"] = 1024
    cfg.train["min_bucket"] = 64
    utts = load_metadata(processed / "ljspeech" / "train.json")
    extract_codes(utts, processed / "ljspeech", cfg, "", get_logger("t"))

    from amphion_tpu.runtime.tts_trainer import VALLETrainer

    trainer = VALLETrainer(_args("valle_zs"), cfg)
    trainer.train_loop()

    from bins.tts.inference import valle_inference
    from amphion_tpu.data.audio_io import load_wav

    out = root / "valle_zs.wav"
    args = types.SimpleNamespace(
        exp_name="valle_zs", text="hello world", prompt_text="good morning",
        prompt_audio=str(root / "LJSpeech-1.1" / "wavs" / "LJ001-0000.wav"),
        codec_ckpt="", max_new=16, top_k=8, output_path=str(out),
    )
    valle_inference(args, cfg, get_logger("t"))
    wav, sr = load_wav(out)
    assert sr == 8000 and wav.size >= 8  # >= 1 token * hop


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


def _write_textgrids(processed, phones=("AA1", "B", "sil")):
    """Synthetic TextGrids: equal-duration phones over 0.75 s."""
    from amphion_tpu.data.metadata import load_metadata

    tg_dir = processed / "ljspeech" / "textgrids"
    tg_dir.mkdir(parents=True, exist_ok=True)
    utts = load_metadata(processed / "ljspeech" / "train.json")
    step = 0.75 / len(phones)
    for u in utts:
        body = ['File type = "ooTextFile"', 'Object class = "TextGrid"',
                "xmin = 0", "xmax = 0.75", "tiers? <exists>", "size = 1",
                "item []:", "    item [1]:",
                '        class = "IntervalTier"', '        name = "phones"',
                "        xmin = 0", "        xmax = 0.75",
                f"        intervals: size = {len(phones)}"]
        for i, ph in enumerate(phones):
            body += [f"        intervals [{i+1}]:",
                     f"            xmin = {i*step}",
                     f"            xmax = {(i+1)*step}",
                     f'            text = "{ph}"']
        (tg_dir / f"{u.uid}.TextGrid").write_text("\n".join(body))


def test_fs2_trainer_integration(corpus):
    root, processed = corpus
    _write_textgrids(processed)

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


def _run_tts_infer(monkeypatch, cfg, root, exp, text, name, extra=()):
    import sys

    cfg_path = root / f"{name}.json"
    cfg_path.write_text(json.dumps(cfg.to_dict()))
    out = root / f"{name}.wav"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--config", str(cfg_path), "--exp_name", exp,
        "--text", text, "--output_path", str(out), *extra,
    ])
    from bins.tts.inference import main as tts_main

    tts_main()
    from amphion_tpu.data.audio_io import load_wav

    wav, sr = load_wav(out)
    assert sr == 8000 and wav.size > 0 and np.isfinite(wav).all()


def test_fs2_inference_cli(corpus, monkeypatch):
    """FS2 two-stage inference CLI: char phones → mel → Griffin-Lim."""
    root, processed = corpus
    _write_textgrids(processed, phones=("a", "b", "sil"))
    from amphion_tpu.runtime.tts_trainer import FastSpeech2Trainer

    cfg = _base_cfg(
        root, processed,
        model_type="FastSpeech2",
        model={"fastspeech2": {"hidden": 16, "n_enc_layers": 1,
                               "n_dec_layers": 1, "n_heads": 2,
                               "ffn_hidden": 32, "kernel_size": 3}},
    )
    cfg.train["max_steps"] = 1
    cfg.train["save_checkpoints_steps"] = 1
    cfg.train["max_frames"] = 128
    FastSpeech2Trainer(_args("fs2_zs"), cfg).train_loop()
    _run_tts_infer(monkeypatch, cfg, root, "fs2_zs", "ab", "fs2")


def test_jets_inference_cli(corpus, monkeypatch):
    """JETS E2E text→wave inference CLI."""
    root, processed = corpus
    from amphion_tpu.runtime.tts_trainer import JetsTrainer

    cfg = _base_cfg(
        root, processed,
        model_type="Jets",
        model={"jets": {"hidden": 16, "n_enc_layers": 1, "n_dec_layers": 1,
                        "n_heads": 2, "ffn_hidden": 32},
               "decoder": {"resblock": "2", "upsample_rates": [4, 2],
                           "upsample_kernel_sizes": [8, 4],
                           "upsample_initial_channel": 16,
                           "resblock_kernel_sizes": [3],
                           "resblock_dilation_sizes": [[1, 3]]},
               "discriminator_channel_mult_factor": 0.25},
    )
    cfg.train["max_steps"] = 1
    cfg.train["save_checkpoints_steps"] = 1
    cfg.train["max_frames"] = 64
    cfg.train["max_phones"] = 16
    JetsTrainer(_args("jets_zs"), cfg).train_loop()
    _run_tts_infer(monkeypatch, cfg, root, "jets_zs", "hello", "jets")


def test_ns2_inference_cli(corpus, monkeypatch):
    """NS2 zero-shot inference CLI: prompt mel-latent + diffusion."""
    root, processed = corpus
    _write_textgrids(processed, phones=("a", "b", "sil"))
    from amphion_tpu.runtime.tts_trainer import NS2Trainer

    cfg = _base_cfg(
        root, processed,
        model_type="NaturalSpeech2",
        model={"ns2": {"hidden": 16, "n_layers": 1, "n_heads": 2,
                       "denoiser_layers": 2}},
    )
    cfg.train["max_steps"] = 1
    cfg.train["save_checkpoints_steps"] = 1
    cfg.train["max_frames"] = 128
    cfg.train["prompt_frames"] = 16
    NS2Trainer(_args("ns2_zs"), cfg).train_loop()
    prompt = str(root / "LJSpeech-1.1" / "wavs" / "LJ001-0001.wav")
    _run_tts_infer(monkeypatch, cfg, root, "ns2_zs", "ab", "ns2",
                   extra=("--prompt_audio", prompt, "--num_steps", "4"))


def test_maskgct_inference_cli(corpus, monkeypatch):
    """MaskGCT zero-shot CLI: prompt + text → T2S → S2A → codec decode."""
    root, processed = corpus
    from bins.tts.preprocess import extract_codes, extract_semantic
    from amphion_tpu.data.metadata import load_metadata
    from amphion_tpu.utils.logging import get_logger

    cfg = _base_cfg(
        root, processed,
        model_type="MaskGCT",
        model={
            "semantic_codec": {"codebook_size": 16, "hidden": 8,
                               "codebook_dim": 4, "num_blocks": 1},
            "codec": {"strides": [2, 4], "num_quantizers": 3,
                      "codebook_size": 16, "codebook_dim": 4,
                      "encoder_dim": 4, "latent_dim": 8, "decoder_dim": 4},
            "t2s": {"hidden": 32, "num_layers": 1, "num_heads": 4,
                    "codebook_size": 16},
            "s2a": {"hidden": 32, "num_layers": 1, "num_heads": 4,
                    "codebook_size": 16},
        },
    )
    cfg.train["max_steps"] = 1
    cfg.train["save_checkpoints_steps"] = 1
    cfg.train["max_tokens"] = 1024
    cfg.train["min_bucket"] = 64
    utts = load_metadata(processed / "ljspeech" / "train.json")
    extract_codes(utts, processed / "ljspeech", cfg, "", get_logger("t"))
    extract_semantic(utts, processed / "ljspeech", cfg, "", get_logger("t"))

    from amphion_tpu.runtime.tts_trainer import MaskGCTTrainer

    MaskGCTTrainer(_args("mg_zs"), cfg).train_loop()
    prompt = str(root / "LJSpeech-1.1" / "wavs" / "LJ001-0002.wav")
    _run_tts_infer(monkeypatch, cfg, root, "mg_zs", "hello", "mg",
                   extra=("--prompt_audio", prompt, "--prompt_text", "hi"))


def test_svc_trainer_integration(corpus):
    root, processed = corpus
    from bins.svc.train import DiffWaveNetSVCTrainer

    cfg = _base_cfg(root, processed, model={"cond_dim": 16, "hidden": 16,
                                            "num_layers": 2})
    cfg.train["segment_frames"] = 32
    trainer = DiffWaveNetSVCTrainer(_args("svc_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2


def test_comosvc_trainer_integration(corpus):
    root, processed = corpus
    from bins.svc.train import DiffComoSVCTrainer

    como = {"n_heads": 2, "n_layers": 1, "filter_channels": 16,
            "n_timesteps": 4, "distill": False}
    cfg = _base_cfg(root, processed, model={
        "cond_dim": 16, "hidden": 16, "num_layers": 2, "comosvc": dict(como)})
    cfg.train["segment_frames"] = 32
    tr = DiffComoSVCTrainer(_args("como_teacher"), cfg)
    tr.train_loop()
    assert tr.loop.step == 2

    como["distill"] = True
    cfg2 = _base_cfg(root, processed, model={
        "cond_dim": 16, "hidden": 16, "num_layers": 2, "comosvc": como})
    cfg2.train["segment_frames"] = 32
    tr2 = DiffComoSVCTrainer(_args("como_distill"), cfg2)
    tr2.train_loop()
    assert tr2.loop.step == 2


def test_vevo_inference_cli(corpus, monkeypatch):
    """Train AR + FM one step each, then run the zero-shot voice task
    through bins/vc/inference.py (content → AR → FM → Griffin-Lim)."""
    root, processed = corpus
    from bins.vc.train import (
        AutoregressiveTransformerTrainer,
        FlowMatchingTransformerTrainer,
    )

    model = {
        "ar": {"input_vocab": 8, "output_vocab": 16, "hidden": 32,
               "num_layers": 1, "num_heads": 4},
        "fm": {"token_vocab": 16, "hidden": 32, "num_layers": 1,
               "num_heads": 4},
        "content_tokenizer": {"hidden": 8, "codebook_dim": 4, "num_blocks": 1},
        "style_tokenizer": {"hidden": 8, "codebook_dim": 4, "num_blocks": 1},
    }
    cfg = _base_cfg(root, processed, model_type="AutoregressiveTransformer",
                    model=model)
    cfg.train["max_steps"] = 1
    cfg.train["save_checkpoints_steps"] = 1
    cfg.train["segment_frames"] = 32
    ar_args = _args("vevo_ar_zs")
    ar_args.content_ckpt = ""
    ar_args.style_ckpt = ""
    AutoregressiveTransformerTrainer(ar_args, cfg).train_loop()
    cfg.model_type = "FlowMatchingTransformer"
    fm_args = _args("vevo_fm_zs")
    fm_args.style_ckpt = ""
    FlowMatchingTransformerTrainer(fm_args, cfg).train_loop()

    import sys

    cfg_path = root / "vevo.json"
    cfg_path.write_text(json.dumps(cfg.to_dict()))
    out = root / "vevo.wav"
    wavs = root / "LJSpeech-1.1" / "wavs"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--config", str(cfg_path), "--task", "voice",
        "--src_audio", str(wavs / "LJ001-0000.wav"),
        "--timbre_ref", str(wavs / "LJ001-0001.wav"),
        "--output_path", str(out), "--ar_exp", "vevo_ar_zs",
        "--fm_exp", "vevo_fm_zs", "--max_new", "16",
        "--flow_matching_steps", "4",
    ])
    from bins.vc.inference import main as vc_main

    vc_main()
    from amphion_tpu.data.audio_io import load_wav

    wav, sr = load_wav(out)
    assert sr == 8000 and wav.size > 0 and np.isfinite(wav).all()

    # style task (accent conversion): style from --style_ref, timbre kept
    # from the source itself (ref infer_vevostyle.py:12-19)
    out2 = root / "vevo_style.wav"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--config", str(cfg_path), "--task", "style",
        "--src_audio", str(wavs / "LJ001-0000.wav"),
        "--style_ref", str(wavs / "LJ001-0001.wav"),
        "--output_path", str(out2), "--ar_exp", "vevo_ar_zs",
        "--fm_exp", "vevo_fm_zs", "--max_new", "16",
        "--flow_matching_steps", "4",
    ])
    vc_main()
    wav2, sr2 = load_wav(out2)
    assert sr2 == 8000 and wav2.size > 0 and np.isfinite(wav2).all()


def test_vevosing_inference_cli(corpus, monkeypatch):
    """Vevo1.5/VevoSing: train the style-stream AR + FM one step each,
    then run svc + fm tasks through bins/svc/vevosing_inference.py
    (content + chroma-FVQ prosody → AR → content-style → FM →
    Griffin-Lim)."""
    root, processed = corpus
    from bins.vc.train import (
        AutoregressiveTransformerTrainer,
        FlowMatchingTransformerTrainer,
    )

    model = {
        "ar": {"input_vocab": 8, "output_vocab": 16, "style_vocab": 6,
               "hidden": 32, "num_layers": 1, "num_heads": 4},
        "fm": {"token_vocab": 16, "hidden": 32, "num_layers": 1,
               "num_heads": 4},
        "content_tokenizer": {"hidden": 8, "codebook_dim": 4, "num_blocks": 1},
        "style_tokenizer": {"hidden": 8, "codebook_dim": 4, "num_blocks": 1},
        "prosody_tokenizer": {"hidden": 8, "codebook_dim": 4,
                              "num_blocks": 1, "downsample": 2},
    }
    cfg = _base_cfg(root, processed, model_type="AutoregressiveTransformer",
                    model=model)
    cfg.train["max_steps"] = 2
    cfg.train["save_checkpoints_steps"] = 2
    cfg.train["segment_frames"] = 32
    ar_args = _args("vevosing_ar")
    ar_args.content_ckpt = ""
    ar_args.style_ckpt = ""
    ar_args.prosody_ckpt = ""
    tr = AutoregressiveTransformerTrainer(ar_args, cfg)
    assert tr.prosody_encode is not None  # style stream wired
    tr.train_loop()
    cfg.model_type = "FlowMatchingTransformer"
    fm_args = _args("vevosing_fm")
    fm_args.style_ckpt = ""
    FlowMatchingTransformerTrainer(fm_args, cfg).train_loop()

    import sys

    cfg_path = root / "vevosing.json"
    cfg_path.write_text(json.dumps(cfg.to_dict()))
    wavs = root / "LJSpeech-1.1" / "wavs"
    from bins.svc.vevosing_inference import main as vevosing_main

    out = root / "vevosing_svc.wav"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--config", str(cfg_path), "--task", "svc",
        "--src_audio", str(wavs / "LJ001-0000.wav"),
        "--timbre_ref", str(wavs / "LJ001-0001.wav"),
        "--output_path", str(out), "--ar_exp", "vevosing_ar",
        "--fm_exp", "vevosing_fm", "--max_new", "16",
        "--flow_matching_steps", "4", "--match_pitch",
    ])
    vevosing_main()
    from amphion_tpu.data.audio_io import load_wav

    wav, sr = load_wav(out)
    assert sr == 8000 and wav.size > 0 and np.isfinite(wav).all()

    # fm-only timbre task with the shifted-source extraction flags
    out2 = root / "vevosing_fm.wav"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--config", str(cfg_path), "--task", "fm",
        "--src_audio", str(wavs / "LJ001-0000.wav"),
        "--timbre_ref", str(wavs / "LJ001-0001.wav"),
        "--output_path", str(out2), "--fm_exp", "vevosing_fm",
        "--flow_matching_steps", "4", "--match_pitch_prosody",
        "--match_pitch_contentstyle",
    ])
    vevosing_main()
    wav2, sr2 = load_wav(out2)
    assert sr2 == 8000 and wav2.size > 0 and np.isfinite(wav2).all()


def test_vits_svc_trainer_integration(corpus):
    root, processed = corpus
    from bins.svc.train import VitsSVCTrainer

    cfg = _base_cfg(
        root, processed,
        model={
            "vits_svc": {"inter_channels": 8, "hidden_channels": 8,
                         "filter_channels": 16, "n_heads": 2, "n_layers": 1,
                         "gin_channels": 8, "segment_size": 4},
            "decoder": {"resblock": "2", "upsample_rates": [4, 2],
                        "upsample_kernel_sizes": [8, 4],
                        "upsample_initial_channel": 16,
                        "resblock_kernel_sizes": [3],
                        "resblock_dilation_sizes": [[1, 3]]},
            "discriminator_channel_mult_factor": 0.25,
        },
    )
    cfg.train["segment_frames"] = 32
    trainer = VitsSVCTrainer(_args("vsvc_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2


def test_vevo_fm_trainer_integration(corpus):
    root, processed = corpus
    from bins.vc.train import FlowMatchingTransformerTrainer

    cfg = _base_cfg(
        root, processed,
        model={"fm": {"token_vocab": 16, "hidden": 32, "num_layers": 1,
                      "num_heads": 4},
               "style_tokenizer": {"hidden": 8, "codebook_dim": 4,
                                   "num_blocks": 1}},
    )
    cfg.train["segment_frames"] = 32
    trainer = FlowMatchingTransformerTrainer(_args("fm_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2


def test_metis_trainer_integration(corpus):
    """Metis fine-tune over the MaskGCT data contract (tts + vc tasks)."""
    root, processed = corpus
    from bins.tts.preprocess import extract_codes, extract_semantic
    from amphion_tpu.data.metadata import load_metadata
    from amphion_tpu.utils.logging import get_logger

    cfg = _base_cfg(
        root, processed,
        model_type="Metis",
        model={
            "semantic_codec": {"codebook_size": 16, "hidden": 8,
                               "codebook_dim": 4, "num_blocks": 1},
            "codec": {"strides": [2, 4], "num_quantizers": 3,
                      "codebook_size": 16, "codebook_dim": 4,
                      "encoder_dim": 4, "latent_dim": 8, "decoder_dim": 4},
            "t2s": {"hidden": 32, "num_layers": 1, "num_heads": 4,
                    "codebook_size": 16},
            "s2a": {"hidden": 32, "num_layers": 1, "num_heads": 4,
                    "codebook_size": 16},
            "metis": {"task": "tts"},
        },
    )
    cfg.train["max_steps"] = 1
    cfg.train["save_checkpoints_steps"] = 1
    cfg.train["max_tokens"] = 1024
    cfg.train["min_bucket"] = 64
    utts = load_metadata(processed / "ljspeech" / "train.json")
    extract_codes(utts, processed / "ljspeech", cfg, "", get_logger("t"))
    extract_semantic(utts, processed / "ljspeech", cfg, "", get_logger("t"))

    from amphion_tpu.runtime.tts_trainer import MetisTrainer

    trainer = MetisTrainer(_args("metis_tts"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 1

    # continuous-conditioned task (vc): same data, task-embedding prefix
    cfg.model["metis"]["task"] = "vc"
    trainer = MetisTrainer(_args("metis_vc"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 1

    # per-task inference CLI (ref metis_infer_vc.py): src audio → wav
    import sys

    cfg_path = root / "metis.json"
    cfg_path.write_text(json.dumps(cfg.to_dict()))
    out = root / "metis_vc.wav"
    wavs = root / "LJSpeech-1.1" / "wavs"
    import unittest.mock as mock

    with mock.patch.object(sys, "argv", [
        "prog", "--config", str(cfg_path), "--exp_name", "metis_vc",
        "--task", "vc", "--src_audio", str(wavs / "LJ001-0000.wav"),
        "--prompt_audio", str(wavs / "LJ001-0001.wav"),
        "--output_path", str(out), "--n_steps", "3",
        "--first_layer_steps", "2",
    ]):
        from bins.tts.metis_inference import main as metis_main

        metis_main()
    from amphion_tpu.data.audio_io import load_wav as _lw

    wav, sr = _lw(out)
    assert sr == 8000 and wav.size > 0 and np.isfinite(wav).all()


def test_dualcodec_trainer_integration(corpus):
    root, processed = corpus
    from bins.codec.train import DualCodecTrainer

    cfg = _base_cfg(
        root, processed,
        model_type="DualCodec",
        model={
            "codec": {"strides": [2, 4], "num_quantizers": 3,
                      "codebook_size": 16, "codebook_dim": 4,
                      "encoder_dim": 4, "latent_dim": 8, "decoder_dim": 4},
            "dualcodec": {"semantic_codebook_size": 32},
            "discriminators": ["mpd"],
            "discriminator_channel_mult_factor": 0.25,
        },
    )
    cfg.train["segment_frames"] = 32
    trainer = DualCodecTrainer(_args("dc_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2


def test_facodec_trainer_integration(corpus):
    root, processed = corpus
    from bins.codec.train import FACodecTrainer

    cfg = _base_cfg(
        root, processed,
        model_type="FAcodec",
        model={
            "codec": {"strides": [2, 4], "codebook_size": 16,
                      "codebook_dim": 4, "encoder_dim": 4, "latent_dim": 8,
                      "decoder_dim": 4},
            "facodec": {"prosody_layers": 1, "content_layers": 1,
                        "detail_layers": 1, "timbre_dim": 8},
            "discriminators": ["mpd"],
            "discriminator_channel_mult_factor": 0.25,
        },
    )
    cfg.train["segment_frames"] = 32
    trainer = FACodecTrainer(_args("fac_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2


def test_coco_trainer_integration(corpus):
    root, processed = corpus
    from bins.codec.train import CocoTrainer

    cfg = _base_cfg(
        root, processed,
        model_type="RepCoco",
        model={"coco": {"mode": "contentstyle", "hidden": 16,
                        "codebook_size": 32, "codebook_dim": 4,
                        "downsample": 4, "num_blocks": 1}},
    )
    cfg.train["segment_frames"] = 32
    trainer = CocoTrainer(_args("coco_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2


def test_gan_vocoder_trainer_integration(corpus):
    root, processed = corpus
    from amphion_tpu.runtime.vocoder_trainer import GANVocoderTrainer

    cfg = _base_cfg(
        root, processed,
        model_type="GANVocoder",
        model={"generator": "hifigan",
               "hifigan": {"resblock": "2", "upsample_rates": [4, 2],
                           "upsample_kernel_sizes": [8, 4],
                           "upsample_initial_channel": 16,
                           "resblock_kernel_sizes": [3],
                           "resblock_dilation_sizes": [[1, 3]]},
               "discriminators": ["mpd"],
               "discriminator_channel_mult_factor": 0.25},
    )
    cfg.preprocess["hop_size"] = 8
    cfg.train["segment_frames"] = 16
    trainer = GANVocoderTrainer(_args("gan_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2


def test_nsf_hifigan_trainer_integration(corpus):
    """F0-conditioned GAN vocoder: on-device YIN feeds the sine excitation."""
    root, processed = corpus
    from amphion_tpu.runtime.vocoder_trainer import GANVocoderTrainer

    cfg = _base_cfg(
        root, processed,
        model_type="GANVocoder",
        model={"generator": "nsf_hifigan",
               "nsf_hifigan": {
                   "num_harmonics": 3,
                   "base": {"resblock": "2", "upsample_rates": [4, 2],
                            "upsample_kernel_sizes": [8, 4],
                            "upsample_initial_channel": 16,
                            "resblock_kernel_sizes": [3],
                            "resblock_dilation_sizes": [[1, 3]]}},
               "discriminators": ["mpd"],
               "discriminator_channel_mult_factor": 0.25},
    )
    cfg.preprocess["hop_size"] = 8
    cfg.train["segment_frames"] = 16
    trainer = GANVocoderTrainer(_args("nsf_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2


def test_diffusion_vocoder_trainer_integration(corpus):
    root, processed = corpus
    from amphion_tpu.runtime.vocoder_trainer import DiffusionVocoderTrainer

    cfg = _base_cfg(
        root, processed,
        model_type="DiffusionVocoder",
        model={"diffwave": {"residual_channels": 8, "num_layers": 2,
                            "dilation_cycle": 2, "num_train_steps": 8}},
    )
    cfg.preprocess["hop_size"] = 8
    cfg.train["segment_frames"] = 16
    trainer = DiffusionVocoderTrainer(_args("dw_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2

    # sampling path: mel → waveform
    from amphion_tpu.models.vocoders.diffwave import diffwave_sample

    mel = jnp.zeros((1, 8, 16))
    wav = diffwave_sample(trainer.model, trainer.loop.states.params, mel,
                          jax.random.key(0))
    assert wav.shape == (1, 64) and bool(jnp.isfinite(wav).all())


def test_audioldm_trainer_and_inference_cli(corpus, monkeypatch):
    """Stage-1 VAE (1 step) → stage-2 AudioLDM (1 step) → text-to-audio
    inference CLI (DDIM + CFG + VAE decode + Griffin-Lim)."""
    root, processed = corpus
    from bins.tta.train_tta import AudioLDMTrainer, AutoencoderKLTrainer

    model = {
        "autoencoderkl": {"base_channels": 4, "channel_mults": [1, 2],
                          "latent_channels": 2},
        "audioldm": {"base_channels": 8, "channel_mults": [1, 2],
                     "attn_levels": [1], "num_heads": 2, "text_dim": 16,
                     "text_backend": "hash"},
    }
    cfg = _base_cfg(root, processed, model_type="AutoencoderKL", model=model)
    cfg.train["max_steps"] = 1
    cfg.train["save_checkpoints_steps"] = 1
    cfg.train["segment_frames"] = 32
    AutoencoderKLTrainer(_args("vae_zs"), cfg).train_loop()
    vae_ckpt = str(root / "ckpts" / "vae_zs" / "checkpoint")

    cfg2 = _base_cfg(root, processed, model_type="AudioLDM", model=model)
    cfg2.train["max_steps"] = 1
    cfg2.train["save_checkpoints_steps"] = 1
    cfg2.train["segment_frames"] = 32
    cfg2.train["vae_ckpt"] = vae_ckpt
    trainer = AudioLDMTrainer(_args("ldm_zs"), cfg2)
    trainer.train_loop()
    assert trainer.loop.step == 1

    import sys

    cfg_path = root / "tta.json"
    cfg_path.write_text(json.dumps(cfg2.to_dict()))
    out = root / "tta.wav"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--config", str(cfg_path), "--exp_name", "ldm_zs",
        "--text", "a dog barking", "--output_path", str(out),
        "--num_steps", "4", "--duration_frames", "32",
    ])
    from bins.tta.inference import main as tta_main

    tta_main()
    from amphion_tpu.data.audio_io import load_wav

    wav, sr = load_wav(out)
    assert sr == 8000 and wav.size > 0 and np.isfinite(wav).all()


def test_vevo_ar_trainer_integration(corpus):
    root, processed = corpus
    from bins.vc.train import AutoregressiveTransformerTrainer

    cfg = _base_cfg(
        root, processed,
        model={"ar": {"input_vocab": 8, "output_vocab": 16, "hidden": 32,
                      "num_layers": 1, "num_heads": 4},
               "content_tokenizer": {"hidden": 8, "codebook_dim": 4,
                                     "num_blocks": 1},
               "style_tokenizer": {"hidden": 8, "codebook_dim": 4,
                                   "num_blocks": 1}},
    )
    cfg.train["segment_frames"] = 32
    trainer = AutoregressiveTransformerTrainer(_args("ar_it"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2


@pytest.mark.parametrize("mode", ["ar", "nar", "voicebox"])
def test_dualcodec_tts_trainer_integration(corpus, mode):
    """DualCodec TTS trainers (ref the vendored package's Hydra CLI):
    ar / nar / voicebox modes over synthetic dual-stream codes."""
    root, processed = corpus
    from amphion_tpu.data.metadata import load_metadata

    rng = np.random.default_rng(3)
    code_dir = processed / "ljspeech" / "codes_dualcodec"
    code_dir.mkdir(exist_ok=True)
    utts = load_metadata(processed / "ljspeech" / "train.json")
    for u in utts:
        t = rng.integers(20, 30)
        codes = np.concatenate([
            rng.integers(0, 24, (1, t)),  # semantic stream
            rng.integers(0, 16, (3, t)),  # acoustic residual layers
        ]).astype(np.int32)
        np.save(code_dir / f"{u.uid}.npy", codes)

    cfg = _base_cfg(
        root, processed,
        model_type="DualCodecTTS",
        model={"dualcodec_tts": {
            "mode": mode, "text_vocab": 64, "speech_vocab": 24,
            "acoustic_vocab": 16, "hidden": 32, "intermediate": 64,
            "num_layers": 1, "num_heads": 2, "num_quantizers": 4,
            "cond_scale_factor": 2,
        }},
    )
    cfg.train["max_tokens"] = 512
    cfg.train["min_bucket"] = 16

    from amphion_tpu.runtime.tts_trainer import DualCodecTTSTrainer

    trainer = DualCodecTTSTrainer(_args(f"dctts_{mode}"), cfg)
    trainer.train_loop()
    assert trainer.loop.step == 2
    assert trainer.ckpt.latest() is not None


def test_picoaudio_trainer_and_inference_cli(corpus, monkeypatch):
    """Stage-1 VAE → PicoAudio (onset-matrix channels + class-emb context,
    1 step) → timestamp-controlled inference CLI (reference onset grammar)."""
    root, processed = corpus
    from bins.tta.train_tta import AutoencoderKLTrainer, PicoAudioTrainer
    from amphion_tpu.data.metadata import load_metadata, save_metadata

    # annotate the corpus with reference-grammar onset strings
    meta_path = processed / "ljspeech" / "train.json"
    utts = load_metadata(meta_path)
    onsets = ["dog__0.000-0.016", "cat__0.004-0.012_0.020-0.028",
              "cat__0.000-0.008--dog__0.016-0.028"]
    for i, u in enumerate(utts):
        u.extras["onset"] = onsets[i % len(onsets)]
    save_metadata(meta_path, utts)

    model = {
        "autoencoderkl": {"base_channels": 4, "channel_mults": [1, 2],
                          "latent_channels": 2},
        "picoaudio": {"base_channels": 8, "channel_mults": [1, 2],
                      "attn_levels": [1], "num_heads": 2, "text_dim": 16,
                      "event_list": ["cat", "dog"], "snr_gamma": 5.0},
    }
    cfg = _base_cfg(root, processed, model_type="AutoencoderKL", model=model)
    cfg.train["max_steps"] = 1
    cfg.train["save_checkpoints_steps"] = 1
    cfg.train["segment_frames"] = 32
    AutoencoderKLTrainer(_args("vae_pico"), cfg).train_loop()

    cfg2 = _base_cfg(root, processed, model_type="PicoAudio", model=model)
    cfg2.train["max_steps"] = 1
    cfg2.train["save_checkpoints_steps"] = 1
    cfg2.train["segment_frames"] = 32
    cfg2.train["vae_ckpt"] = str(root / "ckpts" / "vae_pico" / "checkpoint")
    trainer = PicoAudioTrainer(_args("pico_zs"), cfg2)
    # onset rows fold into 2 channels over the latent freq width
    assert trainer.onset_rows == 2 * trainer.latent_w
    trainer.train_loop()
    assert trainer.loop.step == 1

    import sys

    cfg_path = root / "pico.json"
    cfg_path.write_text(json.dumps(cfg2.to_dict()))
    out = root / "pico.wav"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--config", str(cfg_path), "--exp_name", "pico_zs",
        "--onset_str", "cat__0.000-0.008--dog__0.016-0.028",
        "--output_path", str(out),
        "--num_steps", "2", "--duration_frames", "32",
    ])
    from bins.tta.inference import main as tta_main

    tta_main()
    from amphion_tpu.data.audio_io import load_wav

    wav, sr = load_wav(out)
    assert sr == 8000 and wav.size > 0 and np.isfinite(wav).all()


def test_batch_testing_set_inference_cli(corpus, monkeypatch):
    """Batch stage-3 inference (ref --infer_testing_set): synthesize every
    utterance of a processed split into --output_dir."""
    import sys

    root, processed = corpus
    _write_textgrids(processed, phones=("a", "b", "sil"))
    from amphion_tpu.runtime.tts_trainer import FastSpeech2Trainer

    cfg = _base_cfg(
        root, processed,
        model_type="FastSpeech2",
        model={"fastspeech2": {"hidden": 16, "n_enc_layers": 1,
                               "n_dec_layers": 1, "n_heads": 2,
                               "ffn_hidden": 32, "kernel_size": 3}},
    )
    cfg.train["max_steps"] = 1
    cfg.train["save_checkpoints_steps"] = 1
    cfg.train["max_frames"] = 128
    FastSpeech2Trainer(_args("fs2_batch"), cfg).train_loop()

    cfg_path = root / "fs2_batch.json"
    cfg_path.write_text(json.dumps(cfg.to_dict()))
    out_dir = root / "batch_out"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--config", str(cfg_path), "--exp_name", "fs2_batch",
        "--testing_set", "test", "--output_dir", str(out_dir),
    ])
    from bins.tts.inference import main as tts_main

    tts_main()
    from amphion_tpu.data.metadata import load_metadata

    utts = load_metadata(processed / "ljspeech" / "test.json")
    wavs = sorted(out_dir.glob("*.wav"))
    assert len(wavs) == len(utts) > 0
    from amphion_tpu.data.audio_io import load_wav

    wav, sr = load_wav(wavs[0])
    assert sr == 8000 and wav.size > 0


def test_noro_trainer_and_inference_cli(corpus, monkeypatch):
    """Noro noise-robust VC: 2 train steps + the zero-shot conversion CLI
    (ref models/vc/Noro/noro_inference.py surface)."""
    import sys

    from bins.vc.Noro.train import NoroTrainer

    root, processed = corpus
    cfg = _base_cfg(
        root, processed, model_type="VC",
        model={"hidden": 16, "ref_layers": 1, "ref_heads": 2,
               "ref_filter": 32, "num_layers": 2},
    )
    cfg.train["segment_frames"] = 64
    cfg.train["ref_frames"] = 16
    NoroTrainer(_args("noro_t"), cfg).train_loop()

    cfg_path = root / "noro.json"
    cfg_path.write_text(json.dumps(cfg.to_dict()))
    wavs = root / "LJSpeech-1.1" / "wavs"
    out = root / "noro_out.wav"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--config", str(cfg_path), "--exp_name", "noro_t",
        "--source_path", str(wavs / "LJ001-0000.wav"),
        "--ref_path", str(wavs / "LJ001-0001.wav"),
        "--output_path", str(out), "--inference_steps", "4",
    ])
    from bins.vc.Noro.inference import main as noro_main

    noro_main()
    from amphion_tpu.data.audio_io import load_wav

    wav, sr = load_wav(out)
    assert sr == 8000 and wav.size > 0 and np.isfinite(wav).all()
