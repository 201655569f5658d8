"""Vevo1.5 / VevoSing zero-shot singing inference CLI (reference:
`models/svc/vevosing/infer_vevosing_{ar,fm}.py` over
`vevosing_utils.py:153` `VevosingInferencePipeline`).

Tasks:
  fm         — timbre conversion: source content-style tokens re-rendered
               with the reference timbre (ref ``inference_fm``);
               --match_pitch_{prosody,contentstyle} reproduce the
               f0-median-matched shifted-source extraction
  svc        — singing voice conversion: content + prosody (chroma-FVQ)
               tokens of the source → AR → content-style tokens →
               reference timbre (ref ``inference_ar_and_fm`` task
               "conversion" with ``use_style_tokens_as_ar_input``)
  synthesis  — text → AR → content-style tokens → reference timbre
               (ref task "synthesis"; SVS when --with_prosody is given)

Tokenizers are Coco codecs (content / style / content-style) from
CocoTrainer checkpoints; whisper-space features use the on-device mel
front end unless SSL checkpoints are wired (same offline convention as
the trainers). Vocoding uses a trained Vocos checkpoint when given, else
Griffin-Lim."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.audio_io import load_wav, save_wav
from amphion_tpu.models.codec.coco import CocoCodec, CocoConfig
from amphion_tpu.models.vc.ar_transformer import ARTransformer, ARTransformerConfig
from amphion_tpu.models.vc.flow_matching_transformer import (
    FlowMatchingTransformer,
    FMTConfig,
)
from amphion_tpu.models.vocoders.vocos import VocosConfig, VocosGenerator
from amphion_tpu.ops.dsp import mel_to_audio
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.pipelines.vevo_pipeline import VevoSingPipeline
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


def _restore(ckpt_dir, logger, tag):
    tree, _, step = CheckpointManager(ckpt_dir).restore_raw()
    params = tree.get("g", tree)
    params = params["params"] if "params" in params else params
    logger.info(f"{tag} restored from step {step} ({ckpt_dir})")
    return params


def _coco(name, mode, cfg, ckpt, vocab, logger, feature_dim):
    m = cfg.model.get(name, None)
    codec = CocoCodec(CocoConfig(
        mode=mode,
        feature_dim=feature_dim,
        codebook_size=vocab,
        hidden=m.get("hidden", 256) if m else 256,
        codebook_dim=m.get("codebook_dim", 8) if m else 8,
        downsample=m.get("downsample", 4) if m else 4,
        num_blocks=m.get("num_blocks", 2) if m else 2,
    ))
    if ckpt:
        params = _restore(ckpt, logger, name)
    else:
        logger.warning(f"no checkpoint for {name}: RANDOM weights (smoke)")
        import zlib

        c = codec.cfg
        content0 = (jnp.zeros((1, 8, feature_dim))
                    if mode in ("contentstyle", "content") else None)
        style0 = (jnp.zeros((1, 8, c.chromagram_dim))
                  if mode in ("contentstyle", "style") else None)
        params = codec.init(jax.random.key(zlib.crc32(name.encode())),
                            content0, None, style0)["params"]
    return codec, params


def build_pipeline(args, cfg, logger) -> tuple[VevoSingPipeline, bool]:
    p = cfg.preprocess
    mel_cfg = MelConfig.from_preprocess_cfg(p)
    ar_m = cfg.model.get("ar", None)
    fm_m = cfg.model.get("fm", None)
    in_vocab = ar_m.input_vocab if ar_m else 1024
    style_vocab = ar_m.get("style_vocab", 512) if ar_m else 512
    out_vocab = fm_m.token_vocab if fm_m else (
        ar_m.output_vocab if ar_m else 16384)

    content_tok, content_params = _coco(
        "content_tokenizer", "content", cfg, args.content_ckpt, in_vocab,
        logger, p.n_mel)
    cs_tok, cs_params = _coco(
        "style_tokenizer", "contentstyle", cfg, args.contentstyle_ckpt,
        out_vocab, logger, p.n_mel)
    prosody_tok, prosody_params = _coco(
        "prosody_tokenizer", "style", cfg, args.prosody_ckpt, style_vocab,
        logger, p.n_mel)

    ar = ARTransformer(ARTransformerConfig(
        input_vocab=in_vocab, output_vocab=out_vocab,
        style_vocab=style_vocab,
        hidden=ar_m.hidden if ar_m else 1536,
        num_layers=ar_m.num_layers if ar_m else 20,
        num_heads=ar_m.num_heads if ar_m else 16,
    ))
    fm = FlowMatchingTransformer(FMTConfig(
        token_vocab=out_vocab, n_mel=p.n_mel,
        hidden=fm_m.hidden if fm_m else 1024,
        num_layers=fm_m.num_layers if fm_m else 16,
        num_heads=fm_m.num_heads if fm_m else 16,
    ))
    log_dir = Path(cfg.get("log_dir", "ckpts"))
    ar_params = (_restore(log_dir / args.ar_exp / "checkpoint", logger, "ar")
                 if args.ar_exp else None)
    fm_params = _restore(log_dir / args.fm_exp / "checkpoint", logger, "fm")

    voc_m = cfg.model.get("vocos", None)
    vocoder = VocosGenerator(VocosConfig(
        n_mel=p.n_mel,
        dim=voc_m.get("dim", 512) if voc_m else 512,
        intermediate_dim=voc_m.get("intermediate_dim", 1536) if voc_m else 1536,
        num_layers=voc_m.get("num_layers", 8) if voc_m else 8,
        n_fft=p.n_fft, hop_size=p.hop_size,
    ))
    voc_params = (_restore(args.vocoder_ckpt, logger, "vocos")
                  if args.vocoder_ckpt else None)

    mel_extract = jax.jit(lambda au: mel_spectrogram(au, mel_cfg))
    # per-dim whisper-space standardization (ref vevosing_utils.py:202-210
    # use_normed_whisper: (features - mean) / std from whisper_stats_path)
    stats = None
    mcoco = cfg.model.get("coco", None)
    if mcoco and mcoco.get("use_normed_whisper", False):
        z = np.load(mcoco.whisper_stats_path)
        stats = (z["mean"].astype(np.float32), z["std"].astype(np.float32))

    def ssl(audio, sample_rate):
        t = len(audio) // mel_cfg.hop_size * mel_cfg.hop_size
        feats = np.asarray(
            mel_extract(jnp.asarray(audio[:t])[None])
        ).transpose(0, 2, 1)[0]
        if stats is not None:
            feats = (feats - stats[0]) / stats[1]
        return feats

    pipe = VevoSingPipeline(
        content_tokenizer=content_tok, style_tokenizer=cs_tok,
        ar=ar, fm=fm, vocoder=vocoder,
        params={"content_tokenizer": content_params,
                "style_tokenizer": cs_params,
                "ar": ar_params, "fm": fm_params, "vocoder": voc_params},
        hubert_extractor=ssl, mel_cfg=mel_cfg,
        prosody_tokenizer=prosody_tok, prosody_params=prosody_params,
    )
    if voc_params is None:
        logger.warning("no --vocoder_ckpt: Griffin-Lim mel inversion")
        # instance attribute shadows the class method for this pipeline
        pipe.vocode = lambda mel: np.asarray(
            mel_to_audio(jnp.asarray(mel).transpose(0, 2, 1), mel_cfg))[0]
    return pipe, voc_params is not None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--task", default="svc",
                        choices=["fm", "svc", "synthesis"])
    parser.add_argument("--src_audio", default="")
    parser.add_argument("--timbre_ref", required=True,
                        help="reference audio carrying the target timbre")
    parser.add_argument("--text", default="", help="target text (synthesis)")
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--ar_exp", default="",
                        help="AR trainer exp_name (svc/synthesis)")
    parser.add_argument("--fm_exp", required=True,
                        help="FM trainer exp_name")
    parser.add_argument("--content_ckpt", default="")
    parser.add_argument("--contentstyle_ckpt", default="")
    parser.add_argument("--prosody_ckpt", default="")
    parser.add_argument("--vocoder_ckpt", default="",
                        help="Vocos checkpoint dir; Griffin-Lim if absent")
    parser.add_argument("--match_pitch", action="store_true",
                        help="svc: extract prosody from a source pitch-"
                             "shifted to the reference's F0 median")
    parser.add_argument("--match_pitch_prosody", action="store_true",
                        help="fm: shifted-source chroma extraction")
    parser.add_argument("--match_pitch_contentstyle", action="store_true",
                        help="fm: shifted-source whisper extraction")
    parser.add_argument("--with_prosody", action="store_true",
                        help="synthesis: also condition on the source "
                             "audio's prosody tokens (SVS)")
    parser.add_argument("--target_src_duration_ratio", type=float,
                        default=1.0)
    parser.add_argument("--flow_matching_steps", type=int, default=32)
    parser.add_argument("--fm_solver", default="euler",
                        choices=["euler", "midpoint"],
                        help="FM ODE integrator (BENCHMARKS.md FM frontier: midpoint = RK2, better fidelity per eval)")
    parser.add_argument("--max_new", type=int, default=2048)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    cfg = load_config(args.config)
    logger = get_logger("vevosing_infer")
    p = cfg.preprocess

    pipe, has_vocoder = build_pipeline(args, cfg, logger)
    rng = jax.random.key(args.seed)
    fm_kw = {"flow_matching_steps": args.flow_matching_steps,
             "solver": args.fm_solver}
    timbre_ref, _ = load_wav(args.timbre_ref, sr=p.sample_rate)

    if args.task == "fm":
        assert args.src_audio, "--src_audio required for fm"
        src, _ = load_wav(args.src_audio, sr=p.sample_rate)
        wav = pipe.inference_fm(
            src, timbre_ref, rng,
            match_pitch_prosody=args.match_pitch_prosody,
            match_pitch_contentstyle=args.match_pitch_contentstyle, **fm_kw)
    elif args.task == "svc":
        assert args.src_audio and args.ar_exp, (
            "--src_audio and --ar_exp required for svc")
        src, _ = load_wav(args.src_audio, sr=p.sample_rate)
        wav = pipe.inference_svc(
            src, timbre_ref, rng, match_pitch=args.match_pitch,
            target_src_duration_ratio=args.target_src_duration_ratio, **fm_kw)
    else:  # synthesis
        assert args.text and args.ar_exp, (
            "--text and --ar_exp required for synthesis")
        from amphion_tpu.text.g2p import G2PModule
        from amphion_tpu.text.symbol_table import SymbolTable

        symbols = SymbolTable.from_file(
            Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict)
        g2p = G2PModule(p.get("g2p_backend", "char"),
                        p.get("lexicon_path") or None)
        ids = np.asarray(g2p.to_ids(args.text, symbols))
        r1, r2 = jax.random.split(rng)
        style_toks = None
        if args.with_prosody and args.src_audio:
            src, _ = load_wav(args.src_audio, sr=p.sample_rate)
            style_toks = jnp.asarray(
                pipe.prosody_tokens(src), jnp.int32)[None]
        style = pipe.ar_stage(ids, r1, max_new=args.max_new,
                              style_tokens=style_toks)
        mel = pipe.fm_stage(style, timbre_ref, r2, **fm_kw)
        wav = pipe.vocode(mel)

    save_wav(args.output_path, wav, p.sample_rate)
    logger.info(f"wrote {args.output_path} ({len(wav) / p.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
