"""Vevo zero-shot VC inference CLI (reference:
`models/vc/vevo/infer_vevo{timbre,style,voice,tts}.py` over
`vevo_utils.py:175` `VevoInferencePipeline`).

Tasks map to the reference's four products:
  timbre — FM only: source style tokens re-rendered with reference timbre
  style  — AR + FM, timbre_ref defaults to the source (accent conversion:
           style from --style_ref, speaker kept)
  voice  — AR + FM: source content → style tokens → reference timbre
           (style_ref defaults to the timbre reference)
  tts    — phone AR + FM: text → style tokens → reference timbre

Tokenizers run over the on-device mel front end (the same online
tokenization the trainers use); pass --hubert to use a locally cached
HuBERT for SSL features instead. Vocoding uses a trained Vocos checkpoint
when given, else Griffin-Lim."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.audio_io import load_wav, save_wav
from amphion_tpu.models.codec.repcodec import RepCodec, RepCodecConfig
from amphion_tpu.models.vc.ar_transformer import ARTransformer, ARTransformerConfig
from amphion_tpu.models.vc.flow_matching_transformer import (
    FlowMatchingTransformer,
    FMTConfig,
)
from amphion_tpu.models.vocoders.vocos import VocosConfig, VocosGenerator
from amphion_tpu.ops.dsp import mel_to_audio
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.pipelines.vevo_pipeline import VevoPipeline
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


def _restore(ckpt_dir, logger, tag):
    tree, _, step = CheckpointManager(ckpt_dir).restore_raw()
    params = tree.get("g", tree)
    params = params["params"] if "params" in params else params
    logger.info(f"{tag} restored from step {step} ({ckpt_dir})")
    return params


def _tokenizer(name, cfg, ckpt, vocab, logger):
    m = cfg.model.get(name, None)
    codec = RepCodec(RepCodecConfig(
        feature_dim=cfg.preprocess.n_mel,
        hidden=m.get("hidden", 128) if m else 128,
        codebook_size=vocab,
        codebook_dim=m.get("codebook_dim", 8) if m else 8,
        num_blocks=m.get("num_blocks", 2) if m else 2,
    ))
    if ckpt:
        params = _restore(ckpt, logger, name)
    else:
        logger.warning(f"no checkpoint for {name}: RANDOM weights (smoke)")
        import zlib

        params = codec.init(
            jax.random.key(zlib.crc32(name.encode())),
            jnp.zeros((1, 8, cfg.preprocess.n_mel)),
        )["params"]
    return codec, params


def build_pipeline(args, cfg, logger) -> tuple[VevoPipeline, bool]:
    """Assemble the pipeline from trainer checkpoints, or from a
    converted-pretrained bundle when --weights_dir is given
    (bins/convert_checkpoint.py --bundle vevo; ref pull site
    vevo_utils.py:46-175). Returns (pipeline, has_vocoder)."""
    p = cfg.preprocess
    mel_cfg = MelConfig.from_preprocess_cfg(p)
    manifest = {}
    if getattr(args, "weights_dir", ""):
        import json as _json

        manifest = _json.loads(
            (Path(args.weights_dir) / "manifest.json").read_text())
        logger.info(f"loading converted weights: {sorted(manifest)}")
        # manifest paths feed the same _restore flow below
        args.content_ckpt = manifest.get("content_tokenizer",
                                         args.content_ckpt)
        args.style_ckpt = manifest.get("content_style_tokenizer",
                                       args.style_ckpt)
        args.vocoder_ckpt = manifest.get("vocoder", args.vocoder_ckpt)
    ar_m = cfg.model.get("ar", None)
    fm_m = cfg.model.get("fm", None)
    in_vocab = ar_m.input_vocab if ar_m else 32
    out_vocab = fm_m.token_vocab if fm_m else (
        ar_m.output_vocab if ar_m else 8192
    )
    content_tok, content_params = _tokenizer(
        "content_tokenizer", cfg, args.content_ckpt, in_vocab, logger)
    style_tok, style_params = _tokenizer(
        "style_tokenizer", cfg, args.style_ckpt, out_vocab, logger)

    ar = ARTransformer(ARTransformerConfig(
        input_vocab=in_vocab, output_vocab=out_vocab,
        hidden=ar_m.hidden if ar_m else 1024,
        num_layers=ar_m.num_layers if ar_m else 16,
        num_heads=ar_m.num_heads if ar_m else 16,
    ))
    fm = FlowMatchingTransformer(FMTConfig(
        token_vocab=out_vocab, n_mel=p.n_mel,
        hidden=fm_m.hidden if fm_m else 1024,
        num_layers=fm_m.num_layers if fm_m else 16,
        num_heads=fm_m.num_heads if fm_m else 16,
    ))
    log_dir = Path(cfg.get("log_dir", "ckpts"))
    if "ar" in manifest:
        ar_params = _restore(manifest["ar"], logger, "ar")
    else:
        ar_params = (_restore(log_dir / args.ar_exp / "checkpoint", logger,
                              "ar") if args.ar_exp else None)
    if "fmt" in manifest:
        fm_params = _restore(manifest["fmt"], logger, "fm")
    else:
        if not args.fm_exp:
            raise SystemExit("--fm_exp or --weights_dir (with an 'fmt' "
                             "component) is required")
        fm_params = _restore(log_dir / args.fm_exp / "checkpoint", logger,
                             "fm")

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

    # SSL features: mel front end by default (matches trainer tokenization)
    mel_extract = jax.jit(lambda au: mel_spectrogram(au, mel_cfg))

    def ssl(audio, sample_rate):
        t = len(audio) // mel_cfg.hop_size * mel_cfg.hop_size
        return np.asarray(
            mel_extract(jnp.asarray(audio[:t])[None])
        ).transpose(0, 2, 1)[0]

    if args.hubert:
        from amphion_tpu.data.processors.content import hubert_extractor

        ssl = hubert_extractor()

    pipe = VevoPipeline(
        content_tokenizer=content_tok, style_tokenizer=style_tok,
        ar=ar, fm=fm, vocoder=vocoder,
        params={"content_tokenizer": content_params,
                "style_tokenizer": style_params,
                "ar": ar_params, "fm": fm_params, "vocoder": voc_params},
        hubert_extractor=ssl, mel_cfg=mel_cfg,
    )
    return pipe, voc_params is not None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--task", default="voice",
                        choices=["timbre", "style", "voice", "tts"])
    parser.add_argument("--src_audio", default="")
    parser.add_argument("--timbre_ref", default="",
                        help="reference audio carrying the target timbre "
                             "(style task defaults it to --src_audio: "
                             "accent/style change, speaker kept)")
    parser.add_argument("--style_ref", default="",
                        help="reference audio carrying the target style "
                             "(style/voice tasks; voice defaults it to "
                             "--timbre_ref)")
    parser.add_argument("--text", default="", help="target text (tts)")
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--ar_exp", default="",
                        help="AR trainer exp_name (voice/tts)")
    parser.add_argument("--fm_exp", default="",
                        help="FM trainer exp_name (or --weights_dir)")
    parser.add_argument("--weights_dir", default="",
                        help="converted-pretrained bundle dir "
                             "(bins/convert_checkpoint.py --bundle vevo)")
    parser.add_argument("--content_ckpt", default="")
    parser.add_argument("--style_ckpt", default="")
    parser.add_argument("--vocoder_ckpt", default="",
                        help="Vocos checkpoint dir; Griffin-Lim if absent")
    parser.add_argument("--hubert", action="store_true",
                        help="use locally cached HuBERT for SSL features")
    parser.add_argument("--flow_matching_steps", type=int, default=32)
    parser.add_argument("--fm_solver", default="euler",
                        choices=["euler", "midpoint"],
                        help="FM ODE integrator: euler = reference 32-step protocol; midpoint = RK2, 2 evals/step (measured better fidelity per eval — BENCHMARKS.md FM frontier)")
    parser.add_argument("--max_new", type=int, default=2048)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    cfg = load_config(args.config)
    logger = get_logger("vc_infer")
    p = cfg.preprocess

    pipe, has_vocoder = build_pipeline(args, cfg, logger)
    rng = jax.random.key(args.seed)
    fm_kw = {"flow_matching_steps": args.flow_matching_steps,
             "solver": args.fm_solver}

    if args.task == "timbre":
        assert args.src_audio and args.timbre_ref, (
            "--src_audio and --timbre_ref required for timbre")
        src, _ = load_wav(args.src_audio, sr=p.sample_rate)
        timbre_ref, _ = load_wav(args.timbre_ref, sr=p.sample_rate)
        style = pipe.style_tokens(src)
        mel = pipe.fm_stage(style, timbre_ref, rng, **fm_kw)
    elif args.task in ("style", "voice"):
        # style (accent conversion): timbre_ref defaults to the source
        # itself (ref infer_vevostyle.py:12-19); voice: style_ref defaults
        # to the timbre reference (ref infer_vevovoice.py)
        assert args.src_audio and args.ar_exp, (
            "--src_audio and --ar_exp required for style/voice")
        src, _ = load_wav(args.src_audio, sr=p.sample_rate)
        if args.task == "style":
            assert args.style_ref, "--style_ref required for style"
            timbre_ref = (load_wav(args.timbre_ref, sr=p.sample_rate)[0]
                          if args.timbre_ref else src)
            style_ref, _ = load_wav(args.style_ref, sr=p.sample_rate)
        else:
            assert args.timbre_ref, "--timbre_ref required for voice"
            timbre_ref, _ = load_wav(args.timbre_ref, sr=p.sample_rate)
            style_ref = (load_wav(args.style_ref, sr=p.sample_rate)[0]
                         if args.style_ref else timbre_ref)
        r1, r2 = jax.random.split(rng)
        content = pipe.content_tokens(
            np.concatenate([style_ref, src]))
        prompt_out, ref_mel = pipe.ar_style_prompt(style_ref)
        style = pipe.ar_stage(content, r1, max_new=args.max_new,
                              prompt_output_tokens=prompt_out,
                              ref_mel=ref_mel)
        mel = pipe.fm_stage(style, timbre_ref, r2, **fm_kw)
    else:  # tts
        assert args.text and args.ar_exp and args.timbre_ref, (
            "--text, --ar_exp and --timbre_ref required")
        from amphion_tpu.text.g2p import G2PModule
        from amphion_tpu.text.symbol_table import SymbolTable

        timbre_ref, _ = load_wav(args.timbre_ref, sr=p.sample_rate)
        symbols = SymbolTable.from_file(
            Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict
        )
        g2p = G2PModule(p.get("g2p_backend", "char"),
                        p.get("lexicon_path") or None)
        ids = g2p.to_ids(args.text, symbols)
        r1, r2 = jax.random.split(rng)
        style = pipe.ar_stage(np.asarray(ids), r1, max_new=args.max_new)
        mel = pipe.fm_stage(style, timbre_ref, r2, **fm_kw)

    if has_vocoder:
        wav = pipe.vocode(mel)
    else:
        logger.warning("no --vocoder_ckpt: Griffin-Lim mel inversion")
        mel_cfg = MelConfig.from_preprocess_cfg(p)
        wav = np.asarray(mel_to_audio(mel.transpose(0, 2, 1), mel_cfg))[0]
    save_wav(args.output_path, wav, p.sample_rate)
    logger.info(f"wrote {args.output_path} ({len(wav) / p.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
