"""Metis per-task inference CLI (reference:
`models/tts/metis/metis_infer_{tts,vc,tse,se,omni}.py` — the unified
masked-generative foundation model's task entry points).

Tasks:
  tts — prompt audio + prompt/target text → speech (MaskGCT-style:
        semantic mask-predict conditioned on phones, prompted with the
        prompt audio's semantic tokens)
  vc  — source audio → semantic tokens re-generated under the vc task
        embedding (timbre from the acoustic prompt)
  se  — noisy audio → clean speech
  tse — enrollment + mixture audio → target speaker's speech
  l2s — visual embedding sequence (.npy) → speech

All tasks share the second stage: generated semantic tokens →
RepCodec-reconstructed semantic features → S2A mask-predict → acoustic
codec decode. Semantic features use the on-device mel front end unless a
local SSL checkpoint is wired (same convention as bins/tts/inference.py
MaskGCT zero-shot: the mel-proxy path keeps the CLI runnable offline).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.audio_io import load_wav, save_wav
from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
from amphion_tpu.models.codec.repcodec import RepCodec, RepCodecConfig
from amphion_tpu.models.tts.maskgct.maskgct import S2AConfig, T2SConfig, s2a_sample
from amphion_tpu.models.tts.metis.metis import (
    Metis,
    MetisConfig,
    metis_infer_task,
    metis_infer_tts,
)
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.text.g2p import G2PModule
from amphion_tpu.text.symbol_table import SymbolTable
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


def build_metis(args, cfg, logger):
    """(model, params, codecs) from a MetisTrainer checkpoint."""
    p = cfg.preprocess
    symbols = SymbolTable.from_file(
        Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict
    )
    mt = cfg.model.get("t2s", None)
    ms = cfg.model.get("s2a", None)
    msem = cfg.model.get("semantic_codec", None)
    # MetisTrainer conditions on the semantic codec's quantized latents
    # (stored `semantic_feats`), so the conditioning dim IS the codec's
    # latent width — `hidden` for the conv-style RepCodec, feature_dim for
    # the vocos-style one (whose RVQ runs at feature_dim).
    sem_feature_dim = (p.n_mel
                       if p.get("semantic_source", "mel") == "mel"
                       else (msem.get("feature_dim", 1024) if msem else 1024))
    sem_hidden = msem.get("hidden", 384) if msem else 384
    sem_style = msem.get("style", "conv") if msem else "conv"
    sem_dim = sem_feature_dim if sem_style == "vocos" else sem_hidden
    mc = cfg.model.get("codec", None)
    n_q = mc.num_quantizers if mc else 8
    model = Metis(MetisConfig(
        t2s=T2SConfig(
            hidden=mt.hidden if mt else 1024,
            num_layers=mt.num_layers if mt else 16,
            num_heads=mt.num_heads if mt else 16,
            codebook_size=mt.codebook_size if mt else 8192,
            phone_vocab=max(len(symbols) + 1, 64),
        ),
        s2a=S2AConfig(
            hidden=ms.hidden if ms else 1024,
            num_layers=ms.num_layers if ms else 16,
            num_heads=ms.num_heads if ms else 16,
            codebook_size=ms.codebook_size if ms else 1024,
            num_quantizers=n_q,
            semantic_dim=sem_dim,
        ),
        cond_feature_dim=sem_dim,
    ))
    exp_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name
    tree, epoch, step = CheckpointManager(exp_dir / "checkpoint").restore_raw()
    params = tree["params"] if "params" in tree else tree
    logger.info(f"Metis restored from epoch {epoch} step {step}")

    sem_codec = RepCodec(RepCodecConfig(
        feature_dim=sem_feature_dim,
        hidden=sem_hidden,
        codebook_size=msem.codebook_size if msem else 8192,
        codebook_dim=msem.get("codebook_dim", 8) if msem else 8,
        num_blocks=msem.get("num_blocks", 4) if msem else 4,
        style=sem_style,
    ))
    if args.semantic_ckpt:
        stree, _, _ = CheckpointManager(args.semantic_ckpt).restore_raw()
        sem_params = (stree.get("g", stree)["params"] if "g" in stree
                      else stree["params"])
    else:
        logger.warning("no --semantic_ckpt: RANDOM semantic codec (smoke)")
        sem_params = sem_codec.init(
            jax.random.key(0), jnp.zeros((1, 8, sem_feature_dim)))["params"]

    ac_cfg = CodecConfig(
        sample_rate=p.sample_rate,
        strides=tuple(mc.strides) if mc else (2, 4, 5, 6),
        num_quantizers=n_q,
        codebook_size=mc.codebook_size if mc else 1024,
        codebook_dim=mc.codebook_dim if mc else 8,
        encoder_dim=mc.get("encoder_dim", 32) if mc else 32,
        latent_dim=mc.get("latent_dim", 256) if mc else 256,
        decoder_dim=mc.get("decoder_dim", 32) if mc else 32,
    )
    ac = AmphionCodec(ac_cfg)
    if args.codec_ckpt:
        ctree, _, _ = CheckpointManager(args.codec_ckpt).restore_raw()
        ac_params = (ctree["g"]["params"] if "g" in ctree
                     else ctree["params"])
    else:
        logger.warning("no --codec_ckpt: RANDOM acoustic codec (smoke)")
        ac_params = ac.init(
            jax.random.key(0), jnp.zeros((1, ac_cfg.hop * 4)))["params"]
    return (model, params, symbols,
            sem_codec, sem_params, ac, ac_params, sem_dim)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--exp_name", required=True)
    ap.add_argument("--task", required=True,
                    choices=["tts", "vc", "se", "tse", "l2s"])
    ap.add_argument("--src_audio", default="",
                    help="source (vc) / noisy (se) / mixture (tse) audio")
    ap.add_argument("--enroll_audio", default="",
                    help="enrollment audio (tse): prepended to the mixture")
    ap.add_argument("--visual_npy", default="",
                    help="visual embedding sequence .npy (l2s)")
    ap.add_argument("--prompt_audio", default="",
                    help="acoustic prompt carrying the target timbre")
    ap.add_argument("--prompt_text", default="", help="prompt transcript (tts)")
    ap.add_argument("--text", default="", help="target text (tts)")
    ap.add_argument("--semantic_ckpt", default="")
    ap.add_argument("--codec_ckpt", default="")
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--n_steps", type=int, default=25)
    ap.add_argument("--first_layer_steps", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    cfg = load_config(args.config)
    logger = get_logger("metis_infer")
    p = cfg.preprocess

    (model, params, symbols, sem_codec, sem_params,
     ac, ac_params, sem_dim) = build_metis(args, cfg, logger)
    mel_cfg = MelConfig.from_preprocess_cfg(p)
    hop = mel_cfg.hop_size
    mel_fn = jax.jit(lambda au: mel_spectrogram(au, mel_cfg))

    def extract_feats(audio):
        t = max(len(audio) // hop * hop, hop)
        return np.asarray(
            mel_fn(jnp.asarray(audio[:t])[None])).transpose(0, 2, 1)

    rng = jax.random.key(args.seed)
    r1, r2 = jax.random.split(rng)

    # -- stage 1: task-conditioned semantic generation -----------------------
    if args.task == "tts":
        assert args.text and args.prompt_audio, (
            "--text and --prompt_audio required for tts")
        g2p = G2PModule(p.get("g2p_backend", "char"),
                        p.get("lexicon_path") or None)
        phones = (g2p.to_ids(args.prompt_text, symbols)
                  + g2p.to_ids(args.text, symbols))
        prompt, _ = load_wav(args.prompt_audio, sr=p.sample_rate)
        pfeats = extract_feats(prompt)
        prompt_sem = sem_codec.apply(
            {"params": sem_params}, jnp.asarray(pfeats),
            method=RepCodec.encode)
        ratio = max(len(args.text), 1) / max(len(args.prompt_text), 1)
        target_len = int(prompt_sem.shape[1] * ratio) + 1
        semantic = metis_infer_tts(
            model, params, prompt_sem, jnp.asarray(phones)[None], target_len,
            r1, n_steps=args.n_steps)
    else:
        prompt_tok = None
        if args.task == "l2s":
            assert args.visual_npy, "--visual_npy required for l2s"
            feats = np.load(args.visual_npy)[None].astype(np.float32)
        else:
            assert args.src_audio, "--src_audio required"
            src, _ = load_wav(args.src_audio, sr=p.sample_rate)
            # vc/tse carry a semantic prompt (timbre ref / enrollment) and
            # condition on features of [prompt ‖ source]
            # (ref metis.py:410 speech2semantic_w_prompt)
            prompt_wav = None
            if args.task == "tse" and args.enroll_audio:
                prompt_wav, _ = load_wav(args.enroll_audio, sr=p.sample_rate)
            elif args.task == "vc" and args.prompt_audio:
                prompt_wav, _ = load_wav(args.prompt_audio, sr=p.sample_rate)
            if prompt_wav is not None:
                src = np.concatenate([prompt_wav, src])
                prompt_tok = sem_codec.apply(
                    {"params": sem_params},
                    jnp.asarray(extract_feats(prompt_wav)),
                    method=RepCodec.encode)
            else:
                prompt_tok = None
            # training conditions on the semantic codec's quantized latents
            # (preprocess `semantic_feats`) — replicate that transform here:
            # mel/SSL feats → tokens → quantized latents
            src_tok = sem_codec.apply(
                {"params": sem_params}, jnp.asarray(extract_feats(src)),
                method=RepCodec.encode)
            feats = sem_codec.apply(
                {"params": sem_params}, src_tok,
                method=RepCodec.decode_tokens)
        assert feats.shape[-1] == sem_dim, (
            f"conditioning dim {feats.shape[-1]} != semantic_dim {sem_dim}")
        plen = 0
        if args.task != "l2s" and prompt_tok is not None:
            plen = min(int(prompt_tok.shape[1]), feats.shape[1] - 1)
            prompt_tok = prompt_tok[:, :plen]
        else:
            prompt_tok = None
        target_len = feats.shape[1] - plen
        semantic = metis_infer_task(
            model, params, args.task, jnp.asarray(feats), target_len, r1,
            prompt_tokens=prompt_tok, n_steps=args.n_steps)

    # -- stage 2: semantic → acoustic → waveform -----------------------------
    if args.prompt_audio:
        prompt, _ = load_wav(args.prompt_audio, sr=p.sample_rate)
        prompt_ac = ac.apply(
            {"params": ac_params}, jnp.asarray(prompt)[None],
            method=AmphionCodec.encode)  # (Q, B, T)
        prompt_ac = jnp.transpose(prompt_ac, (1, 0, 2))  # (B, Q, Lp)
        prompt_sem_tok = sem_codec.apply(
            {"params": sem_params}, jnp.asarray(extract_feats(prompt)),
            method=RepCodec.encode)
        sem_full_tok = jnp.concatenate([prompt_sem_tok, semantic], axis=1)
    else:
        prompt_ac = jnp.zeros((1, model.cfg.s2a.num_quantizers, 0), jnp.int32)
        sem_full_tok = semantic
    # S2A conditions on the semantic codec's quantized latents (same space
    # the trainer stores as `semantic_feats`)
    sem_feats = sem_codec.apply(
        {"params": sem_params}, sem_full_tok,
        method=RepCodec.decode_tokens)
    from amphion_tpu.models.tts.maskgct.maskgct import MaskGCTS2A

    codes = s2a_sample(
        MaskGCTS2A(model.cfg.s2a), params["s2a"], sem_feats, prompt_ac,
        int(semantic.shape[1]), r2, first_layer_steps=args.first_layer_steps)
    wav = ac.apply(
        {"params": ac_params}, jnp.transpose(codes, (1, 0, 2)),
        method=AmphionCodec.decode_codes)
    wav = np.asarray(wav)[0]
    save_wav(args.output_path, wav, p.sample_rate)
    logger.info(
        f"[{args.task}] wrote {args.output_path} "
        f"({len(wav) / p.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
