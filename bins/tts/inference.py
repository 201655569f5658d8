"""TTS inference CLI (reference: `bins/tts/inference.py` +
`models/tts/base/tts_inferece.py:25`): text → waveform with a trained VITS
checkpoint."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.audio_io import save_wav
from amphion_tpu.models.tts.vits.vits import VITS, VITSConfig
from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig
from amphion_tpu.ops.mel import MelConfig
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.text.g2p import G2PModule
from amphion_tpu.text.symbol_table import SymbolTable
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


def valle_inference(args, cfg, logger):
    """Zero-shot VALL-E: [prompt audio + prompt text] + target text → wav
    (ref `egs/tts/VALLE` inference: AR continuation + NAR completion +
    codec decode)."""
    import numpy as np

    from amphion_tpu.data.audio_io import load_wav, save_wav
    from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
    from amphion_tpu.models.tts.valle.valle import VALLE, VALLEConfig, ar_generate
    from amphion_tpu.text.g2p import G2PModule
    from amphion_tpu.text.symbol_table import SymbolTable
    from amphion_tpu.utils.tokenizer import AudioTokenizer

    p = cfg.preprocess
    symbols = SymbolTable.from_file(
        Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict
    )
    g2p = G2PModule(p.get("g2p_backend", "char"), p.get("lexicon_path") or None)
    ids = g2p.to_ids(args.prompt_text + " " + args.text, symbols)

    mc = cfg.model.get("codec", None)
    codec_cfg = CodecConfig(
        sample_rate=p.sample_rate,
        strides=tuple(mc.strides) if mc else (2, 4, 5, 6),
        num_quantizers=mc.num_quantizers if mc else 8,
        codebook_size=mc.codebook_size if mc else 1024,
        codebook_dim=mc.codebook_dim if mc else 8,
        encoder_dim=mc.get("encoder_dim", 32) if mc else 32,
        latent_dim=mc.get("latent_dim", 256) if mc else 256,
        decoder_dim=mc.get("decoder_dim", 32) if mc else 32,
    )
    codec = AmphionCodec(codec_cfg)
    if args.codec_ckpt:
        ctree, _, _ = CheckpointManager(args.codec_ckpt).restore_raw()
        codec_params = ctree["g"]["params"] if "g" in ctree else ctree["params"]
    else:
        # same seed-0 init as `preprocess --extract_codes` without a ckpt, so
        # smoke runs stay consistent end-to-end
        logger.warning("no --codec_ckpt: RANDOM codec weights (smoke only)")
        codec_params = codec.init(
            jax.random.key(0), jnp.zeros((1, codec_cfg.hop * 4))
        )["params"]
    tok = AudioTokenizer(codec, codec_params, p.sample_rate)

    exp_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name
    tree, epoch, step = CheckpointManager(exp_dir / "checkpoint").restore_raw()
    params = tree["params"] if "params" in tree else tree
    logger.info(f"VALL-E restored from epoch {epoch} step {step}")
    m = cfg.model.get("valle", None)
    model = VALLE(VALLEConfig(
        num_phones=max(len(symbols) + 1, 64),
        audio_vocab=m.audio_vocab if m else 1024,
        num_quantizers=m.num_quantizers if m else 8,
        hidden=m.hidden if m else 1024,
        num_layers=m.num_layers if m else 12,
        num_heads=m.num_heads if m else 16,
        max_position=m.get("max_position", 4096) if m else 4096,
    ))

    prompt_audio, _ = load_wav(args.prompt_audio, sr=p.sample_rate)
    t = max(len(prompt_audio) // codec_cfg.hop * codec_cfg.hop, codec_cfg.hop)
    prompt_codes = tok.encode(prompt_audio[:t])[0]  # (Q, N)
    phones = jnp.asarray(ids)[None]

    tokens0, lengths = ar_generate(
        model, params, phones, jnp.asarray(prompt_codes[0])[None],
        jax.random.key(0), max_new=args.max_new, top_k=args.top_k,
    )
    n = max(int(lengths[0]), 1)
    token_mask = (jnp.arange(tokens0.shape[1]) < n).astype(jnp.float32)[None]
    nar = jax.jit(lambda prm, ph, pm, t0, tm, pc: model.apply(
        {"params": prm}, ph, pm, t0, tm, pc, method=VALLE.nar_generate,
    ))
    # the prompt's full codes condition the NAR pass as an acoustic prefix
    # (ref `valle.py:585-605` y_prompts; timbre transfer happens here)
    all_codes = nar(
        params, phones, jnp.ones_like(phones, jnp.float32), tokens0,
        token_mask, jnp.asarray(prompt_codes)[None],
    )
    wav = tok.decode(np.asarray(all_codes)[:, :, :n])
    save_wav(args.output_path, wav[0], p.sample_rate)
    logger.info(f"wrote {args.output_path} ({n * codec_cfg.hop / p.sample_rate:.2f}s)")


def _vocode(mel, args, cfg, logger):
    """mel (B, N, n_mel) → wav via a trained GAN vocoder ckpt, else
    Griffin-Lim (ref the two-stage `synthesis_by_vocoder`,
    `models/tts/base/tts_inferece.py:252`)."""
    from amphion_tpu.ops.dsp import mel_to_audio

    p = cfg.preprocess
    mel_cfg = MelConfig.from_preprocess_cfg(p)
    mel_mf = mel.transpose(0, 2, 1)  # (B, n_mel, N)
    if getattr(args, "vocoder_ckpt", ""):
        from amphion_tpu.runtime.vocoder_trainer import load_vocoder

        voc_fn, _ = load_vocoder(
            args.vocoder_ckpt, p.n_mel,
            getattr(args, "vocoder_config", ""), fallback_cfg=cfg)
        return np.asarray(voc_fn(mel))
    logger.info("no --vocoder_ckpt: Griffin-Lim reconstruction")
    return np.asarray(mel_to_audio(mel_mf, mel_cfg))


def fastspeech2_inference(args, cfg, logger):
    """Two-stage FS2 (ref `models/tts/fastspeech2/fs2_inference.py`): phones
    → predicted durations/pitch/energy → mel → vocoder. Uses the phone
    table the trainer persisted from the MFA TextGrids."""
    from amphion_tpu.models.tts.fastspeech2.fs2 import (
        FastSpeech2,
        FastSpeech2Config,
    )

    p = cfg.preprocess
    exp_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name
    symbols = SymbolTable.from_file(exp_dir / "symbols.dict")
    g2p = G2PModule(p.get("g2p_backend", "char"), p.get("lexicon_path") or None)
    ids = g2p.to_ids(args.text, symbols)
    assert ids, "no phones mapped into the trained symbol table"

    tree, epoch, step = CheckpointManager(exp_dir / "checkpoint").restore_raw()
    params = tree["params"] if "params" in tree else tree
    logger.info(f"FastSpeech2 restored from epoch {epoch} step {step}")
    m = cfg.model.get("fastspeech2", None)
    n_speakers = params.get("spk", {}).get("embedding", np.zeros((1, 1))).shape[0]
    model = FastSpeech2(FastSpeech2Config(
        num_phones=max(len(symbols) + 1, 64),
        hidden=m.hidden if m else 256,
        n_enc_layers=m.n_enc_layers if m else 4,
        n_dec_layers=m.n_dec_layers if m else 6,
        n_heads=m.n_heads if m else 2,
        ffn_hidden=m.ffn_hidden if m else 1024,
        kernel_size=m.get("kernel_size", 9) if m else 9,
        n_mel=p.n_mel,
        max_frames=cfg.train.get("max_frames", 600),
        n_speakers=n_speakers if "spk" in params else 0,
    ))
    phones = jnp.asarray(ids)[None]
    mask = jnp.ones_like(phones, jnp.float32)
    sid = jnp.asarray([0]) if "spk" in params else None
    out = jax.jit(lambda prm, ph, mk: model.apply(
        {"params": prm}, ph, mk, sid=sid, d_control=args.length_scale,
    ))(params, phones, mask)
    n = int(np.asarray(out["frame_mask"]).sum())
    wav = _vocode(out["mel_postnet"][:, :n], args, cfg, logger)
    save_wav(args.output_path, wav[0], p.sample_rate)
    logger.info(f"wrote {args.output_path} ({n * p.hop_size / p.sample_rate:.2f}s)")


def jets_inference(args, cfg, logger):
    """JETS E2E text→wave (ref `models/tts/jets/jets_inference.py`)."""
    from amphion_tpu.models.tts.fastspeech2.fs2 import FastSpeech2Config
    from amphion_tpu.models.tts.jets.jets import Jets, JetsConfig
    from amphion_tpu.models.vocoders.hifigan import (
        HiFiGANConfig as _HG,
    )

    p = cfg.preprocess
    symbols = SymbolTable.from_file(
        Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict
    )
    g2p = G2PModule(p.get("g2p_backend", "char"), p.get("lexicon_path") or None)
    ids = g2p.to_ids(args.text, symbols)

    exp_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name
    tree, epoch, step = CheckpointManager(exp_dir / "checkpoint").restore_raw()
    params = tree["g"]["params"] if "g" in tree else tree["params"]
    logger.info(f"JETS restored from epoch {epoch} step {step}")
    m = cfg.model.get("jets", None)
    dec_m = cfg.model.get("decoder", None)
    hidden = m.hidden if m else 256
    fs2 = FastSpeech2Config(
        num_phones=max(len(symbols) + 1, 64), hidden=hidden,
        n_enc_layers=m.get("n_enc_layers", 2) if m else 2,
        n_dec_layers=m.get("n_dec_layers", 2) if m else 2,
        n_heads=m.get("n_heads", 2) if m else 2,
        ffn_hidden=m.get("ffn_hidden", 4 * hidden) if m else 4 * hidden,
        n_mel=p.n_mel, max_frames=cfg.train.get("max_frames", 256),
    )
    dec = _HG.from_model_cfg(dec_m, n_mel=hidden) if dec_m else _HG(n_mel=hidden)
    model = Jets(JetsConfig(fs2=fs2, decoder=dec))
    phones = jnp.asarray(ids)[None]
    mask = jnp.ones_like(phones, jnp.float32)
    wav, fmask = jax.jit(lambda prm, ph, mk: model.apply(
        {"params": prm}, ph, mk, method=Jets.infer))(params, phones, mask)
    n = int(np.asarray(fmask).sum()) * dec.hop_size
    save_wav(args.output_path, np.asarray(wav)[0, :n], p.sample_rate)
    logger.info(f"wrote {args.output_path} ({n / p.sample_rate:.2f}s)")


def ns2_inference(args, cfg, logger):
    """NaturalSpeech2 zero-shot (ref `models/tts/naturalspeech2/
    ns2_inference.py`): prompt audio supplies the style; latent diffusion
    renders mel-latents which vocode to audio."""
    from amphion_tpu.data.audio_io import load_wav
    from amphion_tpu.models.tts.naturalspeech2.ns2 import (
        NaturalSpeech2,
        ns2_config_from_model_cfg,
        ns2_sample,
    )
    from amphion_tpu.ops.mel import mel_spectrogram

    p = cfg.preprocess
    mel_cfg = MelConfig.from_preprocess_cfg(p)
    exp_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name
    symbols = SymbolTable.from_file(exp_dir / "symbols.dict")
    g2p = G2PModule(p.get("g2p_backend", "char"), p.get("lexicon_path") or None)
    ids = g2p.to_ids(args.text, symbols)
    assert ids, "no phones mapped into the trained symbol table"
    assert args.prompt_audio, "--prompt_audio required (zero-shot style)"

    tree, epoch, step = CheckpointManager(exp_dir / "checkpoint").restore_raw()
    params = tree["params"] if "params" in tree else tree
    logger.info(f"NS2 restored from epoch {epoch} step {step}")
    m = cfg.model.get("ns2", None)
    model = NaturalSpeech2(ns2_config_from_model_cfg(
        m, num_phones=max(len(symbols) + 1, 64), latent_dim=p.n_mel,
        max_frames=cfg.train.get("max_frames", 600),
    ))
    prompt, _ = load_wav(args.prompt_audio, sr=p.sample_rate)
    pf = cfg.train.get("prompt_frames", 32)
    t = min(len(prompt) // p.hop_size, pf) * p.hop_size
    prompt_latent = mel_spectrogram(
        jnp.asarray(prompt[: max(t, p.hop_size)])[None], mel_cfg
    ).transpose(0, 2, 1)
    phones = jnp.asarray(ids)[None]
    mask = jnp.ones_like(phones, jnp.float32)
    pmask = jnp.ones(prompt_latent.shape[:2], jnp.float32)
    z, fmask = ns2_sample(model, params, phones, mask, prompt_latent, pmask,
                          jax.random.key(0), num_steps=args.num_steps,
                          max_frames=cfg.train.get("max_frames", 600))
    # an untrained duration predictor can round every phone to 0 frames;
    # keep enough frames for the (Griffin-Lim) vocoder's STFT padding
    n = max(int(np.asarray(fmask).sum()), 16)
    wav = _vocode(z[:, :n], args, cfg, logger)
    save_wav(args.output_path, wav[0], p.sample_rate)
    logger.info(f"wrote {args.output_path} ({n * p.hop_size / p.sample_rate:.2f}s)")


def build_maskgct_pipeline(args, cfg, logger):
    """Assemble a :class:`MaskGCTPipeline` from a trained checkpoint (ref
    `models/tts/maskgct/maskgct_utils.py:75` builders). Shared between the
    batch inference CLI and `bins/demo_server.py`."""
    from amphion_tpu.models.codec.amphion_codec import CodecConfig
    from amphion_tpu.models.codec.repcodec import RepCodecConfig
    from amphion_tpu.models.tts.maskgct.maskgct import S2AConfig, T2SConfig
    from amphion_tpu.ops.mel import mel_spectrogram
    from amphion_tpu.pipelines.maskgct_pipeline import MaskGCTPipeline

    p = cfg.preprocess
    mel_cfg = MelConfig.from_preprocess_cfg(p)
    symbols = SymbolTable.from_file(
        Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict
    )
    g2p = G2PModule(p.get("g2p_backend", "char"), p.get("lexicon_path") or None)

    weights_dir = getattr(args, "weights_dir", "")
    manifest = {}
    if weights_dir:
        # converted-pretrained layout (bins/convert_checkpoint.py --bundle
        # maskgct); arch still comes from cfg.model sections
        import json as _json

        manifest = _json.loads(
            (Path(weights_dir) / "manifest.json").read_text())
        logger.info(f"loading converted weights: {sorted(manifest)}")

        def _from_manifest(*names):
            for n in names:
                if n in manifest:
                    t, _, _ = CheckpointManager(manifest[n]).restore_raw()
                    return t["params"] if "params" in t else t
            raise KeyError(f"none of {names} in {weights_dir}/manifest.json")

        params = {"t2s": _from_manifest("t2s"),
                  "s2a": _from_manifest("s2a_full", "s2a_1layer", "s2a")}
    else:
        exp_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name
        tree, epoch, step = CheckpointManager(
            exp_dir / "checkpoint").restore_raw()
        params = tree["params"] if "params" in tree else tree
        logger.info(f"MaskGCT restored from epoch {epoch} step {step}")

    mt = cfg.model.get("t2s", None)
    ms = cfg.model.get("s2a", None)
    msem = cfg.model.get("semantic_codec", None)
    sem_cfg = RepCodecConfig(
        feature_dim=p.n_mel,
        hidden=msem.get("hidden", 384) if msem else 384,
        codebook_size=msem.codebook_size if msem else 8192,
        codebook_dim=msem.get("codebook_dim", 8) if msem else 8,
        num_blocks=msem.get("num_blocks", 4) if msem else 4,
    )
    mc = cfg.model.get("codec", None)
    ac_cfg = CodecConfig(
        sample_rate=p.sample_rate,
        strides=tuple(mc.strides) if mc else (2, 4, 5, 6),
        num_quantizers=mc.num_quantizers if mc else 8,
        codebook_size=mc.codebook_size if mc else 1024,
        codebook_dim=mc.codebook_dim if mc else 8,
        encoder_dim=mc.get("encoder_dim", 32) if mc else 32,
        latent_dim=mc.get("latent_dim", 256) if mc else 256,
        decoder_dim=mc.get("decoder_dim", 32) if mc else 32,
    )
    from amphion_tpu.models.codec.amphion_codec import AmphionCodec
    from amphion_tpu.models.codec.repcodec import RepCodec

    sem_codec = RepCodec(sem_cfg)
    if "semantic_codec" in manifest:
        stree, _, _ = CheckpointManager(
            manifest["semantic_codec"]).restore_raw()
        sem_params = stree["params"]
    elif args.semantic_ckpt:
        stree, _, _ = CheckpointManager(args.semantic_ckpt).restore_raw()
        sem_params = (stree.get("g", stree)["params"] if "g" in stree
                      else stree["params"])
    else:
        logger.warning("no --semantic_ckpt: RANDOM semantic codec (smoke)")
        sem_params = sem_codec.init(
            jax.random.key(0), jnp.zeros((1, 8, p.n_mel))
        )["params"]
    ac = AmphionCodec(ac_cfg)
    if "acoustic_codec" in manifest:
        ctree, _, _ = CheckpointManager(
            manifest["acoustic_codec"]).restore_raw()
        ac_params = ctree["params"]
    elif args.codec_ckpt:
        ctree, _, _ = CheckpointManager(args.codec_ckpt).restore_raw()
        ac_params = (ctree["g"]["params"] if "g" in ctree
                     else ctree["params"])
    else:
        logger.warning("no --codec_ckpt: RANDOM acoustic codec (smoke)")
        ac_params = ac.init(
            jax.random.key(0), jnp.zeros((1, ac_cfg.hop * 4))
        )["params"]

    hop = mel_cfg.hop_size
    mel_fn = jax.jit(lambda au: mel_spectrogram(au, mel_cfg))

    def semantic_extractor(audio, sample_rate):
        t = max(len(audio) // hop * hop, hop)
        return np.asarray(
            mel_fn(jnp.asarray(audio[:t])[None])
        ).transpose(0, 2, 1)[0]

    n_q = ac_cfg.num_quantizers
    pipe = MaskGCTPipeline.build(
        T2SConfig(
            hidden=mt.hidden if mt else 1024,
            num_layers=mt.num_layers if mt else 16,
            num_heads=mt.num_heads if mt else 16,
            codebook_size=mt.codebook_size if mt else 8192,
            phone_vocab=max(len(symbols) + 1, 64),
        ),
        S2AConfig(
            hidden=ms.hidden if ms else 1024,
            num_layers=ms.num_layers if ms else 16,
            num_heads=ms.num_heads if ms else 16,
            codebook_size=ms.codebook_size if ms else 1024,
            num_quantizers=n_q,
            # S2A conditions on the semantic codec's quantized latents
            semantic_dim=sem_cfg.hidden,
        ),
        sem_cfg, ac_cfg,
        params={"t2s": params["t2s"], "s2a": params["s2a"],
                "semantic_codec": sem_params, "acoustic_codec": ac_params},
        semantic_extractor=semantic_extractor, g2p=g2p,
        symbol_table=symbols, sample_rate=p.sample_rate,
        semantic_rate=p.sample_rate // hop,
    )
    return pipe


def maskgct_zeroshot_inference(args, cfg, logger):
    """MaskGCT zero-shot TTS (ref `models/tts/maskgct/maskgct_inference.py`):
    prompt audio + prompt text + target text → wav through the assembled
    pipeline (g2p → T2S mask-predict → S2A per-RVQ-layer → codec decode)."""
    from amphion_tpu.data.audio_io import load_wav

    pipe = build_maskgct_pipeline(args, cfg, logger)
    p = cfg.preprocess
    prompt, _ = load_wav(args.prompt_audio, sr=p.sample_rate)
    wav = pipe(prompt, args.prompt_text, args.text, jax.random.key(0))
    save_wav(args.output_path, wav, p.sample_rate)
    logger.info(f"wrote {args.output_path} ({len(wav) / p.sample_rate:.2f}s)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="exp")
    parser.add_argument("--text", default="")
    parser.add_argument("--speaker", default="")
    parser.add_argument("--output_path", default="")
    # batch mode (ref stage 3 `--infer_testing_set`, bins/tts/inference.py:63):
    # synthesize every utterance of a processed split to --output_dir
    parser.add_argument("--testing_set", default="",
                        help="processed split name (e.g. test, golden_test)")
    parser.add_argument("--output_dir", default="")
    parser.add_argument("--noise_scale", type=float, default=0.667)
    parser.add_argument("--length_scale", type=float, default=1.0)
    parser.add_argument("--max_frames", type=int, default=1000)
    # zero-shot / two-stage options
    parser.add_argument("--prompt_audio", default="")
    parser.add_argument("--prompt_text", default="")
    parser.add_argument("--codec_ckpt", default="")
    parser.add_argument("--semantic_ckpt", default="")
    parser.add_argument("--weights_dir", default="",
                        help="converted-pretrained bundle dir "
                             "(bins/convert_checkpoint.py --bundle ...)")
    parser.add_argument("--vocoder_ckpt", default="",
                        help="GAN vocoder checkpoint (Griffin-Lim if empty)")
    parser.add_argument("--vocoder_config", default="",
                        help="vocoder exp config (else exp_config.json "
                             "next to --vocoder_ckpt)")
    parser.add_argument("--num_steps", type=int, default=50)
    parser.add_argument("--max_new", type=int, default=512)
    parser.add_argument("--top_k", type=int, default=50)
    args = parser.parse_args()
    cfg = load_config(args.config)
    logger = get_logger("tts_infer")
    p = cfg.preprocess

    if args.testing_set:
        import copy

        from amphion_tpu.data.metadata import load_metadata

        assert args.output_dir, "--testing_set needs --output_dir"
        out_dir = Path(args.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        utts = []
        for ds in cfg.dataset:
            utts.extend(load_metadata(
                Path(p.processed_dir) / ds / f"{args.testing_set}.json"))
        logger.info(f"batch inference over {len(utts)} utterances "
                    f"({args.testing_set})")
        for u in utts:
            sub = copy.copy(args)
            sub.testing_set = ""
            sub.text = u.text or ""
            sub.speaker = u.speaker or ""
            sub.output_path = str(out_dir / f"{u.uid}.wav")
            _run_single(sub, cfg, logger)
        return
    assert args.text and args.output_path, "need --text and --output_path"
    return _run_single(args, cfg, logger)


def _run_single(args, cfg, logger):
    p = cfg.preprocess
    dispatch = {
        "VALLE": valle_inference,
        "FastSpeech2": fastspeech2_inference,
        "Jets": jets_inference,
        "NaturalSpeech2": ns2_inference,
        "MaskGCT": maskgct_zeroshot_inference,
    }
    if cfg.model_type in dispatch:
        return dispatch[cfg.model_type](args, cfg, logger)

    exp_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name
    spk2id = json.loads((exp_dir / "spk2id.json").read_text())
    symbols = SymbolTable.from_file(
        Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict
    )
    g2p = G2PModule(p.get("g2p_backend", "char"), p.get("lexicon_path") or None)
    ids = g2p.to_ids(args.text, symbols)
    if p.get("add_blank", True):
        # ref `models/tts/vits/vits_inference.py:124` intersperse(seq, 0)
        from amphion_tpu.text import intersperse
        ids = intersperse(ids, 0)

    mgr = CheckpointManager(exp_dir / "checkpoint")
    tree, epoch, step = mgr.restore_raw()
    params = tree["g"]["params"]
    logger.info(f"restored from epoch {epoch} step {step}")

    m = cfg.model.get("vits", None)
    dec_m = cfg.model.get("decoder", None)
    inter = m.inter_channels if m else 192
    dec_cfg = (
        HiFiGANConfig.from_model_cfg(dec_m, n_mel=inter)
        if dec_m else HiFiGANConfig(n_mel=inter)
    )
    model = VITS(VITSConfig(
        num_phones=max(len(symbols) + 1, 64),
        spec_channels=p.n_fft // 2 + 1,
        inter_channels=inter,
        hidden_channels=m.hidden_channels if m else 192,
        filter_channels=m.filter_channels if m else 768,
        n_heads=m.n_heads if m else 2,
        n_layers=m.n_layers if m else 6,
        n_speakers=len(spk2id) if len(spk2id) > 1 else 0,
        decoder=dec_cfg,
    ))
    sid = None
    if len(spk2id) > 1:
        sid = jnp.asarray([spk2id.get(args.speaker, 0)])
    phones = jnp.asarray(ids)[None]
    mask = jnp.ones_like(phones, jnp.float32)

    @jax.jit
    def synthesize(params, phones, mask, rng, sid):
        return model.apply(
            {"params": params}, phones, mask, rng, sid,
            args.noise_scale, args.length_scale, 0.8, args.max_frames,
            method=VITS.infer,
        )

    wav, fmask, durs = synthesize(params, phones, mask, jax.random.key(0), sid)
    n = int(np.asarray(fmask).sum()) * model.cfg.decoder.hop_size
    save_wav(args.output_path, np.asarray(wav)[0, :n], p.sample_rate)
    logger.info(f"wrote {args.output_path} ({n / p.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
