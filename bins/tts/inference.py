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
    nar = jax.jit(lambda prm, ph, pm, t0, tm: model.apply(
        {"params": prm}, ph, pm, t0, tm, method=VALLE.nar_generate,
    ))
    all_codes = nar(
        params, phones, jnp.ones_like(phones, jnp.float32), tokens0, token_mask
    )
    wav = tok.decode(np.asarray(all_codes)[:, :, :n])
    save_wav(args.output_path, wav[0], p.sample_rate)
    logger.info(f"wrote {args.output_path} ({n * codec_cfg.hop / p.sample_rate:.2f}s)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="exp")
    parser.add_argument("--text", required=True)
    parser.add_argument("--speaker", default="")
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--noise_scale", type=float, default=0.667)
    parser.add_argument("--length_scale", type=float, default=1.0)
    parser.add_argument("--max_frames", type=int, default=1000)
    # VALL-E zero-shot options
    parser.add_argument("--prompt_audio", default="")
    parser.add_argument("--prompt_text", default="")
    parser.add_argument("--codec_ckpt", default="")
    parser.add_argument("--max_new", type=int, default=512)
    parser.add_argument("--top_k", type=int, default=50)
    args = parser.parse_args()
    cfg = load_config(args.config)
    logger = get_logger("tts_infer")
    p = cfg.preprocess
    if cfg.model_type == "VALLE":
        return valle_inference(args, cfg, logger)

    exp_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name
    spk2id = json.loads((exp_dir / "spk2id.json").read_text())
    symbols = SymbolTable.from_file(
        Path(p.processed_dir) / cfg.dataset[0] / p.symbols_dict
    )
    g2p = G2PModule(p.get("g2p_backend", "char"), p.get("lexicon_path") or None)
    ids = g2p.to_ids(args.text, symbols)

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
