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
    args = parser.parse_args()
    cfg = load_config(args.config)
    logger = get_logger("tts_infer")
    p = cfg.preprocess

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
