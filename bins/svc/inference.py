"""SVC inference CLI (reference: `bins/svc/inference.py` +
`models/svc/base/svc_inference.py:10`): convert a source wav to a target
singer with a trained DiffWaveNetSVC checkpoint.

The vocoder stage uses a trained GAN vocoder checkpoint when given, else
falls back to filterbank-pinv + Griffin-Lim (self-contained).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.audio_io import load_wav, save_wav
from amphion_tpu.models.svc.diffusion_svc import (
    DiffusionSVC,
    DiffusionSVCConfig,
    diffusion_svc_sample,
)
from amphion_tpu.modules.condition_encoder import ConditionEncoderConfig
from amphion_tpu.modules.wavenet_denoiser import WaveNetDenoiserConfig
from amphion_tpu.ops.dsp import mel_to_audio
from amphion_tpu.ops.energy import energy_from_log_mel
from amphion_tpu.ops.f0 import F0Config, yin_f0
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="exp")
    parser.add_argument("--source", required=True, help="source wav")
    parser.add_argument("--target_singer", required=True,
                        help="singer name or integer id")
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--key_shift", type=float, default=0.0,
                        help="semitones applied to the source F0; pass "
                             "'autoshift' via --auto_f0 instead to match "
                             "the target singer's pitch register")
    parser.add_argument("--auto_f0", action="store_true",
                        help="scale source F0 by target_median/source_median "
                             "from the preprocessing pitch statistics (ref "
                             "utils/data_utils.py get_conversion_f0_factor)")
    parser.add_argument("--num_steps", type=int, default=50)
    parser.add_argument("--vocoder_ckpt", default="",
                        help="GAN vocoder checkpoint (Griffin-Lim if empty)")
    parser.add_argument("--vocoder_config", default="",
                        help="vocoder exp config (else exp_config.json "
                             "next to --vocoder_ckpt)")
    parser.add_argument("--dump_steps_dir", default="",
                        help="dump per-step diffusion mels for the "
                             "SingVisio explorer")
    args = parser.parse_args()
    cfg = load_config(args.config)
    logger = get_logger("svc_infer")
    p = cfg.preprocess
    mel_cfg = MelConfig.from_preprocess_cfg(p)
    f0_cfg = F0Config.from_preprocess_cfg(p)

    # model (mirrors bins/svc/train.py construction)
    m = cfg.model
    mgr = CheckpointManager(
        Path(cfg.get("log_dir", "ckpts")) / args.exp_name / "checkpoint"
    )
    tree, epoch, step = mgr.restore_raw()
    params = tree["params"] if "params" in tree else tree
    logger.info(f"restored from epoch {epoch} step {step}")
    num_singers = params["condition_encoder"]["singer_embed"]["embedding"].shape[0]
    cond = ConditionEncoderConfig(
        output_dim=m.get("cond_dim", 384), num_singers=num_singers,
    )
    model = DiffusionSVC(DiffusionSVCConfig(
        n_mel=p.n_mel, condition=cond,
        denoiser=WaveNetDenoiserConfig(
            in_dim=p.n_mel, hidden=m.get("hidden", 256),
            num_layers=m.get("num_layers", 20), cond_dim=cond.output_dim,
        ),
    ))

    # source features (on device)
    x, _ = load_wav(args.source, sr=p.sample_rate)
    t = len(x) // p.hop_size * p.hop_size
    au = jnp.asarray(x[:t])[None]
    mel = mel_spectrogram(au, mel_cfg)
    f0, uv = yin_f0(au, f0_cfg)
    if args.auto_f0:
        # ref `get_conversion_f0_factor` (utils/data_utils.py:74): shift the
        # source register to the target singer's median voiced F0
        stats_path = (Path(p.processed_dir) / cfg.dataset[0]
                      / "statistics.json")
        stats = json.loads(stats_path.read_text()).get("pitch", {})
        tgt = stats.get(str(args.target_singer))
        voiced = np.asarray(f0)[np.asarray(f0) > 0]
        if tgt and voiced.size:
            factor = tgt["median"] / float(np.median(voiced))
            f0 = f0 * factor
            logger.info(f"auto f0 factor {factor:.3f} "
                        f"(target median {tgt['median']:.1f} Hz)")
        else:
            logger.warning("auto_f0: no target pitch statistics; skipping")
    f0 = f0 * (2.0 ** (args.key_shift / 12.0))
    energy = energy_from_log_mel(mel)
    try:
        sid = int(args.target_singer)
    except ValueError:
        spk_map_path = mgr.directory.parent / "singer2id.json"
        sid = (json.loads(spk_map_path.read_text()).get(args.target_singer, 0)
               if spk_map_path.is_file() else 0)
    features = {
        "f0": f0, "uv": uv.astype(jnp.float32), "loudness": energy,
        "singer": jnp.asarray([sid]),
    }
    n = mel.shape[-1]
    if args.dump_steps_dir:
        out_mel, traj = diffusion_svc_sample(
            model, params, features, (1, n, p.n_mel), jax.random.key(0),
            "ddim", args.num_steps, return_trajectory=True,
        )
        from amphion_tpu.visualization.singvisio.server import (
            dump_diffusion_steps,
        )

        uid = Path(args.output_path).stem
        # traj (steps, 1, N, n_mel) → per-step (n_mel, N) artifacts
        dump_diffusion_steps(
            [np.asarray(m)[0].T for m in traj], args.dump_steps_dir, uid)
        logger.info(f"dumped {len(traj)} step mels -> "
                    f"{args.dump_steps_dir}/{uid}")
    else:
        out_mel = diffusion_svc_sample(
            model, params, features, (1, n, p.n_mel), jax.random.key(0),
            "ddim", args.num_steps,
        )

    if args.vocoder_ckpt:
        from amphion_tpu.runtime.vocoder_trainer import load_vocoder

        voc_fn, _ = load_vocoder(args.vocoder_ckpt, p.n_mel,
                                 args.vocoder_config, fallback_cfg=cfg)
        wav = voc_fn(out_mel)
    else:
        logger.info("no vocoder checkpoint: Griffin-Lim reconstruction")
        wav = mel_to_audio(out_mel.transpose(0, 2, 1), mel_cfg)
    save_wav(args.output_path, np.asarray(wav)[0], p.sample_rate)
    logger.info(f"wrote {args.output_path}")


if __name__ == "__main__":
    main()
