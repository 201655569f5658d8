"""TTA inference CLI (reference: `bins/tta/inference.py` +
`models/tta/ldm/audioldm_inference.py`): text prompt → audio via
AudioLDM DDIM sampling with classifier-free guidance, AutoencoderKL
latent decode, and Griffin-Lim mel inversion (no vocoder dependency)."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.data.audio_io import save_wav
from amphion_tpu.models.tta.audioldm import (
    AudioLDM,
    AudioLDMConfig,
    audioldm_sample,
    encode_text,
)
from amphion_tpu.models.tta.autoencoder_kl import AutoencoderKL
from amphion_tpu.ops.dsp import mel_to_audio
from amphion_tpu.ops.mel import MelConfig
from amphion_tpu.runtime.checkpoint import CheckpointManager
from amphion_tpu.utils.config import load_config
from amphion_tpu.utils.logging import get_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="exp")
    parser.add_argument("--text", default="",
                        help="text prompt (AudioLDM)")
    parser.add_argument("--onset_str", default="",
                        help="PicoAudio timestamp control, reference grammar: "
                             "'event1__on1-off1_on2-off2--event2__on1-off1' "
                             "(seconds)")
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--clap_dir", default="",
                        help="converted CLAP text tower checkpoint dir "
                             "(`bins/convert_checkpoint.py --model "
                             "clap_text`): PicoAudio's ClapText variant "
                             "conditions on --text through it (ref "
                             "controllable_diffusion.py:349); for "
                             "AudioLDM it is an alternative --text "
                             "conditioner")
    parser.add_argument("--clap_bpe", default="",
                        help="path to the CLIP bpe_simple_vocab_16e6"
                             ".txt.gz merges file (zero-egress: supply "
                             "locally; the reference vendors it)")
    parser.add_argument("--t5_dir", default="",
                        help="converted flax T5 encoder ckpt dir "
                             "(bins/convert_checkpoint.py --model "
                             "t5_encoder) — on-device text conditioning")
    parser.add_argument("--vae_ckpt", default="",
                        help="AutoencoderKL checkpoint dir (defaults to "
                             "cfg.train.vae_ckpt)")
    parser.add_argument("--num_steps", type=int, default=50)
    parser.add_argument("--guidance_scale", type=float, default=3.0)
    parser.add_argument("--duration_frames", type=int, default=256,
                        help="mel frames of generated audio")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    cfg = load_config(args.config)
    logger = get_logger("tta_infer")
    p = cfg.preprocess
    mel_cfg = MelConfig.from_preprocess_cfg(p)

    from bins.tta.train_tta import _build_vae

    vae = _build_vae(cfg)
    vae_ckpt = args.vae_ckpt or cfg.train.get("vae_ckpt", "")
    assert vae_ckpt, "need --vae_ckpt (AutoencoderKL stage-1 checkpoint)"
    vtree, _, _ = CheckpointManager(vae_ckpt).restore_raw()
    vae_params = vtree["params"] if "params" in vtree else vtree

    model_type = cfg.get("model_type", "AudioLDM")
    exp_dir = Path(cfg.get("log_dir", "ckpts")) / args.exp_name
    tree, epoch, step = CheckpointManager(exp_dir / "checkpoint").restore_raw()
    params = tree["params"] if "params" in tree else tree
    logger.info(f"{model_type} restored from epoch {epoch} step {step}")

    # latent grid: mel (T, F) downsampled by the VAE's stride stack
    ds = 2 ** (len(vae.cfg.channel_mults) - 1)
    lt = -(-args.duration_frames // ds)
    lf = -(-mel_cfg.n_mel // ds)

    def clap_context(text_dim: int):
        """--text -> CLAP text embedding, width-matched to the UNet's
        cross-attn dim by repeat_interleave — EXACTLY the reference's
        ClapText context construction (controllable_diffusion.py:354:
        `event_info.repeat_interleave(2, -1).unsqueeze(1)`)."""
        assert args.text, "--clap_dir conditioning needs --text"
        assert args.clap_bpe, "--clap_dir needs --clap_bpe (merges file)"
        from amphion_tpu.modules.clap_text import (
            ClapBPETokenizer,
            ClapTextConfig,
            ClapTextEncoder,
            clap_text_embed,
        )

        clap_tree, _, _ = CheckpointManager(args.clap_dir).restore_raw()
        ccfg = cfg.model.get("clap_text", None)
        clap = ClapTextEncoder(
            ClapTextConfig(**dict(ccfg)) if ccfg else ClapTextConfig())
        toks = ClapBPETokenizer(args.clap_bpe)(
            [args.text], context_length=clap.cfg.context_length)
        emb = clap_text_embed(clap, clap_tree["params"], toks)  # (1, 512)
        rep = max(text_dim // emb.shape[-1], 1)
        return jnp.repeat(emb, rep, axis=-1)[:, None, :]  # (1, 1, D)

    if model_type == "PicoAudio":
        assert args.onset_str, "PicoAudio needs --onset_str"
        from amphion_tpu.models.tta.picoaudio import (
            PicoAudio,
            PicoAudioConfig,
            decode_onset_str,
            picoaudio_sample,
        )

        m = cfg.model.get("picoaudio", None)
        events = list(m.event_list) if m and m.get("event_list") else sorted(
            {ev.split("__")[0] for ev in args.onset_str.split("--")})
        class2id = {e: i for i, e in enumerate(events)}
        total_s = args.duration_frames * p.hop_size / p.sample_rate
        roll, _, first = decode_onset_str(
            args.onset_str, class2id, num_classes=2 * lf, frames=lt,
            grid_frames=lt, total_seconds=total_s)
        model = PicoAudio(PicoAudioConfig(
            ldm=AudioLDMConfig(
                latent_channels=vae.cfg.latent_channels,
                base_channels=m.get("base_channels", 128) if m else 128,
                channel_mults=tuple(m.channel_mults) if m else (1, 2, 4),
                attn_levels=tuple(m.attn_levels) if m else (1, 2),
                num_heads=m.get("num_heads", 8) if m else 8,
                text_dim=m.get("text_dim", 768) if m else 768,
            ),
            onset_classes=2 * lf,
            event_classes=m.get("event_classes", max(len(events), 1)) if m
            else max(len(events), 1),
        ))
        text_emb = (clap_context(model.cfg.ldm.text_dim)
                    if args.clap_dir else None)  # ClapText variant (B,1,D)
        z = picoaudio_sample(
            model, params, jnp.asarray(roll[None]), np.asarray([first]),
            (1, lt, lf, vae.cfg.latent_channels), jax.random.key(args.seed),
            num_steps=args.num_steps, guidance_scale=args.guidance_scale,
            text_emb=text_emb,
        )
    else:
        assert args.text, "AudioLDM needs --text"
        m = cfg.model.get("audioldm", None)
        model = AudioLDM(AudioLDMConfig(
            latent_channels=vae.cfg.latent_channels,
            base_channels=m.get("base_channels", 128) if m else 128,
            channel_mults=tuple(m.channel_mults) if m else (1, 2, 4),
            attn_levels=tuple(m.attn_levels) if m else (1, 2),
            num_heads=m.get("num_heads", 8) if m else 8,
            text_dim=m.get("text_dim", 768) if m else 768,
        ))
        if args.clap_dir:
            # CLAP text conditioning knob (single pooled token; the
            # ClapText context protocol, controllable_diffusion.py:354)
            text_emb = clap_context(model.cfg.text_dim)
        elif args.t5_dir:
            # on-device flax T5 conditioning (reference loads torch
            # t5-base on the host, audioldm_inference.py:60-61); weights
            # via `bins/convert_checkpoint.py --model t5_encoder`
            from amphion_tpu.modules.t5 import T5Config, T5Encoder
            from amphion_tpu.text.t5_tokenize import t5_tokenize

            t5_tree, _, _ = CheckpointManager(args.t5_dir).restore_raw()
            t5_params = t5_tree["params"]
            tcfg = m.get("t5", None) if m else None
            t5_mod = T5Encoder(T5Config(**dict(tcfg)) if tcfg else T5Config())
            ids, tok_mask = t5_tokenize([args.text])
            text_emb = encode_text(
                [args.text], model.cfg.text_dim, "t5_native",
                t5=(t5_mod, t5_params), token_ids=ids, token_mask=tok_mask)
        else:
            text_emb = encode_text(
                [args.text], model.cfg.text_dim,
                m.get("text_backend", "auto") if m else "auto",
            )
        z = audioldm_sample(
            model, params, text_emb,
            (1, lt, lf, vae.cfg.latent_channels), jax.random.key(args.seed),
            num_steps=args.num_steps, guidance_scale=args.guidance_scale,
        )
    decode = jax.jit(lambda prm, z: vae.apply(
        {"params": prm}, z, method=AutoencoderKL.decode))
    img = decode(vae_params, z)  # (1, T, F, 1)
    mel = jnp.transpose(img[..., 0], (0, 2, 1))[:, : mel_cfg.n_mel,
                                                :args.duration_frames]
    wav = np.asarray(mel_to_audio(mel, mel_cfg))
    save_wav(args.output_path, wav[0], p.sample_rate)
    logger.info(
        f"wrote {args.output_path} ({wav.shape[1] / p.sample_rate:.2f}s)"
    )


if __name__ == "__main__":
    main()
