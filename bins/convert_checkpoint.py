"""Checkpoint-ingestion CLI: reference torch/safetensors weights → our
orbax checkpoint layout (reference pull sites:
`models/tts/maskgct/maskgct_inference.py:33-64` downloads per-component
safetensors; `models/vc/vevo/vevo_utils.py:46-175` loads .bin/.safetensors
per component).

Usage — single component:
    python -m bins.convert_checkpoint --model maskgct_t2s \\
        --input /weights/t2s_model/model.safetensors --output ckpts/t2s
    # architecture kwargs default to the reference's published config;
    # override any with --kw num_layers=12 --kw strides="(2,4,5,8)"

Usage — whole pipeline bundle (reference HF-snapshot directory layout):
    python -m bins.convert_checkpoint --bundle maskgct \\
        --input /weights/MaskGCT --output ckpts/maskgct_pretrained

The output is a standard checkpoint dir (``epoch-0000_step-0000000_...``)
that `CheckpointManager.restore_raw` / the pipelines' ``--weights_dir``
flags load directly. Vocoder generators are wrapped as ``{"g": {"params"}}``
to match the GAN trainer's state layout; everything else as ``{"params"}``.
"""

from __future__ import annotations

import argparse
import ast
import json
import sys
from pathlib import Path

import numpy as np

from amphion_tpu.utils import convert as C
from amphion_tpu.utils.logging import get_logger

logger = get_logger("convert_ckpt")


# ---------------------------------------------------------------------------
# Registry: model key -> (converter, default kwargs, tree wrapper)
# Defaults mirror the reference's published configs (cited per entry).
# ---------------------------------------------------------------------------

def _wrap_params(p):
    return {"params": p}


def _wrap_gan(p):
    return {"g": {"params": p}}


_MODELS = {
    # -- MaskGCT stack (ref models/tts/maskgct/config/maskgct.json) ---------
    "maskgct_t2s": dict(fn=C.maskgct_t2s_to_flax,
                        defaults={"num_layers": 16}, wrap=_wrap_params),
    "maskgct_s2a_1layer": dict(
        fn=C.maskgct_s2a_to_flax,
        defaults={"num_layers": 16, "num_quantizers": 1}, wrap=_wrap_params),
    "maskgct_s2a_full": dict(
        fn=C.maskgct_s2a_to_flax,
        defaults={"num_layers": 16, "num_quantizers": 12}, wrap=_wrap_params),
    "maskgct_semantic_codec": dict(
        fn=C.repcodec_to_flax,
        defaults={"num_layers": 12}, wrap=_wrap_params),
    "amphion_codec_encoder": dict(
        fn=C.torch_codec_encoder_to_flax,
        defaults={"strides": (3, 4, 5, 8)}, wrap=_wrap_params),
    "amphion_codec_decoder": dict(
        fn=C.torch_codec_decoder_to_flax,
        defaults={"up_ratios": (8, 5, 4, 3)}, wrap=_wrap_params),
    # full codec from the reference two-file layout (dir input:
    # model.safetensors = encoder, model_1.safetensors = decoder+quantizer)
    # published MaskGCT acoustic codec: Vocos-head decoder, 12 FVQ levels
    "amphion_codec": dict(
        fn=None, raw_path=True,
        defaults={"strides": (3, 4, 5, 8), "num_quantizers": 12,
                  "use_vocos_decoder": True, "vocos_num_layers": 30},
        wrap=_wrap_params),
    # -- Vevo stack (ref models/vc/vevo/config/*.json) -----------------------
    "vevo_ar": dict(fn=C.vevo_ar_to_flax,
                    defaults={"num_layers": 12}, wrap=_wrap_params),
    "vevo_fmt": dict(fn=C.vevo_fmt_to_flax,
                     defaults={"num_layers": 16}, wrap=_wrap_params),
    "vevo_repcodec": dict(fn=C.vevo_repcodec_to_flax, defaults={},
                          wrap=_wrap_params),
    "metis_stage1": dict(fn=C.metis_stage1_to_flax,
                         defaults={"num_layers": 16}, wrap=_wrap_params),
    "debatts_t2s": dict(fn=C.debatts_t2s_to_flax,
                        defaults={"num_layers": 16}, wrap=_wrap_params),
    # -- SSL encoders (HF checkpoints) ---------------------------------------
    "w2v_bert": dict(fn=C.hf_w2v_bert_to_flax,
                     defaults={"num_layers": 24}, wrap=_wrap_params),
    "hubert": dict(fn=C.hf_hubert_to_flax,
                   defaults={"num_layers": 24}, wrap=_wrap_params),
    # microsoft/wavlm-base-(plus-)sv: speaker-verification x-vector model
    "wavlm_sv": dict(fn=C.hf_wavlm_sv_to_flax,
                     defaults={"num_layers": 12}, wrap=_wrap_params),
    # ref evaluation/metrics/similarity: pretrained/rawnet3/model.pt
    "rawnet3": dict(fn=C.torch_rawnet3_to_flax,
                    defaults={"model_scale": 8}, wrap=_wrap_params),
    # resemblyzer VoiceEncoder pretrained.pt (GE2E d-vector)
    "ge2e": dict(fn=C.torch_ge2e_to_flax,
                 defaults={"num_layers": 3}, wrap=_wrap_params),
    # torchvggish pytorch_vggish.pth — FAD embedder
    # (ref evaluation/metrics/spectrogram/frechet_distance.py:19-27)
    "vggish": dict(fn=C.torch_vggish_to_flax, defaults={},
                   wrap=_wrap_params),
    "fairseq_hubert": dict(fn=C.fairseq_hubert_to_flax,
                           defaults={"num_layers": 24}, wrap=_wrap_params),
    "llama": dict(fn=C.hf_llama_to_flax,
                  defaults={"num_layers": 12}, wrap=_wrap_params),
    # -- TTS models -----------------------------------------------------------
    "valle": dict(fn=C.valle_ref_to_flax,
                  defaults={"num_layers": 12, "num_quantizers": 8},
                  wrap=_wrap_params),
    "fastspeech2": dict(fn=C.torch_fastspeech2_to_flax,
                        defaults={"enc_layers": 4, "dec_layers": 6},
                        wrap=_wrap_params),
    "vits": dict(fn=C.torch_vits_to_flax, defaults={}, wrap=_wrap_params),
    "vits_svc": dict(fn=C.vits_svc_to_flax, defaults={}, wrap=_wrap_params),
    "jets": dict(fn=C.torch_jets_to_flax,
                 defaults={"enc_layers": 4, "dec_layers": 4,
                           "upsample_rates": (8, 8),
                           "resblock_kernel_sizes": (3, 7, 11)},
                 wrap=_wrap_params),
    "ns2_prior": dict(fn=C.ns2_prior_encoder_to_flax,
                      defaults={"enc_layers": 6, "predictor_layers": 10},
                      wrap=_wrap_params),
    "noro": dict(fn=C.noro_to_flax,
                 defaults={"ref_layers": 2, "wavenet_layers": 12},
                 wrap=_wrap_params),
    # -- Codecs ---------------------------------------------------------------
    "facodec_encoder": dict(fn=C.facodec_encoder_to_flax,
                            defaults={"up_ratios": (2, 4, 5, 5)},
                            wrap=_wrap_params),
    "facodec_decoder": dict(fn=C.facodec_decoder_to_flax,
                            defaults={"up_ratios": (5, 5, 4, 2)},
                            wrap=_wrap_params),
    "facodec_redecoder": dict(fn=C.facodec_redecoder_to_flax,
                              defaults={"up_ratios": (5, 5, 4, 2)},
                              wrap=_wrap_params),
    "speechtokenizer": dict(fn=C.speechtokenizer_to_flax,
                            defaults={"strides": (2, 4, 5, 8)},
                            wrap=_wrap_params),
    # facebook/encodec_24khz (transformers EncodecModel state-dict names)
    # — the reference VALL-E's tokenizer (utils/tokenizer.py:18)
    "encodec": dict(fn=C.hf_encodec_to_flax,
                    defaults={"ratios": (8, 5, 4, 2), "n_q": 8},
                    wrap=_wrap_params),
    # t5-base encoder (HF T5EncoderModel) — the frozen TTA text
    # conditioner (ref models/tta/ldm/audioldm_trainer.py:42); pass
    # --kw gated=True for t5-v1.1 checkpoints
    "t5_encoder": dict(fn=C.hf_t5_encoder_to_flax,
                       defaults={"num_layers": 12}, wrap=_wrap_params),
    # open_clip CLAP text tower (the reference PicoAudio's ClapText
    # conditioning; ref .../audioldm/clap/open_clip/model.py:476-497) —
    # pass the CLAP checkpoint's state dict; DDP `module.` prefixes OK
    "clap_text": dict(fn=C.clap_text_to_flax,
                      defaults={"num_layers": 12}, wrap=_wrap_params),
    "dualcodec": dict(fn=C.dualcodec_to_flax,
                      defaults={"strides": (2, 4, 5, 8), "n_codebooks": 8,
                                "convnext_layers": 12}, wrap=_wrap_params),
    "coco": dict(fn=C.coco_to_flax, defaults={}, wrap=_wrap_params),
    # -- Vocoders (GAN state layout) ------------------------------------------
    "hifigan": dict(fn=C.torch_hifigan_to_flax,
                    defaults={"num_upsamples": 4, "num_kernels": 3},
                    wrap=_wrap_gan),
    "bigvgan": dict(fn=C.torch_bigvgan_to_flax,
                    defaults={"num_upsamples": 6, "num_kernels": 3,
                              "resblock_kernel_sizes": (3, 7, 11)},
                    wrap=_wrap_gan),
    "nsf_hifigan": dict(fn=C.torch_nsf_hifigan_to_flax,
                        defaults={"upsample_rates": (8, 8, 2, 2),
                                  "resblock_kernel_sizes": (3, 7, 11)},
                        wrap=_wrap_gan),
    "melgan": dict(fn=C.torch_melgan_to_flax,
                   defaults={"upsample_rates": (8, 8, 2, 2)}, wrap=_wrap_gan),
    "apnet": dict(fn=C.torch_apnet_to_flax, defaults={}, wrap=_wrap_gan),
    "vocos": dict(fn=C.torch_vocos_to_flax,
                  defaults={"num_layers": 8}, wrap=_wrap_gan),
    "diffwave": dict(fn=C.torch_diffwave_to_flax,
                     defaults={"num_layers": 30}, wrap=_wrap_params),
    "wavenet": dict(fn=C.torch_wavenet_to_flax,
                    defaults={"layers": 24,
                              "upsample_scales": (4, 4, 4, 4)},
                    wrap=_wrap_params),
    "waveglow": dict(fn=C.torch_waveglow_to_flax,
                     defaults={"n_flows": 12, "n_layers": 8},
                     wrap=_wrap_params),
    # -- TTA ------------------------------------------------------------------
    "audioldm_unet": dict(fn=C.audioldm_unet_to_flax,
                          defaults={"channel_mults": (1, 2, 3, 5),
                                    "num_res_blocks": 2,
                                    "attention_resolutions": (8, 4, 2),
                                    "transformer_depth": 1},
                          wrap=_wrap_params),
    "autoencoder_kl": dict(fn=C.autoencoder_kl_to_flax,
                           defaults={"channel_mults": (1, 2, 4)},
                           wrap=_wrap_params),
    # -- ONNX-shipped reference components (utils/onnx_reader.py) ------------
    # UVR-MDX separator (ref preprocessors/Emilia/models/separate_fast.py:60)
    "mdx_net": dict(fn=None, onnx="mdx_net", defaults={}, wrap=_wrap_params),
    # DNSMOS P.835 quality CNN (ref preprocessors/Emilia/models/dnsmos.py:46)
    "dnsmos": dict(fn=None, onnx="dnsmos", defaults={}, wrap=_wrap_params),
}

# Bundles: reference pretrained-snapshot directory layouts → per-component
# conversions. Each entry: component name -> (model key, candidate relative
# paths inside the snapshot).
_BUNDLES = {
    # ref maskgct_inference.py:33-64 (hf snapshot amphion/MaskGCT)
    "maskgct": {
        "semantic_codec": ("maskgct_semantic_codec",
                           ["semantic_codec/model.safetensors"]),
        "acoustic_codec": ("amphion_codec", ["acoustic_codec"]),
        "t2s": ("maskgct_t2s", ["t2s_model/model.safetensors"]),
        "s2a_1layer": ("maskgct_s2a_1layer",
                       ["s2a_model/s2a_model_1layer/model.safetensors"]),
        "s2a_full": ("maskgct_s2a_full",
                     ["s2a_model/s2a_model_full/model.safetensors"]),
    },
    # ref vevo_utils.py:46-175 (hf snapshot amphion/Vevo)
    "vevo": {
        "content_tokenizer": ("vevo_repcodec",
                              ["tokenizer/vq32/hubert_large_l18_c32.pkl",
                               "tokenizer/vq32/model.safetensors"]),
        "content_style_tokenizer": ("vevo_repcodec",
                                    ["tokenizer/vq8192/model.safetensors"]),
        "ar": ("vevo_ar",
               ["contentstyle_modeling/Vq32ToVq8192/model.safetensors",
                "ar/model.safetensors"]),
        "fmt": ("vevo_fmt",
                ["acoustic_modeling/Vq8192ToMels/model.safetensors",
                 "fmt/model.safetensors"]),
        "vocoder": ("vocos", ["acoustic_modeling/Vocoder/model.safetensors",
                              "vocoder/model.safetensors"]),
    },
}


def _load_state_dict(path: Path) -> dict[str, np.ndarray]:
    if path.is_dir():
        # HF layout: one or more .safetensors / pytorch_model.bin
        st = sorted(path.glob("*.safetensors"))
        if st:
            sd = {}
            for f in st:
                sd.update(C.load_safetensors(f))
            return sd
        bins = sorted(path.glob("*.bin")) + sorted(path.glob("*.pt")) + \
            sorted(path.glob("*.pth"))
        if not bins:
            raise FileNotFoundError(f"no weights found under {path}")
        sd = {}
        for f in bins:
            sd.update(C.load_torch_checkpoint(f))
        return sd
    if path.suffix == ".safetensors":
        return C.load_safetensors(path)
    return C.load_torch_checkpoint(path)


def _save_tree(tree, out_dir: Path) -> Path:
    import orbax.checkpoint as ocp

    out_dir.mkdir(parents=True, exist_ok=True)
    dest = out_dir / "epoch-0000_step-0000000_loss-0.000000"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(dest.resolve(), tree, force=True)
    return dest


def _parse_kw(pairs: list[str]) -> dict:
    out = {}
    for pair in pairs:
        k, _, v = pair.partition("=")
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def _convert_amphion_codec(path: Path, **kw) -> dict:
    """Reference acoustic-codec dir (model.safetensors = encoder,
    model_1.safetensors = decoder + quantizer) → full AmphionCodec params."""
    def first(*names):
        for n in names:
            if (path / n).exists():
                return _load_state_dict(path / n)
        raise FileNotFoundError(f"none of {names} under {path}")

    enc = first("model.safetensors", "encoder.safetensors", "encoder.bin")
    dec = first("model_1.safetensors", "decoder.safetensors", "decoder.bin")
    return C.amphion_codec_to_flax(enc, dec, **kw)


def _convert_onnx(kind: str, path: Path, **kw):
    """ONNX-shipped reference components: parse initializers with the
    native reader and map them onto the flax architectures."""
    from amphion_tpu.utils.onnx_reader import read_onnx

    graph = read_onnx(path)
    if kind == "mdx_net":
        from amphion_tpu.models.mdx_net import MDXConfig, onnx_to_conv_tdf

        variables = onnx_to_conv_tdf(graph, MDXConfig(**kw))
        return variables["params"], variables["batch_stats"]
    if kind == "dnsmos":
        from amphion_tpu.models.dnsmos import DNSMOSConfig, onnx_to_dnsmos

        return onnx_to_dnsmos(graph, DNSMOSConfig(**kw))
    raise ValueError(kind)


def convert_one(model: str, input_path: Path, output_dir: Path,
                kw: dict | None = None) -> Path:
    spec = _MODELS[model]
    kwargs = {**spec["defaults"], **(kw or {})}
    if spec.get("onnx"):
        sd = {}
        params = _convert_onnx(spec["onnx"], input_path, **kwargs)
    elif spec.get("raw_path"):
        sd = {}
        params = _convert_amphion_codec(input_path, **kwargs)
    else:
        sd = _load_state_dict(input_path)
        params = spec["fn"](sd, **kwargs)
    if isinstance(params, tuple):  # (params, batch_stats): wavernn, rawnet3
        tree = {**spec["wrap"](params[0]), "batch_stats": params[1]}
        params = params[0]
    else:
        tree = spec["wrap"](params)
    dest = _save_tree(tree, output_dir)
    n = sum(int(np.prod(p.shape))
            for p in __import__("jax").tree_util.tree_leaves(params))
    logger.info(f"{model}: {len(sd)} torch tensors -> {n / 1e6:.1f}M params "
                f"at {dest}")
    return dest


def convert_bundle(bundle: str, input_dir: Path, output_dir: Path,
                   kw_json: str = "") -> dict:
    per_component_kw = json.loads(kw_json) if kw_json else {}
    manifest = {}
    for comp, (model, rels) in _BUNDLES[bundle].items():
        src = next((input_dir / r for r in rels if (input_dir / r).exists()),
                   None)
        if src is None:
            logger.warning(f"{comp}: none of {rels} under {input_dir}; "
                           "skipped")
            continue
        dest = convert_one(model, src, output_dir / comp,
                           per_component_kw.get(comp))
        manifest[comp] = str(dest)
    (output_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    logger.info(f"bundle {bundle}: {len(manifest)} components -> "
                f"{output_dir}/manifest.json")
    return manifest


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--model", choices=sorted(_MODELS),
                        help="single-component conversion")
    parser.add_argument("--bundle", choices=sorted(_BUNDLES),
                        help="whole-pipeline snapshot conversion")
    parser.add_argument("--input", required=True,
                        help="torch .pt/.bin/.safetensors file or dir")
    parser.add_argument("--output", required=True, help="output ckpt dir")
    parser.add_argument("--kw", action="append", default=[],
                        help="architecture kwarg override, key=value "
                             "(value parsed as a python literal)")
    parser.add_argument("--bundle_kw_json", default="",
                        help="bundle mode: JSON {component: {kwargs}}")
    args = parser.parse_args()
    if bool(args.model) == bool(args.bundle):
        parser.error("exactly one of --model / --bundle required")
    if args.model:
        convert_one(args.model, Path(args.input), Path(args.output),
                    _parse_kw(args.kw))
    else:
        convert_bundle(args.bundle, Path(args.input), Path(args.output),
                       args.bundle_kw_json)


if __name__ == "__main__":
    main()
