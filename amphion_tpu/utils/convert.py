"""Weight conversion: torch/safetensors checkpoints → flax parameter pytrees.

A first-class deliverable (SURVEY §7 'Hard parts'): the reference's
zero-shot pipelines pull torch safetensors from HF Hub
(`models/tts/maskgct/maskgct_inference.py:33-64`); running them here
requires mapping those tensors onto our flax modules.

Conventions handled:
- Linear: torch (out, in) → flax Dense kernel (in, out)  [transpose]
- Conv1d: torch (out, in, k) → flax Conv (k, in, out)
- ConvTranspose1d: torch (in, out, k) → flax (k, in, out) w/ flipped kernel
- Embedding: direct
- LayerNorm/RMSNorm: weight→scale, bias→bias
- HF Llama blocks → `amphion_tpu.modules.llama` naming
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping

import numpy as np


def load_safetensors(path: str | Path) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return dict(load_file(str(path)))


def load_torch_checkpoint(path: str | Path) -> dict[str, np.ndarray]:
    import torch

    state = torch.load(str(path), map_location="cpu", weights_only=True)
    if "state_dict" in state:
        state = state["state_dict"]
    if "model" in state and isinstance(state["model"], dict):
        state = state["model"]
    return {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}


def linear_to_dense(w: np.ndarray, b: np.ndarray | None = None) -> dict:
    out = {"kernel": np.ascontiguousarray(w.T)}
    if b is not None:
        out["bias"] = b
    return out


def conv1d_to_flax(w: np.ndarray, b: np.ndarray | None = None) -> dict:
    # torch (out, in, k) → flax (k, in, out)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0)))}
    if b is not None:
        out["bias"] = b
    return out


def convtranspose1d_to_flax(w: np.ndarray, b: np.ndarray | None = None) -> dict:
    # torch (in, out, k) → flax ConvTranspose (k, in, out); torch's
    # transposed conv correlates with a flipped kernel relative to flax
    k = np.ascontiguousarray(np.transpose(w[:, :, ::-1], (2, 0, 1)))
    out = {"kernel": k}
    if b is not None:
        out["bias"] = b
    return out


def embedding_to_flax(w: np.ndarray) -> dict:
    return {"embedding": w}


def hf_llama_layer_to_flax(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """Map one HF ``model.layers.N`` block onto `LlamaBlock` params."""
    g = lambda name: np.asarray(sd[f"{prefix}.{name}"])
    return {
        "input_norm": {"scale": g("input_layernorm.weight")},
        "post_norm": {"scale": g("post_attention_layernorm.weight")},
        "attn": {
            "q_proj": linear_to_dense(g("self_attn.q_proj.weight")),
            "k_proj": linear_to_dense(g("self_attn.k_proj.weight")),
            "v_proj": linear_to_dense(g("self_attn.v_proj.weight")),
            "o_proj": linear_to_dense(g("self_attn.o_proj.weight")),
        },
        "mlp": {
            "gate_proj": linear_to_dense(g("mlp.gate_proj.weight")),
            "up_proj": linear_to_dense(g("mlp.up_proj.weight")),
            "down_proj": linear_to_dense(g("mlp.down_proj.weight")),
        },
    }


def hf_llama_to_flax(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """Full HF LlamaModel state dict → `LlamaDecoder`/`LlamaEncoder` params
    (token embedding and lm_head, if present, returned under their own keys)."""
    params: dict = {}
    for i in range(num_layers):
        params[f"layer_{i}"] = hf_llama_layer_to_flax(sd, f"model.layers.{i}")
    if "model.norm.weight" in sd:
        params["final_norm"] = {"scale": np.asarray(sd["model.norm.weight"])}
    out = {"decoder": params}
    if "model.embed_tokens.weight" in sd:
        out["embed_tokens"] = embedding_to_flax(
            np.asarray(sd["model.embed_tokens.weight"])
        )
    if "lm_head.weight" in sd:
        out["lm_head"] = linear_to_dense(np.asarray(sd["lm_head.weight"]))
    return out


def torch_weight_norm_to_flax(
    w_g: np.ndarray, w_v: np.ndarray, kind: str = "conv1d", b: np.ndarray | None = None
) -> dict:
    """torch weight_norm (g, v) pair → flax WeightNorm wrapper params.

    flax stores the direction inside the wrapped layer and a per-feature
    scale; torch's g has shape (out, 1, 1). We fold: kernel = v (converted),
    scale = g flattened."""
    if kind == "conv1d":
        inner = conv1d_to_flax(w_v, b)
    elif kind == "convtranspose1d":
        inner = convtranspose1d_to_flax(w_v, b)
    else:
        inner = linear_to_dense(w_v, b)
    # normalize the kernel along all-but-feature axes like flax does
    kernel = inner["kernel"]
    norm = np.sqrt(
        np.sum(kernel**2, axis=tuple(range(kernel.ndim - 1)), keepdims=False)
    )
    scale = w_g.reshape(-1)
    return {"layer": inner, "scale": scale / np.maximum(norm, 1e-12)}


def conv2d_to_flax(w: np.ndarray, b: np.ndarray | None = None) -> dict:
    """torch Conv2d (O, I, kH, kW) → flax (kH, kW, I, O)."""
    out = {"kernel": np.transpose(np.asarray(w), (2, 3, 1, 0))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def wenet_conformer_to_flax(sd, num_layers: int, hidden: int) -> dict:
    """WeNet conformer-encoder state dict → `modules/conformer.py` pytree.

    Maps the reference extractor's checkpoints
    (`modules/wenet_extractor/transformer/encoder.py` naming:
    `encoder.embed.*`, `encoder.encoders.{i}.{self_attn,conv_module,
    feed_forward,feed_forward_macaron,norm_*}`) onto ConformerEncoder."""

    def t(name):
        return np.asarray(sd[name])

    def dense(prefix):
        out = {"kernel": t(f"{prefix}.weight").T}
        if f"{prefix}.bias" in sd:
            out["bias"] = t(f"{prefix}.bias")
        return out

    def ln(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    p = "encoder"
    out = {
        "embed": {
            "conv0": conv2d_to_flax(t(f"{p}.embed.conv.0.weight"),
                                    t(f"{p}.embed.conv.0.bias")),
            "conv1": conv2d_to_flax(t(f"{p}.embed.conv.2.weight"),
                                    t(f"{p}.embed.conv.2.bias")),
            "out": dense(f"{p}.embed.out.0"),
        }
    }
    for i in range(num_layers):
        q = f"{p}.encoders.{i}"
        blk = {
            "norm_ff_macaron": ln(f"{q}.norm_ff_macaron"),
            "ffn_macaron_w1": dense(f"{q}.feed_forward_macaron.w_1"),
            "ffn_macaron_w2": dense(f"{q}.feed_forward_macaron.w_2"),
            "norm_mha": ln(f"{q}.norm_mha"),
            "self_attn": {
                "linear_q": dense(f"{q}.self_attn.linear_q"),
                "linear_k": dense(f"{q}.self_attn.linear_k"),
                "linear_v": dense(f"{q}.self_attn.linear_v"),
                "linear_out": dense(f"{q}.self_attn.linear_out"),
                "linear_pos": {"kernel": t(f"{q}.self_attn.linear_pos.weight").T},
                "pos_bias_u": t(f"{q}.self_attn.pos_bias_u"),
                "pos_bias_v": t(f"{q}.self_attn.pos_bias_v"),
            },
            "norm_conv": ln(f"{q}.norm_conv"),
            "conv_module": {
                "pointwise_conv1": {
                    "kernel": t(f"{q}.conv_module.pointwise_conv1.weight")[..., 0].T,
                    "bias": t(f"{q}.conv_module.pointwise_conv1.bias"),
                },
                # torch depthwise Conv1d (D, 1, K) → flax (K, 1, D)
                "depthwise_conv": {
                    "kernel": np.transpose(
                        t(f"{q}.conv_module.depthwise_conv.weight"), (2, 1, 0)
                    ),
                    "bias": t(f"{q}.conv_module.depthwise_conv.bias"),
                },
                "norm": ln(f"{q}.conv_module.norm"),
                "pointwise_conv2": {
                    "kernel": t(f"{q}.conv_module.pointwise_conv2.weight")[..., 0].T,
                    "bias": t(f"{q}.conv_module.pointwise_conv2.bias"),
                },
            },
            "norm_ff": ln(f"{q}.norm_ff"),
            "ffn_w1": dense(f"{q}.feed_forward.w_1"),
            "ffn_w2": dense(f"{q}.feed_forward.w_2"),
            "norm_final": ln(f"{q}.norm_final"),
        }
        out[f"layers_{i}"] = blk
    return out
