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
