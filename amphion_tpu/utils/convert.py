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

    try:
        state = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        # fairseq checkpoints pickle their omegaconf config next to the
        # weights; fall back to a full unpickle for local trusted files
        state = torch.load(str(path), map_location="cpu", weights_only=False)
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

    torch normalizes v over all dims except dim 0 (for ConvTranspose1d that
    is the *input*-channel dim), flax over all-but-feature (always output).
    The robust mapping is to materialize the effective torch weight
    w = g * v / ||v||_dim0, convert its layout, and set the flax scale to
    the per-feature norm of the converted kernel — flax then reproduces w
    bit-for-bit (scale * kernel / ||kernel||)."""
    v = np.asarray(w_v, np.float64)
    norm_v = np.sqrt(np.sum(v**2, axis=tuple(range(1, v.ndim)), keepdims=True))
    w_eff = (np.asarray(w_g, np.float64) * v / np.maximum(norm_v, 1e-12))
    w_eff = w_eff.astype(w_v.dtype)
    if kind == "conv1d":
        inner = conv1d_to_flax(w_eff, b)
    elif kind == "convtranspose1d":
        inner = convtranspose1d_to_flax(w_eff, b)
    else:
        inner = linear_to_dense(w_eff, b)
    kernel = inner["kernel"]
    scale = np.sqrt(
        np.sum(np.asarray(kernel, np.float64) ** 2,
               axis=tuple(range(kernel.ndim - 1)))
    ).astype(kernel.dtype)
    return {"layer": inner, "scale": scale}


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
            # WeNet flattens (C, F') channel-major (encoder embed:
            # x.transpose(1,2).view(b,t,c*f)); our NHWC flatten is
            # freq-major — permute the linear's input columns
            "out": (lambda w, b: {
                "kernel": np.ascontiguousarray(
                    w.reshape(w.shape[0], hidden, -1)
                    .transpose(2, 1, 0).reshape(-1, w.shape[0])),
                "bias": b,
            })(t(f"{p}.embed.out.0.weight"), t(f"{p}.embed.out.0.bias")),
        },
        "after_norm": ln(f"{p}.after_norm"),
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


def torch_hifigan_to_flax(sd: Mapping[str, np.ndarray], *,
                          num_upsamples: int, num_kernels: int,
                          resblock: str = "1",
                          dilations_per_block: int = 3) -> dict:
    """Reference HiFiGAN generator state dict → `HiFiGANGenerator` params.

    Torch layout (ref models/vocoders/gan/generator/hifigan.py:151):
    conv_pre, ups.{i} (weight-normed ConvTranspose1d), resblocks.{i*K+j}
    with convs1/convs2 (V1) or convs (V2-style ResBlock2), conv_post.
    Ours (amphion_tpu/models/vocoders/hifigan.py): Conv_0 (pre),
    ConvTranspose_{i}, ResBlock{1,2}_{idx} with interleaved Conv_{2j}
    (dilated) / Conv_{2j+1} (undilated), Conv_1 (post); flax WeightNorm
    scales live in per-scope 'WeightNorm_k' collections.
    """
    g = lambda name: np.asarray(sd[name])

    def wn(prefix: str, kind: str) -> dict:
        return torch_weight_norm_to_flax(
            g(f"{prefix}.weight_g"), g(f"{prefix}.weight_v"), kind,
            g(f"{prefix}.bias") if f"{prefix}.bias" in sd else None)

    params: dict = {}
    pre = wn("conv_pre", "conv1d")
    params["Conv_0"] = pre["layer"]
    params["WeightNorm_0"] = {"Conv_0/kernel/scale": pre["scale"]}
    for i in range(num_upsamples):
        up = wn(f"ups.{i}", "convtranspose1d")
        params[f"ConvTranspose_{i}"] = up["layer"]
        params[f"WeightNorm_{i + 1}"] = {
            f"ConvTranspose_{i}/kernel/scale": up["scale"]}
    block_name = "ResBlock1" if resblock == "1" else "ResBlock2"
    for idx in range(num_upsamples * num_kernels):
        bp: dict = {}
        if resblock == "1":
            for j in range(dilations_per_block):
                c1 = wn(f"resblocks.{idx}.convs1.{j}", "conv1d")
                c2 = wn(f"resblocks.{idx}.convs2.{j}", "conv1d")
                bp[f"Conv_{2 * j}"] = c1["layer"]
                bp[f"WeightNorm_{2 * j}"] = {
                    f"Conv_{2 * j}/kernel/scale": c1["scale"]}
                bp[f"Conv_{2 * j + 1}"] = c2["layer"]
                bp[f"WeightNorm_{2 * j + 1}"] = {
                    f"Conv_{2 * j + 1}/kernel/scale": c2["scale"]}
        else:
            for j in range(dilations_per_block):
                c = wn(f"resblocks.{idx}.convs.{j}", "conv1d")
                bp[f"Conv_{j}"] = c["layer"]
                bp[f"WeightNorm_{j}"] = {f"Conv_{j}/kernel/scale": c["scale"]}
        params[f"{block_name}_{idx}"] = bp
    post = wn("conv_post", "conv1d")
    params["Conv_1"] = post["layer"]
    params[f"WeightNorm_{num_upsamples + 1}"] = {
        "Conv_1/kernel/scale": post["scale"]}
    return params


def _wn_materialize(w_g: np.ndarray, w_v: np.ndarray) -> np.ndarray:
    """Effective torch weight-norm weight g * v / ||v|| (norm over all
    dims except 0)."""
    v = np.asarray(w_v, np.float64)
    n = np.sqrt(np.sum(v ** 2, axis=tuple(range(1, v.ndim)), keepdims=True))
    return (np.asarray(w_g, np.float64) * v / np.maximum(n, 1e-12)).astype(
        w_v.dtype)


def torch_wavenet_to_flax(sd: Mapping[str, np.ndarray], *,
                          layers: int,
                          upsample_scales: tuple[int, ...]) -> dict:
    """Reference WaveNet state dict → our `WaveNetVocoder` params.

    Torch layout (ref models/vocoders/autoregressive/wavenet/wavenet.py:38):
    weight-normed `first_conv`, per-layer `conv_layers.{i}.{conv,conv1x1c,
    conv1x1_out,conv1x1_skip}`, head `last_conv_layers.{1,3}`, and the
    `upsample_net` (plain conv_in + weight-normed smoothing conv2ds).
    Weight norms are materialized into plain convs."""
    g = lambda name: np.asarray(sd[name])

    def wn1d(prefix: str) -> dict:
        w = _wn_materialize(g(f"{prefix}.weight_g"), g(f"{prefix}.weight_v"))
        b = g(f"{prefix}.bias") if f"{prefix}.bias" in sd else None
        return conv1d_to_flax(w, b)

    up: dict = {"conv_in": conv1d_to_flax(g("upsample_net.conv_in.weight"))}
    for j in range(len(upsample_scales)):
        p = f"upsample_net.upsample.up_layers.{2 * j + 1}"
        w = _wn_materialize(g(f"{p}.weight_g"), g(f"{p}.weight_v"))
        up[f"up_conv_{j}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    params: dict = {"upsample": up, "first_conv": wn1d("first_conv")}
    for i in range(layers):
        p = f"conv_layers.{i}"
        params[f"dil_{i}"] = wn1d(f"{p}.conv")
        params[f"cond_{i}"] = wn1d(f"{p}.conv1x1c")
        params[f"out_{i}"] = wn1d(f"{p}.conv1x1_out")
        params[f"skip_{i}"] = wn1d(f"{p}.conv1x1_skip")
    params["post1"] = wn1d("last_conv_layers.1")
    params["post2"] = wn1d("last_conv_layers.3")
    return params


def torch_gru_to_flax_cell(w_ih: np.ndarray, w_hh: np.ndarray,
                           b_ih: np.ndarray, b_hh: np.ndarray) -> dict:
    """torch nn.GRU layer weights → flax GRUCell params. torch stacks
    gates [r; z; n]; flax folds the two reset/update biases into the
    input dense (b_ir+b_hr) and keeps the candidate hidden bias on `hn`
    (both formulations put b_hn inside the r⊙(...) term)."""
    w_ir, w_iz, w_in = np.split(np.asarray(w_ih), 3, axis=0)
    w_hr, w_hz, w_hn = np.split(np.asarray(w_hh), 3, axis=0)
    b_ir, b_iz, b_in = np.split(np.asarray(b_ih), 3)
    b_hr, b_hz, b_hn = np.split(np.asarray(b_hh), 3)
    return {
        "ir": {"kernel": w_ir.T, "bias": b_ir + b_hr},
        "iz": {"kernel": w_iz.T, "bias": b_iz + b_hz},
        "in": {"kernel": w_in.T, "bias": b_in},
        "hr": {"kernel": w_hr.T},
        "hz": {"kernel": w_hz.T},
        "hn": {"kernel": w_hn.T, "bias": b_hn},
    }


def torch_wavernn_to_flax(sd: Mapping[str, np.ndarray], *,
                          res_blocks: int,
                          upsample_factors: tuple[int, ...]) -> tuple[dict, dict]:
    """Reference WaveRNN state dict → (params, batch_stats) for our
    `WaveRNNVocoder` (ref models/vocoders/autoregressive/wavernn/
    wavernn.py:98: UpsampleNetwork w/ MelResNet + smoothing conv2ds,
    I → rnn1/rnn2 (GRU) → fc1/fc2/fc3)."""
    g = lambda name: np.asarray(sd[name])

    def bn(prefix: str) -> tuple[dict, dict]:
        return ({"scale": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias")},
                {"mean": g(f"{prefix}.running_mean"),
                 "var": g(f"{prefix}.running_var")})

    rp = "upsample.resnet"
    resnet: dict = {"conv_in": conv1d_to_flax(g(f"{rp}.conv_in.weight"))}
    resnet_stats: dict = {}
    resnet["bn"], resnet_stats["bn"] = bn(f"{rp}.batch_norm")
    for i in range(res_blocks):
        blk: dict = {"conv1": conv1d_to_flax(g(f"{rp}.layers.{i}.conv1.weight")),
                     "conv2": conv1d_to_flax(g(f"{rp}.layers.{i}.conv2.weight"))}
        stats: dict = {}
        blk["bn1"], stats["bn1"] = bn(f"{rp}.layers.{i}.batch_norm1")
        blk["bn2"], stats["bn2"] = bn(f"{rp}.layers.{i}.batch_norm2")
        resnet[f"block_{i}"] = blk
        resnet_stats[f"block_{i}"] = stats
    resnet["conv_out"] = conv1d_to_flax(g(f"{rp}.conv_out.weight"),
                                        g(f"{rp}.conv_out.bias"))
    up: dict = {"resnet": resnet}
    for i in range(len(upsample_factors)):
        # up_layers alternate [stretch, conv]: convs sit at odd indices
        w = g(f"upsample.up_layers.{2 * i + 1}.weight")  # (1, 1, 1, k)
        up[f"up_conv_{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    params: dict = {
        "upsample": up,
        "I": linear_to_dense(g("I.weight"), g("I.bias")),
        "rnn1": torch_gru_to_flax_cell(
            g("rnn1.weight_ih_l0"), g("rnn1.weight_hh_l0"),
            g("rnn1.bias_ih_l0"), g("rnn1.bias_hh_l0")),
        "rnn2": torch_gru_to_flax_cell(
            g("rnn2.weight_ih_l0"), g("rnn2.weight_hh_l0"),
            g("rnn2.bias_ih_l0"), g("rnn2.bias_hh_l0")),
        "fc1": linear_to_dense(g("fc1.weight"), g("fc1.bias")),
        "fc2": linear_to_dense(g("fc2.weight"), g("fc2.bias")),
        "fc3": linear_to_dense(g("fc3.weight"), g("fc3.bias")),
    }
    batch_stats = {"upsample": {"resnet": resnet_stats}}
    return params, batch_stats


def torch_waveglow_to_flax(sd: Mapping[str, np.ndarray], *,
                           n_flows: int, n_layers: int) -> dict:
    """Reference WaveGlow state dict → our `WaveGlow` params.

    Torch layout (ref models/vocoders/flow/waveglow/waveglow.py:146):
    `upsample` (plain ConvTranspose1d), `convinv.{k}.conv` (1x1, no bias),
    `WN.{k}.{start,cond_layer,in_layers.{i},res_skip_layers.{i}}`
    (weight-normed) + plain zero-init `end`."""
    g = lambda name: np.asarray(sd[name])

    def wn(prefix: str) -> dict:
        return torch_weight_norm_to_flax(
            g(f"{prefix}.weight_g"), g(f"{prefix}.weight_v"), "conv1d",
            g(f"{prefix}.bias") if f"{prefix}.bias" in sd else None)

    params: dict = {"upsample": convtranspose1d_to_flax(
        g("upsample.weight"), g("upsample.bias"))}
    for k in range(n_flows):
        # y = x @ w in NLC ⇔ torch conv1d y_o = Σ_i W[o,i] x_i ⇒ w = W.T
        params[f"inv_{k}"] = {"w": g(f"convinv.{k}.conv.weight")[:, :, 0].T}
        wp: dict = {}
        s = wn(f"WN.{k}.start")
        wp["start"] = s["layer"]
        wp["WeightNorm_0"] = {"start/kernel/scale": s["scale"]}
        c = wn(f"WN.{k}.cond_layer")
        wp["cond"] = c["layer"]
        wp["WeightNorm_1"] = {"cond/kernel/scale": c["scale"]}
        for i in range(n_layers):
            a = wn(f"WN.{k}.in_layers.{i}")
            wp[f"in_{i}"] = a["layer"]
            wp[f"WeightNorm_{2 + 2 * i}"] = {f"in_{i}/kernel/scale": a["scale"]}
            r = wn(f"WN.{k}.res_skip_layers.{i}")
            wp[f"res_skip_{i}"] = r["layer"]
            wp[f"WeightNorm_{3 + 2 * i}"] = {
                f"res_skip_{i}/kernel/scale": r["scale"]}
        wp["end"] = conv1d_to_flax(g(f"WN.{k}.end.weight"),
                                   g(f"WN.{k}.end.bias"))
        params[f"wn_{k}"] = wp
    return params


def torch_nsf_hifigan_to_flax(sd: Mapping[str, np.ndarray], *,
                              upsample_rates: tuple[int, ...],
                              resblock_kernel_sizes: tuple[int, ...],
                              resblock: str = "1",
                              dilations_per_block: int = 3) -> dict:
    """Reference NSFHiFiGAN state dict → `NSFHiFiGANGenerator` params.

    Torch layout (ref models/vocoders/gan/generator/nsfhifigan.py:181):
    the HiFiGAN skeleton (conv_pre/ups/resblocks/conv_post, all
    weight-normed) plus plain-conv `noise_convs.{i}` and the
    `m_source.l_linear` harmonic merge."""
    num_ups = len(upsample_rates)
    num_kernels = len(resblock_kernel_sizes)
    params = torch_hifigan_to_flax(
        sd, num_upsamples=num_ups, num_kernels=num_kernels,
        resblock=resblock, dilations_per_block=dilations_per_block)
    block_name = "ResBlock1" if resblock == "1" else "ResBlock2"
    for i in range(num_ups):
        for j, ks in enumerate(resblock_kernel_sizes):
            params[f"res_{i}_{ks}"] = params.pop(
                f"{block_name}_{i * num_kernels + j}")
    for i in range(num_ups):
        params[f"noise_conv_{i}"] = conv1d_to_flax(
            np.asarray(sd[f"noise_convs.{i}.weight"]),
            np.asarray(sd[f"noise_convs.{i}.bias"]))
    params["source"] = {"merge": linear_to_dense(
        np.asarray(sd["m_source.l_linear.weight"]),
        np.asarray(sd["m_source.l_linear.bias"]))}
    return params


def torch_bigvgan_to_flax(sd: Mapping[str, np.ndarray], *,
                          num_upsamples: int, num_kernels: int,
                          resblock_kernel_sizes: tuple[int, ...],
                          dilations_per_block: int = 3,
                          snakebeta: bool = True) -> dict:
    """Reference BigVGAN generator state dict → `BigVGANGenerator` params.

    Torch layout (ref models/vocoders/gan/generator/bigvgan.py:232):
    conv_pre, ups.{i}.0 (nested ModuleList), resblocks.{i*K+j} AMPBlock1
    with convs1/convs2 + activations.{k}.act Snake(Beta) alphas,
    activation_post.act, conv_post. Ours: Conv_0/ConvTranspose_{i}/
    amp_{i}_{ks}/Conv_{2j},Conv_{2j+1} + SnakeBeta_{k}, final_act scope
    named SnakeBeta_0 at top level, Conv_1.
    """
    g = lambda name: np.asarray(sd[name])
    act = "SnakeBeta" if snakebeta else "Snake"

    def wn(prefix: str, kind: str) -> dict:
        return torch_weight_norm_to_flax(
            g(f"{prefix}.weight_g"), g(f"{prefix}.weight_v"), kind,
            g(f"{prefix}.bias") if f"{prefix}.bias" in sd else None)

    def snake(prefix: str) -> dict:
        out = {"alpha": g(f"{prefix}.alpha")}
        if f"{prefix}.beta" in sd:
            out["beta"] = g(f"{prefix}.beta")
        return out

    params: dict = {}
    pre = wn("conv_pre", "conv1d")
    params["Conv_0"] = pre["layer"]
    params["WeightNorm_0"] = {"Conv_0/kernel/scale": pre["scale"]}
    for i in range(num_upsamples):
        up = wn(f"ups.{i}.0", "convtranspose1d")
        params[f"ConvTranspose_{i}"] = up["layer"]
        params[f"WeightNorm_{i + 1}"] = {
            f"ConvTranspose_{i}/kernel/scale": up["scale"]}
    for i in range(num_upsamples):
        for j, ks in enumerate(resblock_kernel_sizes):
            idx = i * num_kernels + j
            bp: dict = {}
            for d in range(dilations_per_block):
                c1 = wn(f"resblocks.{idx}.convs1.{d}", "conv1d")
                c2 = wn(f"resblocks.{idx}.convs2.{d}", "conv1d")
                bp[f"Conv_{2 * d}"] = c1["layer"]
                bp[f"WeightNorm_{2 * d}"] = {
                    f"Conv_{2 * d}/kernel/scale": c1["scale"]}
                bp[f"Conv_{2 * d + 1}"] = c2["layer"]
                bp[f"WeightNorm_{2 * d + 1}"] = {
                    f"Conv_{2 * d + 1}/kernel/scale": c2["scale"]}
                bp[f"{act}_{2 * d}"] = snake(
                    f"resblocks.{idx}.activations.{2 * d}.act")
                bp[f"{act}_{2 * d + 1}"] = snake(
                    f"resblocks.{idx}.activations.{2 * d + 1}.act")
            params[f"amp_{i}_{ks}"] = bp
    params[f"{act}_0"] = snake("activation_post.act")
    post = wn("conv_post", "conv1d")
    params["Conv_1"] = post["layer"]
    params[f"WeightNorm_{num_upsamples + 1}"] = {
        "Conv_1/kernel/scale": post["scale"]}
    return params


def _codec_resunit(sd: Mapping[str, np.ndarray], prefix: str, wn) -> dict:
    """Reference amphion_codec ResidualUnit (snake, k7 conv, snake, k1 conv)
    → our ResidualUnit params (act1/act2 + Conv_0/Conv_1 + WeightNorms)."""
    c0 = wn(f"{prefix}.block.1", "conv1d")
    c1 = wn(f"{prefix}.block.3", "conv1d")
    return {
        "act1": {"alpha": np.asarray(sd[f"{prefix}.block.0.alpha"]).reshape(-1)},
        "Conv_0": c0["layer"],
        "WeightNorm_0": {"Conv_0/kernel/scale": c0["scale"]},
        "act2": {"alpha": np.asarray(sd[f"{prefix}.block.2.alpha"]).reshape(-1)},
        "Conv_1": c1["layer"],
        "WeightNorm_1": {"Conv_1/kernel/scale": c1["scale"]},
    }


def torch_codec_encoder_to_flax(sd: Mapping[str, np.ndarray], *,
                                strides: tuple[int, ...],
                                dilations=(1, 3, 9)) -> dict:
    """Reference AmphionCodec CodecEncoder state dict → our CodecEncoder.

    Torch (ref models/codec/amphion_codec/codec.py:100): Sequential
    block.0 (pre conv), block.{1..N} EncoderBlock(.block: 3 ResidualUnits,
    Snake, strided conv), block.{N+1} Snake, block.{N+2} out conv."""
    g = lambda name: np.asarray(sd[name])

    def wn(prefix: str, kind: str) -> dict:
        return torch_weight_norm_to_flax(
            g(f"{prefix}.weight_g"), g(f"{prefix}.weight_v"), kind,
            g(f"{prefix}.bias") if f"{prefix}.bias" in sd else None)

    n = len(strides)
    params: dict = {}
    pre = wn("block.0", "conv1d")
    params["Conv_0"] = pre["layer"]
    params["WeightNorm_0"] = {"Conv_0/kernel/scale": pre["scale"]}
    for i in range(n):
        eb = f"block.{i + 1}.block"
        for j, d in enumerate(dilations):
            params[f"res_{i}_{d}"] = _codec_resunit(sd, f"{eb}.{j}", wn)
        params[f"down_act_{i}"] = {
            "alpha": g(f"{eb}.{len(dilations)}.alpha").reshape(-1)}
        down = wn(f"{eb}.{len(dilations) + 1}", "conv1d")
        params[f"Conv_{i + 1}"] = down["layer"]
        params[f"WeightNorm_{i + 1}"] = {
            f"Conv_{i + 1}/kernel/scale": down["scale"]}
    params["final_act"] = {"alpha": g(f"block.{n + 1}.alpha").reshape(-1)}
    out = wn(f"block.{n + 2}", "conv1d")
    params[f"Conv_{n + 1}"] = out["layer"]
    params[f"WeightNorm_{n + 1}"] = {f"Conv_{n + 1}/kernel/scale": out["scale"]}
    return params


def torch_codec_decoder_to_flax(sd: Mapping[str, np.ndarray], *,
                                up_ratios: tuple[int, ...],
                                dilations=(1, 3, 9),
                                prefix: str = "model") -> dict:
    """Reference CodecDecoder conv stack (quantizer excluded) → ours.

    Torch: {prefix}.0 pre conv, {prefix}.{i+1} DecoderBlock(.block: Snake,
    ConvTranspose, 3 ResidualUnits), {prefix}.{N+1} Snake, {prefix}.{N+2}
    out conv, {prefix}.{N+3} Tanh."""
    g = lambda name: np.asarray(sd[name])

    def wn(p: str, kind: str) -> dict:
        return torch_weight_norm_to_flax(
            g(f"{p}.weight_g"), g(f"{p}.weight_v"), kind,
            g(f"{p}.bias") if f"{p}.bias" in sd else None)

    n = len(up_ratios)
    params: dict = {}
    pre = wn(f"{prefix}.0", "conv1d")
    params["Conv_0"] = pre["layer"]
    params["WeightNorm_0"] = {"Conv_0/kernel/scale": pre["scale"]}
    for i in range(n):
        db = f"{prefix}.{i + 1}.block"
        params[f"up_act_{i}"] = {"alpha": g(f"{db}.0.alpha").reshape(-1)}
        up = wn(f"{db}.1", "convtranspose1d")
        params[f"ConvTranspose_{i}"] = up["layer"]
        params[f"WeightNorm_{i + 1}"] = {
            f"ConvTranspose_{i}/kernel/scale": up["scale"]}
        for j, d in enumerate(dilations):
            params[f"res_{i}_{d}"] = _codec_resunit(sd, f"{db}.{j + 2}", wn)
    params["final_act"] = {"alpha": g(f"{prefix}.{n + 1}.alpha").reshape(-1)}
    out = wn(f"{prefix}.{n + 2}", "conv1d")
    params["Conv_1"] = out["layer"]
    params[f"WeightNorm_{n + 1}"] = {"Conv_1/kernel/scale": out["scale"]}
    return params


def diff_llama_to_flax(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """Reference MaskGCT DiffLlama state dict → our adaptive LlamaEncoder
    params (+ cond/diff-step MLPs under their own keys).

    Torch layout (ref models/tts/maskgct/llama_nar.py:202): layers.{i} with
    HF Llama attention/MLP and LlamaAdaptiveRMSNorm (`to_weight` Linear)
    input/post norms, final `norm`, `cond_mlp.{0,2}`, `diff_step_mlp.{0,2}`.
    """
    g = lambda name: np.asarray(sd[name])

    def ada(prefix: str) -> dict:
        return {"to_weight": linear_to_dense(g(f"{prefix}.to_weight.weight"),
                                             g(f"{prefix}.to_weight.bias"))}

    params: dict = {}
    for i in range(num_layers):
        p = f"layers.{i}"
        params[f"layer_{i}"] = {
            "input_norm": ada(f"{p}.input_layernorm"),
            "post_norm": ada(f"{p}.post_attention_layernorm"),
            "attn": {
                "q_proj": linear_to_dense(g(f"{p}.self_attn.q_proj.weight")),
                "k_proj": linear_to_dense(g(f"{p}.self_attn.k_proj.weight")),
                "v_proj": linear_to_dense(g(f"{p}.self_attn.v_proj.weight")),
                "o_proj": linear_to_dense(g(f"{p}.self_attn.o_proj.weight")),
            },
            "mlp": {
                "gate_proj": linear_to_dense(g(f"{p}.mlp.gate_proj.weight")),
                "up_proj": linear_to_dense(g(f"{p}.mlp.up_proj.weight")),
                "down_proj": linear_to_dense(g(f"{p}.mlp.down_proj.weight")),
            },
        }
    params["final_norm"] = ada("norm")

    def mlp2(prefix: str) -> dict:
        return {
            "Dense_0": linear_to_dense(g(f"{prefix}.0.weight"),
                                       g(f"{prefix}.0.bias")),
            "Dense_1": linear_to_dense(g(f"{prefix}.2.weight"),
                                       g(f"{prefix}.2.bias")),
        }

    out = {"encoder": params}
    if "cond_mlp.0.weight" in sd:
        out["cond_mlp"] = mlp2("cond_mlp")
    if "diff_step_mlp.0.weight" in sd:
        out["diff_step_mlp"] = mlp2("diff_step_mlp")
    return out


def torch_vocos_to_flax(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """Reference Vocos (backbone + ISTFT head) state dict → `VocosGenerator`.

    Torch layout (ref models/codec/amphion_codec/vocos.py:720,824):
    backbone.embed (conv), backbone.norm, backbone.convnext.{i}
    (dwconv, norm, pwconv1, pwconv2, gamma), backbone.final_layer_norm,
    head.out (Linear). Ours: embed / norm_pre / block_{i}
    (Conv_0, LayerNorm_0, Dense_0, Dense_1, gamma) / norm_post / head.
    """
    g = lambda name: np.asarray(sd[name])

    def ln(prefix: str) -> dict:
        return {"scale": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias")}

    params: dict = {
        "embed": conv1d_to_flax(g("backbone.embed.weight"),
                                g("backbone.embed.bias")),
        "norm_pre": ln("backbone.norm"),
        "norm_post": ln("backbone.final_layer_norm"),
        "head": linear_to_dense(g("head.out.weight"), g("head.out.bias")),
    }
    for i in range(num_layers):
        p = f"backbone.convnext.{i}"
        params[f"block_{i}"] = {
            "Conv_0": conv1d_to_flax(g(f"{p}.dwconv.weight"),
                                     g(f"{p}.dwconv.bias")),
            "LayerNorm_0": ln(f"{p}.norm"),
            "Dense_0": linear_to_dense(g(f"{p}.pwconv1.weight"),
                                       g(f"{p}.pwconv1.bias")),
            "Dense_1": linear_to_dense(g(f"{p}.pwconv2.weight"),
                                       g(f"{p}.pwconv2.bias")),
            "gamma": g(f"{p}.gamma"),
        }
    return params


def torch_fvq_to_flax(sd: Mapping[str, np.ndarray], prefix: str = "",
                      in_name: str = "in_project",
                      out_name: str = "out_project") -> dict:
    """Reference FactorizedVectorQuantize → our FVQ params.

    Torch (ref quantize/factorized_vector_quantize.py:41-50): in_project /
    out_project are weight-normed 1x1 Conv1d, codebook is an Embedding.
    DAC's VectorQuantize (dualcodec/model_codec/dac_quantize.py:23) is the
    same module with `in_proj`/`out_proj` names."""
    g = lambda name: np.asarray(sd[f"{prefix}{name}" if prefix else name])

    def wn_1x1(p: str) -> dict:
        w_g, w_v = g(f"{p}.weight_g"), g(f"{p}.weight_v")
        v = np.asarray(w_v, np.float64)
        norm = np.sqrt(np.sum(v**2, axis=(1, 2), keepdims=True))
        w = (np.asarray(w_g, np.float64) * v / np.maximum(norm, 1e-12))
        kernel = w[:, :, 0].T.astype(w_v.dtype)  # (in, out)
        out = {"kernel": kernel}
        if f"{p}.bias" in sd or (prefix and f"{prefix}{p}.bias" in sd):
            out["bias"] = g(f"{p}.bias")
        return out

    return {
        "in_proj": wn_1x1(in_name),
        "out_proj": wn_1x1(out_name),
        "codebook": g("codebook.weight"),
    }


def torch_residual_vq_to_flax(sd: Mapping[str, np.ndarray],
                              num_quantizers: int,
                              prefix: str = "quantizer") -> dict:
    """Reference ResidualVQ (FVQ layers) → our ResidualVQ params."""
    base = f"{prefix}." if prefix else ""
    return {
        f"q{i}": torch_fvq_to_flax(sd, prefix=f"{base}quantizers.{i}.")
        for i in range(num_quantizers)
    }


def amphion_codec_to_flax(enc_sd: Mapping[str, np.ndarray],
                          dec_sd: Mapping[str, np.ndarray], *,
                          strides: tuple[int, ...], num_quantizers: int,
                          dilations=(1, 3, 9),
                          use_vocos_decoder: bool = False,
                          vocos_num_layers: int = 30) -> dict:
    """Full AmphionCodec params from the reference's two-file acoustic
    codec checkpoint (ref `maskgct_inference.py:44-52`: encoder in
    model.safetensors, decoder + quantizer in model_1.safetensors).

    ``use_vocos_decoder``: the published MaskGCT acoustic codec decodes
    through a Vocos head (ref codec.py:372), keys under ``model.``."""
    if use_vocos_decoder:
        decoder = torch_vocos_to_flax(
            _sub_state_dict(dec_sd, "model."), num_layers=vocos_num_layers)
    else:
        decoder = torch_codec_decoder_to_flax(
            dec_sd, up_ratios=tuple(reversed(strides)), dilations=dilations)
    return {
        "encoder": torch_codec_encoder_to_flax(
            enc_sd, strides=strides, dilations=dilations),
        "decoder": decoder,
        "quantizer": torch_residual_vq_to_flax(dec_sd, num_quantizers),
    }


def maskgct_t2s_to_flax(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """Reference MaskGCT_T2S state dict → `MaskGCTT2S` params.

    Torch (ref maskgct_t2s.py:36-108): mask_emb/cond_emb/phone_emb
    Embeddings, to_logit Linear, diff_estimator = DiffLlamaPrefix."""
    g = lambda name: np.asarray(sd[name])
    return {
        "phone_emb": embedding_to_flax(g("phone_emb.weight")),
        "cond_emb": embedding_to_flax(g("cond_emb.weight")),
        "mask_emb": g("mask_emb.weight")[0],
        "to_logit": linear_to_dense(g("to_logit.weight"), g("to_logit.bias")),
        "backbone": diff_llama_to_flax(
            {k[len("diff_estimator."):]: v for k, v in sd.items()
             if k.startswith("diff_estimator.")}, num_layers),
    }


def metis_stage1_to_flax(sd: Mapping[str, np.ndarray],
                         num_layers: int) -> dict:
    """Reference MetisStage1 (metis_model.py:43 = MaskGCT_T2S +
    SimpleAdapter `cond_adapter`) → our `Metis` params subtree
    ({"t2s", "cond_adapter"}; the s2a branch loads separately)."""
    g = lambda name: np.asarray(sd[name])
    params: dict = {"t2s": maskgct_t2s_to_flax(sd, num_layers=num_layers)}
    if "cond_adapter.in_linear.weight" in sd:
        params["cond_adapter"] = {
            "in_linear": linear_to_dense(g("cond_adapter.in_linear.weight"),
                                         g("cond_adapter.in_linear.bias")),
            "out_linear": linear_to_dense(g("cond_adapter.out_linear.weight"),
                                          g("cond_adapter.out_linear.bias")),
            "gate_scale": g("cond_adapter.gate_scale"),
        }
    return params


def maskgct_s2a_to_flax(sd: Mapping[str, np.ndarray], num_layers: int,
                        num_quantizers: int) -> dict:
    """Reference MaskGCT_S2A state dict → `MaskGCTS2A` params.

    Torch (ref maskgct_s2a.py:35-140): per-quantizer token_emb/to_logits,
    layer_emb, mask_emb, cond_emb, diff_estimator = DiffLlama."""
    g = lambda name: np.asarray(sd[name])
    params: dict = {
        "mask_emb": g("mask_emb.weight")[0],
        "cond_emb": embedding_to_flax(g("cond_emb.weight")),
        "layer_emb": embedding_to_flax(g("layer_emb.weight")),
        "backbone": diff_llama_to_flax(
            {k[len("diff_estimator."):]: v for k, v in sd.items()
             if k.startswith("diff_estimator.")}, num_layers),
    }
    for q in range(num_quantizers):
        params[f"tok_emb_{q}"] = embedding_to_flax(g(f"token_emb.{q}.weight"))
        params[f"head_{q}"] = linear_to_dense(g(f"to_logits.{q}.weight"),
                                              g(f"to_logits.{q}.bias"))
    return params


def _vocos_backbone_to_flax(sd: Mapping[str, np.ndarray], prefix: str,
                            num_layers: int) -> dict:
    """Reference VocosBackbone (under ``prefix``) → our VocosBackbone."""
    g = lambda name: np.asarray(sd[f"{prefix}.{name}"])

    def ln(p: str) -> dict:
        return {"scale": g(f"{p}.weight"), "bias": g(f"{p}.bias")}

    params: dict = {
        "embed": conv1d_to_flax(g("embed.weight"), g("embed.bias")),
        "norm_pre": ln("norm"),
        "norm_post": ln("final_layer_norm"),
    }
    for i in range(num_layers):
        p = f"convnext.{i}"
        params[f"block_{i}"] = {
            "Conv_0": conv1d_to_flax(g(f"{p}.dwconv.weight"),
                                     g(f"{p}.dwconv.bias")),
            "LayerNorm_0": ln(f"{p}.norm"),
            "Dense_0": linear_to_dense(g(f"{p}.pwconv1.weight"),
                                       g(f"{p}.pwconv1.bias")),
            "Dense_1": linear_to_dense(g(f"{p}.pwconv2.weight"),
                                       g(f"{p}.pwconv2.bias")),
            "gamma": g(f"{p}.gamma"),
        }
    return params


def repcodec_to_flax(sd: Mapping[str, np.ndarray], num_layers: int,
                     num_quantizers: int = 1) -> dict:
    """Reference RepCodec (kmeans semantic codec) → our RepCodec
    (style='vocos'). Torch layout (ref repcodec_model.py:106-139):
    encoder/decoder = Sequential(VocosBackbone, Linear), RVQ quantizer."""
    g = lambda name: np.asarray(sd[name])
    return {
        "enc_backbone": _vocos_backbone_to_flax(sd, "encoder.0", num_layers),
        "enc_out": linear_to_dense(g("encoder.1.weight"), g("encoder.1.bias")),
        "dec_backbone": _vocos_backbone_to_flax(sd, "decoder.0", num_layers),
        "dec_out": linear_to_dense(g("decoder.1.weight"), g("decoder.1.bias")),
        "quantizer": torch_residual_vq_to_flax(sd, num_quantizers),
    }


# ---------------------------------------------------------------------------
# VITS (SynthesizerTrn) — ref models/tts/vits/vits.py:155
# ---------------------------------------------------------------------------


def _dense_from_conv1x1(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """torch Conv1d(k=1) → flax Dense params."""
    w = np.asarray(sd[f"{prefix}.weight"])[..., 0]  # (O, I)
    b = np.asarray(sd[f"{prefix}.bias"]) if f"{prefix}.bias" in sd else None
    return linear_to_dense(w, b)


def _plain_or_wn(sd: Mapping[str, np.ndarray], prefix: str, kind: str) -> dict:
    """torch conv that may or may not be weight_norm'd → flax WeightNorm
    wrapper params. For a plain conv the (g, v) decomposition is fabricated
    as g=||w||, v=w, which reproduces w exactly."""
    b = np.asarray(sd[f"{prefix}.bias"]) if f"{prefix}.bias" in sd else None
    if f"{prefix}.weight_g" in sd:
        return torch_weight_norm_to_flax(
            np.asarray(sd[f"{prefix}.weight_g"]),
            np.asarray(sd[f"{prefix}.weight_v"]), kind, b)
    if f"{prefix}.parametrizations.weight.original0" in sd:
        # torch >= 2.1 parametrized weight_norm (original0=g, original1=v)
        return torch_weight_norm_to_flax(
            np.asarray(sd[f"{prefix}.parametrizations.weight.original0"]),
            np.asarray(sd[f"{prefix}.parametrizations.weight.original1"]),
            kind, b)
    w = np.asarray(sd[f"{prefix}.weight"])
    g_fab = np.sqrt(np.sum(w.astype(np.float64) ** 2,
                           axis=tuple(range(1, w.ndim)), keepdims=True))
    return torch_weight_norm_to_flax(g_fab.astype(w.dtype), w, kind, b)


def torch_wn_module_to_flax(sd: Mapping[str, np.ndarray], prefix: str,
                            n_layers: int) -> dict:
    """Reference WN (modules/flow/modules.py:74: weight-normed in_layers /
    res_skip_layers / optional cond_layer) → our `flows.WN` params.

    Flax WeightNorm scale collections are numbered in creation order:
    cond (if present) first, then per layer in_i, res_skip_i."""
    out: dict = {}
    k = 0

    def put(fname: str, p: dict) -> None:
        nonlocal k
        out[fname] = p["layer"]
        out[f"WeightNorm_{k}"] = {f"{fname}/kernel/scale": p["scale"]}
        k += 1

    if f"{prefix}.cond_layer.weight_g" in sd:
        g = np.asarray(sd[f"{prefix}.cond_layer.weight_g"])[..., 0]
        v = np.asarray(sd[f"{prefix}.cond_layer.weight_v"])[..., 0]
        b = np.asarray(sd[f"{prefix}.cond_layer.bias"])
        put("cond", torch_weight_norm_to_flax(g, v, "linear", b))
    for i in range(n_layers):
        put(f"in_{i}", _plain_or_wn(sd, f"{prefix}.in_layers.{i}", "conv1d"))
        put(f"res_skip_{i}",
            _plain_or_wn(sd, f"{prefix}.res_skip_layers.{i}", "conv1d"))
    return out


def _vits_rel_encoder_to_flax(sd: Mapping[str, np.ndarray],
                              enc_prefix: str, n_layers: int) -> dict:
    """VITS relative-attention Encoder stack (attentions.py Encoder) →
    our `modules/transformer.TransformerEncoder` params."""
    t = lambda name: np.asarray(sd[name])

    def ln(p: str) -> dict:
        return {"scale": t(f"{p}.gamma"), "bias": t(f"{p}.beta")}

    enc: dict = {}
    for i in range(n_layers):
        a = f"{enc_prefix}.attn_layers.{i}"
        enc[f"MultiHeadAttention_{i}"] = {
            "q": _dense_from_conv1x1(sd, f"{a}.conv_q"),
            "k": _dense_from_conv1x1(sd, f"{a}.conv_k"),
            "v": _dense_from_conv1x1(sd, f"{a}.conv_v"),
            "out": _dense_from_conv1x1(sd, f"{a}.conv_o"),
            "rel_k": t(f"{a}.emb_rel_k")[0],
            "rel_v": t(f"{a}.emb_rel_v")[0],
        }
        f = f"{enc_prefix}.ffn_layers.{i}"
        enc[f"ConvFFN_{i}"] = {
            "Conv_0": conv1d_to_flax(t(f"{f}.conv_1.weight"),
                                     t(f"{f}.conv_1.bias")),
            "Conv_1": conv1d_to_flax(t(f"{f}.conv_2.weight"),
                                     t(f"{f}.conv_2.bias")),
        }
        enc[f"LayerNorm_{2 * i}"] = ln(f"{enc_prefix}.norm_layers_1.{i}")
        enc[f"LayerNorm_{2 * i + 1}"] = ln(f"{enc_prefix}.norm_layers_2.{i}")
    return enc


def torch_vits_text_encoder_to_flax(sd: Mapping[str, np.ndarray],
                                    prefix: str = "enc_p",
                                    n_layers: int = 6) -> dict:
    """Reference VITS TextEncoder (vits.py:28: emb + relative-attention
    Encoder + proj) → our `models/tts/vits` TextEncoder params."""
    t = lambda name: np.asarray(sd[name])
    return {
        "emb": {"embedding": t(f"{prefix}.emb.weight")},
        "encoder": _vits_rel_encoder_to_flax(sd, f"{prefix}.encoder",
                                             n_layers),
        "proj": _dense_from_conv1x1(sd, f"{prefix}.proj"),
    }


def vits_svc_to_flax(sd: Mapping[str, np.ndarray], *,
                     n_layers: int = 6,
                     posterior_wn_layers: int = 16,
                     n_flows: int = 4,
                     flow_wn_layers: int = 4,
                     num_upsamples: int = 4,
                     num_kernels: int = 3,
                     resblock: str = "1",
                     dilations_per_block: int = 3) -> dict:
    """Reference VitsSVC SynthesizerTrn (models/svc/vits/vits.py:81) →
    our `models/svc/vits_svc.VitsSVC` params: ConditionEncoder →
    ContentEncoder (rel-attn + 1x1 proj; its `f0_emb` is dead code, the
    condition encoder carries melody) → posterior/flow → GAN-zoo HiFiGAN
    decoder (weight-normed conv_pre, no speaker cond)."""
    t = lambda name: np.asarray(sd[name])
    params: dict = {
        "condition_encoder": condition_encoder_to_flax(
            {k[len("condition_encoder."):]: v for k, v in sd.items()
             if k.startswith("condition_encoder.")}),
        "content_encoder": _vits_rel_encoder_to_flax(sd, "enc_p.enc_",
                                                     n_layers),
        "content_proj": _dense_from_conv1x1(sd, "enc_p.proj"),
        "posterior": {
            "pre": conv1d_to_flax(t("enc_q.pre.weight"), t("enc_q.pre.bias")),
            "enc": torch_wn_module_to_flax(sd, "enc_q.enc",
                                           posterior_wn_layers),
            "proj": _dense_from_conv1x1(sd, "enc_q.proj"),
        },
        "decoder": torch_hifigan_to_flax(
            {k[len("dec."):]: v for k, v in sd.items()
             if k.startswith("dec.")},
            num_upsamples=num_upsamples, num_kernels=num_kernels,
            resblock=resblock, dilations_per_block=dilations_per_block),
    }
    flow: dict = {}
    for i in range(n_flows):
        tp = f"flow.flows.{2 * i}"
        flow[f"flow_{i}"] = {
            "pre": conv1d_to_flax(t(f"{tp}.pre.weight"), t(f"{tp}.pre.bias")),
            "enc": torch_wn_module_to_flax(sd, f"{tp}.enc", flow_wn_layers),
            "post": conv1d_to_flax(t(f"{tp}.post.weight"),
                                   t(f"{tp}.post.bias")),
        }
    params["flow"] = flow
    if "emb_g.weight" in sd:
        params["speaker_embed"] = {"embedding": t("emb_g.weight")}
    return params


def torch_vits_to_flax(sd: Mapping[str, np.ndarray], *,
                       n_layers: int = 6,
                       posterior_wn_layers: int = 16,
                       n_flows: int = 4,
                       flow_wn_layers: int = 4,
                       num_upsamples: int,
                       num_kernels: int,
                       resblock: str = "1",
                       dilations_per_block: int = 3,
                       use_sdp: bool = False,
                       n_speakers: int = 0) -> dict:
    """Full reference SynthesizerTrn state dict → our VITS params.

    Covers enc_p (text encoder), enc_q (posterior), flow (residual
    coupling stack; torch flows.{2i} are the coupling layers, odd indices
    are parameter-free Flips), dp (duration predictor), dec (HiFiGAN_vits
    with plain conv_pre/conv_post + optional speaker cond), emb_g."""
    t = lambda name: np.asarray(sd[name])

    params: dict = {
        "text_encoder": torch_vits_text_encoder_to_flax(sd, "enc_p", n_layers),
        "posterior": {
            "pre": conv1d_to_flax(t("enc_q.pre.weight"), t("enc_q.pre.bias")),
            "enc": torch_wn_module_to_flax(sd, "enc_q.enc", posterior_wn_layers),
            "proj": _dense_from_conv1x1(sd, "enc_q.proj"),
        },
    }

    flow: dict = {}
    for i in range(n_flows):
        tp = f"flow.flows.{2 * i}"
        flow[f"flow_{i}"] = {
            "pre": conv1d_to_flax(t(f"{tp}.pre.weight"), t(f"{tp}.pre.bias")),
            "enc": torch_wn_module_to_flax(sd, f"{tp}.enc", flow_wn_layers),
            "post": conv1d_to_flax(t(f"{tp}.post.weight"), t(f"{tp}.post.bias")),
        }
    params["flow"] = flow

    if use_sdp:
        params["duration_predictor"] = torch_vits_sdp_to_flax(sd, "dp")
    else:
        dp = {
            "Conv_0": conv1d_to_flax(t("dp.conv_1.weight"), t("dp.conv_1.bias")),
            "LayerNorm_0": {"scale": t("dp.norm_1.gamma"), "bias": t("dp.norm_1.beta")},
            "Conv_1": conv1d_to_flax(t("dp.conv_2.weight"), t("dp.conv_2.bias")),
            "LayerNorm_1": {"scale": t("dp.norm_2.gamma"), "bias": t("dp.norm_2.beta")},
            "Dense_0": _dense_from_conv1x1(sd, "dp.proj"),
        }
        if "dp.cond.weight" in sd:
            dp["cond"] = _dense_from_conv1x1(sd, "dp.cond")
        params["duration_predictor"] = dp

    # decoder: HiFiGAN_vits (ref hifigan.py:376) — plain conv_pre/conv_post,
    # weight-normed ups/resblocks, optional 1x1 speaker cond
    dec: dict = {}
    pre = _plain_or_wn(sd, "dec.conv_pre", "conv1d")
    dec["Conv_0"] = pre["layer"]
    dec["WeightNorm_0"] = {"Conv_0/kernel/scale": pre["scale"]}
    if "dec.cond.weight" in sd:
        dec["cond"] = _dense_from_conv1x1(sd, "dec.cond")
    for i in range(num_upsamples):
        up = _plain_or_wn(sd, f"dec.ups.{i}", "convtranspose1d")
        dec[f"ConvTranspose_{i}"] = up["layer"]
        dec[f"WeightNorm_{i + 1}"] = {f"ConvTranspose_{i}/kernel/scale": up["scale"]}
    block_name = "ResBlock1" if resblock == "1" else "ResBlock2"
    for idx in range(num_upsamples * num_kernels):
        bp: dict = {}
        if resblock == "1":
            for j in range(dilations_per_block):
                c1 = _plain_or_wn(sd, f"dec.resblocks.{idx}.convs1.{j}", "conv1d")
                c2 = _plain_or_wn(sd, f"dec.resblocks.{idx}.convs2.{j}", "conv1d")
                bp[f"Conv_{2 * j}"] = c1["layer"]
                bp[f"WeightNorm_{2 * j}"] = {f"Conv_{2 * j}/kernel/scale": c1["scale"]}
                bp[f"Conv_{2 * j + 1}"] = c2["layer"]
                bp[f"WeightNorm_{2 * j + 1}"] = {
                    f"Conv_{2 * j + 1}/kernel/scale": c2["scale"]}
        else:
            for j in range(dilations_per_block):
                c = _plain_or_wn(sd, f"dec.resblocks.{idx}.convs.{j}", "conv1d")
                bp[f"Conv_{j}"] = c["layer"]
                bp[f"WeightNorm_{j}"] = {f"Conv_{j}/kernel/scale": c["scale"]}
        dec[f"{block_name}_{idx}"] = bp
    post = _plain_or_wn(sd, "dec.conv_post", "conv1d")
    if "bias" not in post["layer"]:  # ref conv_post has bias=False
        post["layer"]["bias"] = np.zeros(
            post["layer"]["kernel"].shape[-1], post["layer"]["kernel"].dtype)
    dec["Conv_1"] = post["layer"]
    dec[f"WeightNorm_{num_upsamples + 1}"] = {"Conv_1/kernel/scale": post["scale"]}
    params["decoder"] = dec

    if n_speakers > 1 and "emb_g.weight" in sd:
        params["speaker_embed"] = {"embedding": t("emb_g.weight")}
    return params


def _ddsconv_to_flax(sd: Mapping[str, np.ndarray], prefix: str,
                     n_layers: int = 3) -> dict:
    """Reference DDSConv (modules/flow/modules.py:25) → our flows.DDSConv."""
    t = lambda name: np.asarray(sd[name])
    out: dict = {}
    for i in range(n_layers):
        # torch depthwise Conv1d (C, 1, K) → flax grouped conv (K, 1, C)
        out[f"sep_{i}"] = {
            "kernel": np.transpose(t(f"{prefix}.convs_sep.{i}.weight"), (2, 1, 0)),
            "bias": t(f"{prefix}.convs_sep.{i}.bias"),
        }
        out[f"pw_{i}"] = conv1d_to_flax(t(f"{prefix}.convs_1x1.{i}.weight"),
                                        t(f"{prefix}.convs_1x1.{i}.bias"))
        out[f"LayerNorm_{2 * i}"] = {"scale": t(f"{prefix}.norms_1.{i}.gamma"),
                                     "bias": t(f"{prefix}.norms_1.{i}.beta")}
        out[f"LayerNorm_{2 * i + 1}"] = {"scale": t(f"{prefix}.norms_2.{i}.gamma"),
                                         "bias": t(f"{prefix}.norms_2.{i}.beta")}
    return out


def _convflow_to_flax(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """Reference ConvFlow (modules/flow/modules.py:400) → our flows.ConvFlow."""
    t = lambda name: np.asarray(sd[name])
    return {
        "pre": conv1d_to_flax(t(f"{prefix}.pre.weight"), t(f"{prefix}.pre.bias")),
        "convs": _ddsconv_to_flax(sd, f"{prefix}.convs"),
        "proj": conv1d_to_flax(t(f"{prefix}.proj.weight"), t(f"{prefix}.proj.bias")),
    }


def torch_vits_sdp_to_flax(sd: Mapping[str, np.ndarray],
                           prefix: str = "dp", n_flows: int = 4) -> dict:
    """Reference StochasticDurationPredictor → our SDP params. Torch flow
    ModuleLists interleave parameter-free Flips at odd indices."""
    t = lambda name: np.asarray(sd[name])
    out: dict = {
        "pre": conv1d_to_flax(t(f"{prefix}.pre.weight"), t(f"{prefix}.pre.bias")),
        "convs": _ddsconv_to_flax(sd, f"{prefix}.convs"),
        "proj": conv1d_to_flax(t(f"{prefix}.proj.weight"), t(f"{prefix}.proj.bias")),
        "flow_pre": {"m": t(f"{prefix}.flows.0.m").reshape(-1),
                     "logs": t(f"{prefix}.flows.0.logs").reshape(-1)},
        "post_pre": conv1d_to_flax(t(f"{prefix}.post_pre.weight"),
                                   t(f"{prefix}.post_pre.bias")),
        "post_convs": _ddsconv_to_flax(sd, f"{prefix}.post_convs"),
        "post_proj": conv1d_to_flax(t(f"{prefix}.post_proj.weight"),
                                    t(f"{prefix}.post_proj.bias")),
        "post_flow_pre": {"m": t(f"{prefix}.post_flows.0.m").reshape(-1),
                          "logs": t(f"{prefix}.post_flows.0.logs").reshape(-1)},
    }
    for i in range(n_flows):
        out[f"flow_{i}"] = _convflow_to_flax(sd, f"{prefix}.flows.{2 * i + 1}")
        out[f"post_flow_{i}"] = _convflow_to_flax(sd, f"{prefix}.post_flows.{2 * i + 1}")
    if f"{prefix}.cond.weight" in sd:
        out["cond"] = conv1d_to_flax(t(f"{prefix}.cond.weight"),
                                     t(f"{prefix}.cond.bias"))
    return out


# ---------------------------------------------------------------------------
# Vevo AR transformer — ref models/vc/autoregressive_transformer/ar_model.py
# ---------------------------------------------------------------------------


def vevo_global_encoder_to_flax(sd: Mapping[str, np.ndarray],
                                prefix: str, num_layers: int) -> dict:
    """Reference GlobalEncoder (global_encoder.py:59: input_mlp →
    bidirectional Llama layers → norm → output_mlp) → GlobalTimbreEncoder."""
    g = lambda name: np.asarray(sd[f"{prefix}.{name}"])
    enc: dict = {"final_norm": {"scale": g("norm.weight")}}
    for i in range(num_layers):
        enc[f"layer_{i}"] = hf_llama_layer_to_flax(
            {k[len(prefix) + 1:]: v for k, v in sd.items()
             if k.startswith(f"{prefix}.layers.{i}.")}, f"layers.{i}")
    return {
        "in_0": linear_to_dense(g("input_mlp.0.weight"), g("input_mlp.0.bias")),
        "in_1": linear_to_dense(g("input_mlp.2.weight"), g("input_mlp.2.bias")),
        "encoder": enc,
        "out_0": linear_to_dense(g("output_mlp.0.weight"), g("output_mlp.0.bias")),
        "out_1": linear_to_dense(g("output_mlp.2.weight"), g("output_mlp.2.bias")),
    }


def vevo_ar_to_flax(sd: Mapping[str, np.ndarray], num_layers: int,
                    timbre_layers: int = 0) -> dict:
    """Reference AutoregressiveTransformer state dict → our ARTransformer.

    Torch layout: `model.` = LlamaForCausalLM (so llama weights live under
    `model.model.layers.*`, head under `model.lm_head`), optional
    `global_encoder.*`."""
    inner = {k[len("model."):]: v for k, v in sd.items()
             if k.startswith("model.")}
    base = hf_llama_to_flax(inner, num_layers)
    params = {
        "embed_tokens": base["embed_tokens"],
        "lm_head": base["lm_head"],
        "decoder": base["decoder"],
    }
    if timbre_layers and any(k.startswith("global_encoder.") for k in sd):
        params["timbre_encoder"] = vevo_global_encoder_to_flax(
            sd, "global_encoder", timbre_layers)
    return params


# ---------------------------------------------------------------------------
# Vevo flow-matching transformer — ref models/vc/flow_matching_transformer
# ---------------------------------------------------------------------------


def vevo_fmt_to_flax(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """Reference FlowMatchingTransformer state dict → our
    FlowMatchingTransformer. Torch layout (fmt_model.py:13): `cond_emb`
    (Embedding or Linear) + `diff_estimator.*` DiffLlama
    (llama_nar.py:127: layers/norm/cond_mlp/diff_step_mlp/mel_mlp/
    mel_out_mlp)."""
    g = lambda name: np.asarray(sd[name])
    inner = {k[len("diff_estimator."):]: v for k, v in sd.items()
             if k.startswith("diff_estimator.")}
    est = diff_llama_to_flax(inner, num_layers)

    def mlp2(prefix: str) -> dict:
        return {
            "Dense_0": linear_to_dense(g(f"{prefix}.0.weight"),
                                       g(f"{prefix}.0.bias")),
            "Dense_1": linear_to_dense(g(f"{prefix}.2.weight"),
                                       g(f"{prefix}.2.bias")),
        }

    est["mel_mlp"] = mlp2("diff_estimator.mel_mlp")
    est["mel_out_mlp"] = mlp2("diff_estimator.mel_out_mlp")
    params = {"diff_estimator": est}
    if "cond_emb.bias" in sd:  # Linear (use_cond_code=False)
        params["cond_emb"] = linear_to_dense(g("cond_emb.weight"),
                                             g("cond_emb.bias"))
    else:  # Embedding
        params["cond_emb"] = embedding_to_flax(g("cond_emb.weight"))
    return params


# ---------------------------------------------------------------------------
# FACodec (NS3) — ref models/codec/ns3_codec/facodec.py
# ---------------------------------------------------------------------------


def _fa_resunit(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """ref ResidualUnit (facodec.py:121: AA-SnakeBeta, WN k7, AA-SnakeBeta,
    WN k1) → FAResidualUnit params."""
    g = lambda n: np.asarray(sd[n])
    c1 = _plain_or_wn(sd, f"{prefix}.block.1", "conv1d")
    c2 = _plain_or_wn(sd, f"{prefix}.block.3", "conv1d")
    return {
        "SnakeBeta_0": {"alpha": g(f"{prefix}.block.0.act.alpha").reshape(-1),
                        "beta": g(f"{prefix}.block.0.act.beta").reshape(-1)},
        "conv1": c1["layer"],
        "WeightNorm_0": {"conv1/kernel/scale": c1["scale"]},
        "SnakeBeta_1": {"alpha": g(f"{prefix}.block.2.act.alpha").reshape(-1),
                        "beta": g(f"{prefix}.block.2.act.beta").reshape(-1)},
        "conv2": c2["layer"],
        "WeightNorm_1": {"conv2/kernel/scale": c2["scale"]},
    }


def _snakebeta(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    g = lambda n: np.asarray(sd[n])
    return {"alpha": g(f"{prefix}.alpha").reshape(-1),
            "beta": g(f"{prefix}.beta").reshape(-1)}


def facodec_encoder_to_flax(sd: Mapping[str, np.ndarray],
                            up_ratios: tuple[int, ...]) -> dict:
    """ref FACodecEncoder (facodec.py:157) → our FACodecEncoder params."""
    n = len(up_ratios)
    params: dict = {}
    pre = _plain_or_wn(sd, "block.0", "conv1d")
    params["conv_pre"] = pre["layer"]
    params["WeightNorm_0"] = {"conv_pre/kernel/scale": pre["scale"]}
    for i in range(n):
        eb = f"block.{i + 1}.block"
        for j in range(3):
            params[f"block_{i}_res_{j}"] = _fa_resunit(sd, f"{eb}.{j}")
        params[f"down_act_{i}"] = _snakebeta(sd, f"{eb}.3.act")
        down = _plain_or_wn(sd, f"{eb}.4", "conv1d")
        params[f"down_{i}"] = down["layer"]
        params[f"WeightNorm_{i + 1}"] = {f"down_{i}/kernel/scale": down["scale"]}
    params["final_act"] = _snakebeta(sd, f"block.{n + 1}.act")
    out = _plain_or_wn(sd, f"block.{n + 2}", "conv1d")
    params["conv_out"] = out["layer"]
    params[f"WeightNorm_{n + 1}"] = {"conv_out/kernel/scale": out["scale"]}
    return params


def _fa_decoder_block(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """ref DecoderBlock (facodec.py:220) → FADecoderBlock params."""
    up = _plain_or_wn(sd, f"{prefix}.block.1", "convtranspose1d")
    out = {
        "act": _snakebeta(sd, f"{prefix}.block.0.act"),
        "up": up["layer"],
        "WeightNorm_0": {"up/kernel/scale": up["scale"]},
    }
    for j in range(3):
        out[f"res_{j}"] = _fa_resunit(sd, f"{prefix}.block.{j + 2}")
    return out


def _fa_conv_stack(sd: Mapping[str, np.ndarray], prefix: str,
                   n_blocks: int) -> dict:
    """ref decoder `model` Sequential → pre_conv/up_block_i/final/post."""
    params: dict = {}
    pre = _plain_or_wn(sd, f"{prefix}.0", "conv1d")
    params["conv_pre"] = pre["layer"]
    params["pre_conv"] = {"conv_pre/kernel/scale": pre["scale"]}
    for i in range(n_blocks):
        params[f"up_block_{i}"] = _fa_decoder_block(sd, f"{prefix}.{i + 1}")
    params["final_out_act"] = _snakebeta(sd, f"{prefix}.{n_blocks + 1}.act")
    post = _plain_or_wn(sd, f"{prefix}.{n_blocks + 2}", "conv1d")
    params["conv_post"] = post["layer"]
    params["post_conv"] = {"conv_post/kernel/scale": post["scale"]}
    return params


def _fa_fvq_branch(sd: Mapping[str, np.ndarray], prefix: str,
                   num_layers: int) -> dict:
    """ref ns3 ResidualVQ branch (quantize/rvq.py) → FABranchRVQ params.
    The FVQ in/out projections are weight-normed Linears — materialized
    into plain Dense kernels."""
    out: dict = {}
    for i in range(num_layers):
        lp = f"{prefix}.layers.{i}"

        def proj(name):
            g = np.asarray(sd[f"{lp}.{name}.weight_g"])
            v = np.asarray(sd[f"{lp}.{name}.weight_v"])
            b = np.asarray(sd[f"{lp}.{name}.bias"])
            return torch_weight_norm_to_flax(g, v, "linear", b)["layer"]

        out[f"layer_{i}"] = {
            "in_proj": proj("in_proj"),
            "out_proj": proj("out_proj"),
            "codebook": np.asarray(sd[f"{lp}._codebook.weight"]),
        }
    return out


def _ns3_transformer_to_flax(sd: Mapping[str, np.ndarray], prefix: str,
                             num_layers: int, use_cln: bool = False) -> dict:
    """ref ns3 TransformerEncoder (transformer.py:154) → NS3TransformerEncoder.
    torch MultiheadAttention packs q/k/v into in_proj_weight."""
    g = lambda n: np.asarray(sd[f"{prefix}.{n}"])

    def ln(p):
        if use_cln:
            return {"style": linear_to_dense(g(f"{p}.style.weight"),
                                             g(f"{p}.style.bias"))}
        return {"scale": g(f"{p}.weight"), "bias": g(f"{p}.bias")}

    params: dict = {"last_ln": ln("last_ln")}
    for i in range(num_layers):
        lp = f"layers.{i}"
        w = g(f"{lp}.self_attn.in_proj_weight")
        b = g(f"{lp}.self_attn.in_proj_bias")
        d = w.shape[0] // 3
        params[f"layer_{i}"] = {
            "ln_1": ln(f"{lp}.ln_1"),
            "q": linear_to_dense(w[:d], b[:d]),
            "k": linear_to_dense(w[d:2 * d], b[d:2 * d]),
            "v": linear_to_dense(w[2 * d:], b[2 * d:]),
            "out": linear_to_dense(g(f"{lp}.self_attn.out_proj.weight"),
                                   g(f"{lp}.self_attn.out_proj.bias")),
            "ln_2": ln(f"{lp}.ln_2"),
            "ffn_1": conv1d_to_flax(g(f"{lp}.ffn.ffn_1.weight"),
                                    g(f"{lp}.ffn.ffn_1.bias")),
            "ffn_2": linear_to_dense(g(f"{lp}.ffn.ffn_2.weight"),
                                     g(f"{lp}.ffn.ffn_2.bias")),
        }
    return params


def facodec_decoder_to_flax(sd: Mapping[str, np.ndarray], *,
                            up_ratios: tuple[int, ...],
                            prosody_layers: int = 1,
                            content_layers: int = 2,
                            detail_layers: int = 3,
                            timbre_layers: int = 4) -> dict:
    """ref FACodecDecoder (facodec.py:242) → our FACodecDecoder params."""
    g = lambda n: np.asarray(sd[n])
    params = _fa_conv_stack(sd, "model", len(up_ratios))
    params["q_prosody"] = _fa_fvq_branch(sd, "quantizer.0", prosody_layers)
    params["q_content"] = _fa_fvq_branch(sd, "quantizer.1", content_layers)
    if detail_layers:
        params["q_detail"] = _fa_fvq_branch(sd, "quantizer.2", detail_layers)
    params["timbre_encoder"] = _ns3_transformer_to_flax(
        sd, "timbre_encoder", timbre_layers)
    params["timbre_linear"] = linear_to_dense(g("timbre_linear.weight"),
                                              g("timbre_linear.bias"))
    if "melspec_linear.weight" in sd:  # V2 prosody branch (facodec.py:1011)
        params["melspec_linear"] = linear_to_dense(
            g("melspec_linear.weight"), g("melspec_linear.bias"))
        params["melspec_encoder"] = _ns3_transformer_to_flax(
            sd, "melspec_encoder", 4)
    return params


def facodec_redecoder_to_flax(sd: Mapping[str, np.ndarray], *,
                              up_ratios: tuple[int, ...],
                              prosody_layers: int = 1,
                              content_layers: int = 2,
                              detail_layers: int = 3,
                              timbre_layers: int = 4) -> dict:
    """ref FACodecRedecoder (facodec.py:602) → our FACodecRedecoder params."""
    g = lambda n: np.asarray(sd[n])
    params = _fa_conv_stack(sd, "model", len(up_ratios))
    for i in range(prosody_layers):
        params[f"prosody_emb_{i}"] = {"embedding": g(f"prosody_embs.{i}.weight")}
    for i in range(content_layers):
        params[f"content_emb_{i}"] = {"embedding": g(f"content_embs.{i}.weight")}
    for i in range(detail_layers):
        params[f"residual_emb_{i}"] = {"embedding": g(f"residual_embs.{i}.weight")}
    params["timbre_cond_prosody_enc"] = _ns3_transformer_to_flax(
        sd, "timbre_cond_prosody_enc", timbre_layers, use_cln=True)
    params["timbre_linear"] = linear_to_dense(g("timbre_linear.weight"),
                                              g("timbre_linear.bias"))
    return params


# ---------------------------------------------------------------------------
# GAN discriminators — ref models/vocoders/gan/discriminator/{mpd,msd,mrd}.py
# ---------------------------------------------------------------------------


def _materialize_torch_norm(sd: Mapping[str, np.ndarray], prefix: str) -> tuple:
    """Effective (weight, bias) of a torch conv that may be weight-normed
    (weight_g/weight_v), spectral-normed (weight_orig/u/v), or plain."""
    b = np.asarray(sd[f"{prefix}.bias"]) if f"{prefix}.bias" in sd else None
    if f"{prefix}.weight_g" in sd:
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float64)
        v = np.asarray(sd[f"{prefix}.weight_v"], np.float64)
        nv = np.sqrt(np.sum(v**2, axis=tuple(range(1, v.ndim)), keepdims=True))
        return (g * v / np.maximum(nv, 1e-12)).astype(np.float32), b
    if f"{prefix}.weight_orig" in sd:
        w = np.asarray(sd[f"{prefix}.weight_orig"], np.float64)
        u = np.asarray(sd[f"{prefix}.weight_u"], np.float64)
        v = np.asarray(sd[f"{prefix}.weight_v"], np.float64)
        m = w.reshape(w.shape[0], -1)
        sigma = float(u @ (m @ v))
        return (w / sigma).astype(np.float32), b
    return np.asarray(sd[f"{prefix}.weight"]), b


def _wn2d(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """torch (possibly normed) Conv2d → flax WeightNorm(Conv) params."""
    w, b = _materialize_torch_norm(sd, prefix)
    inner = conv2d_to_flax(w, b)
    kernel = inner["kernel"]
    scale = np.sqrt(np.sum(np.asarray(kernel, np.float64) ** 2,
                           axis=tuple(range(kernel.ndim - 1)))).astype(np.float32)
    return {"layer": inner, "scale": scale}


def _wn1d_any(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    w, b = _materialize_torch_norm(sd, prefix)
    inner = conv1d_to_flax(w, b)
    kernel = inner["kernel"]
    scale = np.sqrt(np.sum(np.asarray(kernel, np.float64) ** 2,
                           axis=tuple(range(kernel.ndim - 1)))).astype(np.float32)
    return {"layer": inner, "scale": scale}


def _wn_seq(entries) -> dict:
    """[(flax_name, {'layer','scale'})] → params dict with WeightNorm_k
    collections in creation order."""
    out: dict = {}
    for k, (fname, p) in enumerate(entries):
        out[fname] = p["layer"]
        out[f"WeightNorm_{k}"] = {f"{fname}/kernel/scale": p["scale"]}
    return out


def torch_mpd_to_flax(sd: Mapping[str, np.ndarray],
                      num_periods: int = 5) -> dict:
    """Reference MultiPeriodDiscriminator (mpd.py:101) →
    our MultiPeriodDiscriminator params."""
    params: dict = {}
    for i in range(num_periods):
        p = f"discriminators.{i}"
        entries = [(f"Conv_{j}", _wn2d(sd, f"{p}.convs.{j}")) for j in range(5)]
        entries.append((f"Conv_5", _wn2d(sd, f"{p}.conv_post")))
        params[f"PeriodDiscriminator_{i}"] = _wn_seq(entries)
    return params


def torch_msstftd_to_flax(sd, num_scales: int = 3) -> dict:
    """Reference MultiScaleSTFTDiscriminator (msstftd.py:169) → our
    MultiSTFTDiscriminator params. Per branch: plain first conv
    (`convs.0`, no norm in the reference), weight-normed `convs.{1..4}` +
    `conv_post` (NormConv2d wraps the conv as `.conv`)."""
    params: dict = {}
    for i in range(num_scales):
        p = f"discriminators.{i}"
        w, b = _materialize_torch_norm(sd, f"{p}.convs.0.conv")
        sub: dict = {"conv_0": conv2d_to_flax(w, b)}
        entries = [(f"conv_{j}", _wn2d(sd, f"{p}.convs.{j}.conv"))
                   for j in range(1, 5)]
        entries.append(("conv_post", _wn2d(sd, f"{p}.conv_post.conv")))
        sub.update(_wn_seq(entries))
        params[f"STFTDiscriminator_{i}"] = sub
    return params


def torch_mssbcqtd_to_flax(sd, num_scales: int = 3,
                           n_octaves: tuple[int, ...] = (9, 9, 9)) -> dict:
    """Reference MultiScaleSubbandCQTDiscriminator (mssbcqtd.py:150) → our
    MultiScaleSubBandCQTDiscriminator params. Per scale: per-octave plain
    pre-convs (`conv_pres.{o}`), plain `convs.0`, weight-normed
    `convs.{1..4}` + `conv_post` (NormConv2d wraps the conv as `.conv`)."""
    params: dict = {}
    for i in range(num_scales):
        p = f"discriminators.{i}"
        sub: dict = {}
        for o in range(n_octaves[i]):
            w, b = _materialize_torch_norm(sd, f"{p}.conv_pres.{o}.conv")
            sub[f"conv_pre_{o}"] = conv2d_to_flax(w, b)
        w, b = _materialize_torch_norm(sd, f"{p}.convs.0.conv")
        sub["conv_0"] = conv2d_to_flax(w, b)
        entries = [(f"conv_{j}", _wn2d(sd, f"{p}.convs.{j}.conv"))
                   for j in range(1, 5)]
        entries.append(("conv_post", _wn2d(sd, f"{p}.conv_post.conv")))
        sub.update(_wn_seq(entries))
        params[f"SubBandCQTDiscriminator_{i}"] = sub
    return params


def torch_msd_to_flax(sd: Mapping[str, np.ndarray],
                      num_scales: int = 3) -> dict:
    """Reference MultiScaleDiscriminator (msd.py:53) → ours. The first
    scale's spectral-norm weights are materialized into WeightNorm params
    (identical forward; the SN constraint is a training-time device)."""
    params: dict = {}
    for i in range(num_scales):
        p = f"discriminators.{i}"
        entries = [(f"Conv_{j}", _wn1d_any(sd, f"{p}.convs.{j}"))
                   for j in range(7)]
        entries.append(("Conv_7", _wn1d_any(sd, f"{p}.conv_post")))
        params[f"ScaleDiscriminator_{i}"] = _wn_seq(entries)
    return params


def torch_mrd_to_flax(sd: Mapping[str, np.ndarray],
                      num_resolutions: int = 3) -> dict:
    """Reference MultiResolutionDiscriminator (mrd.py:133) → ours."""
    params: dict = {}
    for i in range(num_resolutions):
        p = f"discriminators.{i}"
        entries = [(f"Conv_{j}", _wn2d(sd, f"{p}.convs.{j}")) for j in range(5)]
        entries.append(("Conv_5", _wn2d(sd, f"{p}.conv_post")))
        params[f"ResolutionDiscriminator_{i}"] = _wn_seq(entries)
    return params


def torch_melgan_to_flax(sd: Mapping[str, np.ndarray], *,
                         upsample_rates: tuple[int, ...],
                         n_residual_layers: int = 3) -> dict:
    """Reference MelGAN generator (melgan.py:50, one flat `model`
    Sequential) → our MelGANGenerator params."""
    params: dict = {}
    entries = []
    idx = 1  # model.0 is ReflectionPad; model.1 the pre conv
    entries.append(("conv_pre", _wn1d_any(sd, f"model.{idx}")))
    idx += 1
    res_names = []
    for i, r in enumerate(upsample_rates):
        idx += 1  # LeakyReLU
        w, b = _materialize_torch_norm(sd, f"model.{idx}")
        up = convtranspose1d_to_flax(w, b)
        kern = up["kernel"]
        scale = np.sqrt(np.sum(np.asarray(kern, np.float64) ** 2,
                               axis=tuple(range(kern.ndim - 1)))).astype(np.float32)
        entries.append((f"up_{i}", {"layer": up, "scale": scale}))
        idx += 1
        for j in range(n_residual_layers):
            p = f"model.{idx}"
            params[f"res_{i}_{j}"] = _wn_seq([
                ("conv1", _wn1d_any(sd, f"{p}.block.2")),
                ("conv2", _wn1d_any(sd, f"{p}.block.4")),
                ("shortcut", _wn1d_any(sd, f"{p}.shortcut")),
            ])
            idx += 1
    idx += 2  # LeakyReLU + ReflectionPad
    entries.append(("conv_post", _wn1d_any(sd, f"model.{idx}")))
    params.update(_wn_seq(entries))
    return params


# ---------------------------------------------------------------------------
# NaturalSpeech2 — ref models/tts/naturalspeech2/ + modules/naturalpseech2
# ---------------------------------------------------------------------------


def _torch_mha_to_flax(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """torch nn.MultiheadAttention (packed in_proj) → our MHA params."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])
    d = w.shape[0] // 3
    return {
        "q": linear_to_dense(w[:d], b[:d]),
        "k": linear_to_dense(w[d:2 * d], b[d:2 * d]),
        "v": linear_to_dense(w[2 * d:], b[2 * d:]),
        "out": linear_to_dense(np.asarray(sd[f"{prefix}.out_proj.weight"]),
                               np.asarray(sd[f"{prefix}.out_proj.bias"])),
    }


def ns2_predictor_to_flax(sd: Mapping[str, np.ndarray], prefix: str,
                          num_layers: int, cattn_every: int = 3) -> dict:
    """ref Duration/PitchPredictor (transformers.py:238,358) →
    ConvCrossAttnPredictor params."""
    g = lambda n: np.asarray(sd[f"{prefix}.{n}"])
    out: dict = {"linear": linear_to_dense(g("linear.weight"),
                                           g("linear.bias"))}
    for i in range(num_layers):
        out[f"conv_{i}"] = conv1d_to_flax(g(f"conv.{i}.0.weight"),
                                          g(f"conv.{i}.0.bias"))
        out[f"ln_{i}"] = {"scale": g(f"conv.{i}.2.weight"),
                          "bias": g(f"conv.{i}.2.bias")}
        if i % cattn_every == 0:
            a = i // cattn_every
            out[f"cattn_{a}"] = _torch_mha_to_flax(sd, f"{prefix}.cattn.{a}.0")
            out[f"cattn_ln_{a}"] = {"scale": g(f"cattn.{a}.1.weight"),
                                    "bias": g(f"cattn.{a}.1.bias")}
    return out


def ns2_wavenet_to_flax(sd: Mapping[str, np.ndarray], num_layers: int,
                        cattn_every: int = 3) -> dict:
    """ref WaveNet (wavenet.py:131) → our WaveNet params."""
    g = lambda n: np.asarray(sd[n])
    out: dict = {
        "in_proj": {"kernel": g("in_proj.weight")[..., 0].T,
                    "bias": g("in_proj.bias")},
        "cond_ln": {"scale": g("cond_ln.weight"), "bias": g("cond_ln.bias")},
        "mlp_0": linear_to_dense(g("mlp.0.weight"), g("mlp.0.bias")),
        "mlp_1": linear_to_dense(g("mlp.2.weight"), g("mlp.2.bias")),
        "skip_proj": {"kernel": g("skip_proj.weight")[..., 0].T,
                      "bias": g("skip_proj.bias")},
        "out_proj": {"kernel": g("out_proj.weight")[..., 0].T,
                     "bias": g("out_proj.bias")},
    }
    for i in range(num_layers):
        p = f"layers.{i}"
        layer = {
            "dilated_conv": conv1d_to_flax(g(f"{p}.dilated_conv.weight"),
                                           g(f"{p}.dilated_conv.bias")),
            "diffusion_proj": linear_to_dense(g(f"{p}.diffusion_proj.weight"),
                                              g(f"{p}.diffusion_proj.bias")),
            "cond_proj": {"kernel": g(f"{p}.cond_proj.weight")[..., 0].T,
                          "bias": g(f"{p}.cond_proj.bias")},
            "out_proj": {"kernel": g(f"{p}.out_proj.weight")[..., 0].T,
                         "bias": g(f"{p}.out_proj.bias")},
        }
        if i % cattn_every == 0:
            layer["attn"] = _torch_mha_to_flax(sd, f"{p}.attn")
            layer["ln"] = {"scale": g(f"{p}.ln.weight"),
                           "bias": g(f"{p}.ln.bias")}
            layer["film"] = {
                "gain": linear_to_dense(g(f"{p}.film.gain.weight"),
                                        g(f"{p}.film.gain.bias")),
                "bias": linear_to_dense(g(f"{p}.film.bias.weight"),
                                        g(f"{p}.film.bias.bias")),
            }
        out[f"layer_{i}"] = layer
    return out


def ns2_prior_encoder_to_flax(sd: Mapping[str, np.ndarray], *,
                              enc_layers: int, predictor_layers: int,
                              cattn_every: int = 3) -> dict:
    """ref PriorEncoder (prior_encoder.py:18) → our PriorEncoder params."""
    g = lambda n: np.asarray(sd[n])
    return {
        "phone_emb": {"embedding": g("enc_emb_tokens.weight")},
        "encoder": _ns3_transformer_to_flax(sd, "encoder", enc_layers,
                                            use_cln=True),
        "duration_predictor": ns2_predictor_to_flax(
            sd, "duration_predictor", predictor_layers, cattn_every),
        "pitch_predictor": ns2_predictor_to_flax(
            sd, "pitch_predictor", predictor_layers, cattn_every),
        "pitch_embedding": {"embedding": g("pitch_embedding.weight")},
    }


def torch_apnet_to_flax(sd: Mapping[str, np.ndarray], *,
                        resblock_kernel_sizes=(3, 7, 11),
                        dilations_per_block: int = 3) -> dict:
    """Reference APNet (apnet.py:280) → our APNetGenerator params."""
    params: dict = {}
    # flax WeightNorm collections are numbered in execution order:
    # asp in/out, then psp in/R/I
    entries = [
        ("asp_input_conv", _wn1d_any(sd, "ASP_input_conv")),
        ("asp_output_conv", _wn1d_any(sd, "ASP_output_conv")),
        ("psp_input_conv", _wn1d_any(sd, "PSP_input_conv")),
        ("psp_output_r_conv", _wn1d_any(sd, "PSP_output_R_conv")),
        ("psp_output_i_conv", _wn1d_any(sd, "PSP_output_I_conv")),
    ]
    params.update(_wn_seq(entries))
    for tag, tprefix in (("asp", "ASP_ResNet"), ("psp", "PSP_ResNet")):
        for j, ks in enumerate(resblock_kernel_sizes):
            bp: dict = {}
            for d in range(dilations_per_block):
                c1 = _wn1d_any(sd, f"{tprefix}.{j}.convs1.{d}")
                c2 = _wn1d_any(sd, f"{tprefix}.{j}.convs2.{d}")
                bp[f"Conv_{2 * d}"] = c1["layer"]
                bp[f"WeightNorm_{2 * d}"] = {
                    f"Conv_{2 * d}/kernel/scale": c1["scale"]}
                bp[f"Conv_{2 * d + 1}"] = c2["layer"]
                bp[f"WeightNorm_{2 * d + 1}"] = {
                    f"Conv_{2 * d + 1}/kernel/scale": c2["scale"]}
            params[f"{tag}_res_{ks}"] = bp
    return params


def convtranspose2d_to_flax(w: np.ndarray, b: np.ndarray | None = None) -> dict:
    """torch ConvTranspose2d (I, O, kH, kW) → flax (kH, kW, I, O) with both
    spatial dims flipped."""
    k = np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))
    out = {"kernel": k}
    if b is not None:
        out["bias"] = b
    return out


def torch_diffwave_to_flax(sd: Mapping[str, np.ndarray],
                           num_layers: int) -> dict:
    """Reference DiffWave (diffwave.py:127) → our DiffWave params."""
    g = lambda n: np.asarray(sd[n])
    params: dict = {
        "input_projection": conv1d_to_flax(g("input_projection.weight"),
                                           g("input_projection.bias")),
        "diffusion_embedding": {
            "projection1": linear_to_dense(
                g("diffusion_embedding.projection1.weight"),
                g("diffusion_embedding.projection1.bias")),
            "projection2": linear_to_dense(
                g("diffusion_embedding.projection2.weight"),
                g("diffusion_embedding.projection2.bias")),
        },
        "spectrogram_upsampler": {
            "conv1": convtranspose2d_to_flax(
                g("spectrogram_upsampler.conv1.weight"),
                g("spectrogram_upsampler.conv1.bias")),
            "conv2": convtranspose2d_to_flax(
                g("spectrogram_upsampler.conv2.weight"),
                g("spectrogram_upsampler.conv2.bias")),
        },
        "skip_projection": conv1d_to_flax(g("skip_projection.weight"),
                                          g("skip_projection.bias")),
        "output_projection": conv1d_to_flax(g("output_projection.weight"),
                                            g("output_projection.bias")),
    }
    for i in range(num_layers):
        p = f"residual_layers.{i}"
        params[f"residual_layers_{i}"] = {
            "diffusion_projection": linear_to_dense(
                g(f"{p}.diffusion_projection.weight"),
                g(f"{p}.diffusion_projection.bias")),
            "conditioner_projection": conv1d_to_flax(
                g(f"{p}.conditioner_projection.weight"),
                g(f"{p}.conditioner_projection.bias")),
            "dilated_conv": conv1d_to_flax(g(f"{p}.dilated_conv.weight"),
                                           g(f"{p}.dilated_conv.bias")),
            "output_projection": conv1d_to_flax(
                g(f"{p}.output_projection.weight"),
                g(f"{p}.output_projection.bias")),
        }
    return params


# ---------------------------------------------------------------------------
# FastSpeech2 — ref models/tts/fastspeech2/fs2.py + modules/transformer
# ---------------------------------------------------------------------------


def _fs2_fft_block(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    g = lambda n: np.asarray(sd[f"{prefix}.{n}"])
    return {
        "slf_attn": {
            "w_qs": linear_to_dense(g("slf_attn.w_qs.weight"),
                                    g("slf_attn.w_qs.bias")),
            "w_ks": linear_to_dense(g("slf_attn.w_ks.weight"),
                                    g("slf_attn.w_ks.bias")),
            "w_vs": linear_to_dense(g("slf_attn.w_vs.weight"),
                                    g("slf_attn.w_vs.bias")),
            "fc": linear_to_dense(g("slf_attn.fc.weight"),
                                  g("slf_attn.fc.bias")),
            "layer_norm": {"scale": g("slf_attn.layer_norm.weight"),
                           "bias": g("slf_attn.layer_norm.bias")},
        },
        "w_1": conv1d_to_flax(g("pos_ffn.w_1.weight"), g("pos_ffn.w_1.bias")),
        "w_2": conv1d_to_flax(g("pos_ffn.w_2.weight"), g("pos_ffn.w_2.bias")),
        "ffn_ln": {"scale": g("pos_ffn.layer_norm.weight"),
                   "bias": g("pos_ffn.layer_norm.bias")},
    }


def _fs2_variance_predictor(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    g = lambda n: np.asarray(sd[f"{prefix}.{n}"])
    return {
        "conv1d_1": conv1d_to_flax(g("conv_layer.conv1d_1.conv.weight"),
                                   g("conv_layer.conv1d_1.conv.bias")),
        "layer_norm_1": {"scale": g("conv_layer.layer_norm_1.weight"),
                         "bias": g("conv_layer.layer_norm_1.bias")},
        "conv1d_2": conv1d_to_flax(g("conv_layer.conv1d_2.conv.weight"),
                                   g("conv_layer.conv1d_2.conv.bias")),
        "layer_norm_2": {"scale": g("conv_layer.layer_norm_2.weight"),
                         "bias": g("conv_layer.layer_norm_2.bias")},
        "linear_layer": linear_to_dense(g("linear_layer.weight"),
                                        g("linear_layer.bias")),
    }


def torch_fastspeech2_to_flax(sd: Mapping[str, np.ndarray], *,
                              enc_layers: int, dec_layers: int,
                              postnet_convs: int = 5) -> dict:
    """Reference FastSpeech2 (fs2.py:372) → our FastSpeech2 params. The
    PostNet BatchNorm1d running statistics are folded into the per-channel
    affine (eval-time equivalent)."""
    g = lambda n: np.asarray(sd[n])
    params: dict = {
        "phone_embed": {"embedding": g("encoder.src_word_emb.weight")},
        "mel_out": linear_to_dense(g("mel_linear.weight"),
                                   g("mel_linear.bias")),
    }
    for i in range(enc_layers):
        params[f"enc_{i}"] = _fs2_fft_block(sd, f"encoder.layer_stack.{i}")
    for i in range(dec_layers):
        params[f"dec_{i}"] = _fs2_fft_block(sd, f"decoder.layer_stack.{i}")
    va = {
        "duration_predictor": _fs2_variance_predictor(
            sd, "variance_adaptor.duration_predictor"),
        "pitch_predictor": _fs2_variance_predictor(
            sd, "variance_adaptor.pitch_predictor"),
        "energy_predictor": _fs2_variance_predictor(
            sd, "variance_adaptor.energy_predictor"),
        "pitch_bins": g("variance_adaptor.pitch_bins"),
        "energy_bins": g("variance_adaptor.energy_bins"),
        "pitch_embedding": {
            "embedding": g("variance_adaptor.pitch_embedding.weight")},
        "energy_embedding": {
            "embedding": g("variance_adaptor.energy_embedding.weight")},
    }
    params["variance"] = va
    post: dict = {}
    for i in range(postnet_convs):
        p = f"postnet.convolutions.{i}"
        w = g(f"{p}.0.conv.weight")
        cb = g(f"{p}.0.conv.bias")
        bn_w, bn_b = g(f"{p}.1.weight"), g(f"{p}.1.bias")
        mean, var = g(f"{p}.1.running_mean"), g(f"{p}.1.running_var")
        scale = bn_w / np.sqrt(var + 1e-5)
        # conv bias folds through the BN affine
        post[f"conv_{i}"] = {"kernel": np.transpose(w, (2, 1, 0))}
        post[f"bn_{i}_scale"] = scale.astype(np.float32)
        post[f"bn_{i}_bias"] = (scale * (cb - mean) + bn_b).astype(np.float32)
    params["postnet"] = post
    if "speaker_emb.weight" in sd:
        params["spk"] = {"embedding": g("speaker_emb.weight")}
    return params


# ---------------------------------------------------------------------------
# AudioLDM UNet — ref models/tta/ldm/audioldm.py + attention.py
# ---------------------------------------------------------------------------


def _sd_gn(sd, p):
    return {"scale": np.asarray(sd[f"{p}.weight"]),
            "bias": np.asarray(sd[f"{p}.bias"])}


def _sd_resblock(sd: Mapping[str, np.ndarray], p: str) -> dict:
    g = lambda n: np.asarray(sd[f"{p}.{n}"])
    out = {
        "in_norm": _sd_gn(sd, f"{p}.in_layers.0"),
        "in_conv": conv2d_to_flax(g("in_layers.2.weight"),
                                  g("in_layers.2.bias")),
        "emb_proj": linear_to_dense(g("emb_layers.1.weight"),
                                    g("emb_layers.1.bias")),
        "out_norm": _sd_gn(sd, f"{p}.out_layers.0"),
        "out_conv": conv2d_to_flax(g("out_layers.3.weight"),
                                   g("out_layers.3.bias")),
    }
    if f"{p}.skip_connection.weight" in sd:
        out["skip"] = conv2d_to_flax(g("skip_connection.weight"),
                                     g("skip_connection.bias"))
    return out


def _sd_spatial_transformer(sd: Mapping[str, np.ndarray], p: str,
                            depth: int = 1) -> dict:
    g = lambda n: np.asarray(sd[f"{p}.{n}"])

    def xattn(q):
        return {
            "to_q": linear_to_dense(g(f"{q}.to_q.weight")),
            "to_k": linear_to_dense(g(f"{q}.to_k.weight")),
            "to_v": linear_to_dense(g(f"{q}.to_v.weight")),
            "to_out": linear_to_dense(g(f"{q}.to_out.0.weight"),
                                      g(f"{q}.to_out.0.bias")),
        }

    def ln(q):
        return {"scale": g(f"{q}.weight"), "bias": g(f"{q}.bias")}

    out = {
        "norm": _sd_gn(sd, f"{p}.norm"),
        "proj_in": conv2d_to_flax(g("proj_in.weight"), g("proj_in.bias")),
        "proj_out": conv2d_to_flax(g("proj_out.weight"), g("proj_out.bias")),
    }
    for i in range(depth):
        b = f"transformer_blocks.{i}"
        out[f"block_{i}"] = {
            "attn1": xattn(f"{b}.attn1"),
            "norm1": ln(f"{b}.norm1"),
            "attn2": xattn(f"{b}.attn2"),
            "norm2": ln(f"{b}.norm2"),
            "norm3": ln(f"{b}.norm3"),
            "ff_proj": linear_to_dense(g(f"{b}.ff.net.0.proj.weight"),
                                       g(f"{b}.ff.net.0.proj.bias")),
            "ff_out": linear_to_dense(g(f"{b}.ff.net.2.weight"),
                                      g(f"{b}.ff.net.2.bias")),
        }
    return out


def audioldm_unet_to_flax(sd: Mapping[str, np.ndarray], *,
                          channel_mults: tuple[int, ...],
                          num_res_blocks: int,
                          attention_resolutions: tuple[int, ...],
                          transformer_depth: int = 1,
                          prefix: str = "unet") -> dict:
    """Reference AudioLDM UNetModel state dict → our AudioLDM params."""
    sd = {k[len(prefix) + 1:]: v for k, v in sd.items()
          if k.startswith(f"{prefix}.")} if prefix else dict(sd)
    g = lambda n: np.asarray(sd[n])
    params: dict = {
        "time_embed_0": linear_to_dense(g("time_embed.0.weight"),
                                        g("time_embed.0.bias")),
        "time_embed_2": linear_to_dense(g("time_embed.2.weight"),
                                        g("time_embed.2.bias")),
        "input_0_0": conv2d_to_flax(g("input_blocks.0.0.weight"),
                                    g("input_blocks.0.0.bias")),
        "out_norm": _sd_gn(sd, "out.0"),
        "out_conv": conv2d_to_flax(g("out.2.weight"), g("out.2.bias")),
    }
    idx = 1
    ds = 1
    for level in range(len(channel_mults)):
        for _ in range(num_res_blocks):
            params[f"input_{idx}_0"] = _sd_resblock(
                sd, f"input_blocks.{idx}.0")
            if ds in attention_resolutions:
                params[f"input_{idx}_1"] = _sd_spatial_transformer(
                    sd, f"input_blocks.{idx}.1", transformer_depth)
            idx += 1
        if level != len(channel_mults) - 1:
            params[f"input_{idx}_0"] = {"op": conv2d_to_flax(
                g(f"input_blocks.{idx}.0.op.weight"),
                g(f"input_blocks.{idx}.0.op.bias"))}
            idx += 1
            ds *= 2
    params["middle_0"] = _sd_resblock(sd, "middle_block.0")
    params["middle_1"] = _sd_spatial_transformer(sd, "middle_block.1",
                                                 transformer_depth)
    params["middle_2"] = _sd_resblock(sd, "middle_block.2")
    idx = 0
    for level in list(range(len(channel_mults)))[::-1]:
        for i in range(num_res_blocks + 1):
            params[f"output_{idx}_0"] = _sd_resblock(
                sd, f"output_blocks.{idx}.0")
            j = 1
            if ds in attention_resolutions:
                params[f"output_{idx}_{j}"] = _sd_spatial_transformer(
                    sd, f"output_blocks.{idx}.{j}", transformer_depth)
                j += 1
            if level and i == num_res_blocks:
                params[f"output_{idx}_{j}"] = {"conv": conv2d_to_flax(
                    g(f"output_blocks.{idx}.{j}.conv.weight"),
                    g(f"output_blocks.{idx}.{j}.conv.bias"))}
                ds //= 2
            idx += 1
    return params


def autoencoder_kl_to_flax(sd: Mapping[str, np.ndarray], *,
                           channel_mults: tuple[int, ...],
                           num_res_blocks: int = 2) -> dict:
    """Reference AutoencoderKL (models/tta/autoencoder/autoencoder.py:356)
    → our AutoencoderKL params."""
    g = lambda n: np.asarray(sd[n])

    def res(p):
        out = {
            "norm1": {"scale": g(f"{p}.norm1.weight"),
                      "bias": g(f"{p}.norm1.bias")},
            "conv1": conv2d_to_flax(g(f"{p}.conv1.weight"),
                                    g(f"{p}.conv1.bias")),
            "norm2": {"scale": g(f"{p}.norm2.weight"),
                      "bias": g(f"{p}.norm2.bias")},
            "conv2": conv2d_to_flax(g(f"{p}.conv2.weight"),
                                    g(f"{p}.conv2.bias")),
        }
        if f"{p}.nin_shortcut.weight" in sd:
            out["nin_shortcut"] = conv2d_to_flax(
                g(f"{p}.nin_shortcut.weight"), g(f"{p}.nin_shortcut.bias"))
        return out

    n = len(channel_mults)
    enc: dict = {
        "conv_in": conv2d_to_flax(g("encoder.conv_in.weight"),
                                  g("encoder.conv_in.bias")),
        "mid_block_1": res("encoder.mid.block_1"),
        "mid_block_2": res("encoder.mid.block_2"),
        "norm_out": {"scale": g("encoder.norm_out.weight"),
                     "bias": g("encoder.norm_out.bias")},
        "conv_out": conv2d_to_flax(g("encoder.conv_out.weight"),
                                   g("encoder.conv_out.bias")),
    }
    for i in range(n):
        for j in range(num_res_blocks):
            enc[f"down_{i}_block_{j}"] = res(f"encoder.down.{i}.block.{j}")
        if i != n - 1:
            enc[f"down_{i}_downsample"] = {"conv": conv2d_to_flax(
                g(f"encoder.down.{i}.downsample.conv.weight"),
                g(f"encoder.down.{i}.downsample.conv.bias"))}
    dec: dict = {
        "conv_in": conv2d_to_flax(g("decoder.conv_in.weight"),
                                  g("decoder.conv_in.bias")),
        "mid_block_1": res("decoder.mid.block_1"),
        "mid_block_2": res("decoder.mid.block_2"),
        "norm_out": {"scale": g("decoder.norm_out.weight"),
                     "bias": g("decoder.norm_out.bias")},
        "conv_out": conv2d_to_flax(g("decoder.conv_out.weight"),
                                   g("decoder.conv_out.bias")),
    }
    for i in range(n):
        for j in range(num_res_blocks + 1):
            dec[f"up_{i}_block_{j}"] = res(f"decoder.up.{i}.block.{j}")
        if i != 0:
            dec[f"up_{i}_upsample"] = {"conv": conv2d_to_flax(
                g(f"decoder.up.{i}.upsample.conv.weight"),
                g(f"decoder.up.{i}.upsample.conv.bias"))}
    return {
        "encoder": enc, "decoder": dec,
        "quant_conv": conv2d_to_flax(g("quant_conv.weight"),
                                     g("quant_conv.bias")),
        "post_quant_conv": conv2d_to_flax(g("post_quant_conv.weight"),
                                          g("post_quant_conv.bias")),
    }


def svc_diffusion_wrapper_to_flax(sd: Mapping[str, np.ndarray],
                                  num_layers: int,
                                  t_mlp_layers: int = 2) -> dict:
    """Reference DiffusionWrapper (models/svc/diffusion/diffusion_wrapper
    .py: PositionEncoder + BiDilConv) → our WaveNetDenoiser params."""
    g = lambda n: np.asarray(sd[n])
    params: dict = {
        "in_proj": conv1d_to_flax(g("neural_network.input.0.weight"),
                                  g("neural_network.input.0.bias")),
        "post1": conv1d_to_flax(g("neural_network.out_proj.0.weight"),
                                g("neural_network.out_proj.0.bias")),
        "post2": conv1d_to_flax(g("neural_network.out_proj.2.weight"),
                                g("neural_network.out_proj.2.bias")),
    }
    # PositionEncoder MLP: out.{0,2,...} Linears
    for k in range(t_mlp_layers):
        params[f"t_mlp_{k}"] = linear_to_dense(
            g(f"diff_encoder.out.{2 * k}.weight"),
            g(f"diff_encoder.out.{2 * k}.bias"))
    params["t_mlp_out"] = linear_to_dense(
        g(f"diff_encoder.out.{2 * t_mlp_layers}.weight"),
        g(f"diff_encoder.out.{2 * t_mlp_layers}.bias"))
    for i in range(num_layers):
        p = f"neural_network.residual_blocks.{i}"
        params[f"dil_{i}"] = conv1d_to_flax(g(f"{p}.gau.conv.weight"),
                                            g(f"{p}.gau.conv.bias"))
        if f"{p}.gau.context_proj.weight" in sd:
            params[f"cond_{i}"] = conv1d_to_flax(
                g(f"{p}.gau.context_proj.weight"),
                g(f"{p}.gau.context_proj.bias"))
        params[f"out_{i}"] = conv1d_to_flax(g(f"{p}.out_proj.weight"),
                                            g(f"{p}.out_proj.bias"))
    return params


# ---------------------------------------------------------------------------
# SpeechTokenizer — ref models/codec/speechtokenizer/
# ---------------------------------------------------------------------------


def _torch_lstm_layer_to_flax(sd: Mapping[str, np.ndarray], prefix: str,
                              layer: int, reverse: bool = False) -> dict:
    """One torch nn.LSTM layer → flax OptimizedLSTMCell params. torch
    packs gates [i, f, g, o]; flax has per-gate dense (input gates without
    bias), so b_ih + b_hh folds into the hidden-gate biases."""
    sfx = f"weight_ih_l{layer}" + ("_reverse" if reverse else "")
    w_ih = np.asarray(sd[f"{prefix}.{sfx}"])
    w_hh = np.asarray(sd[f"{prefix}.{sfx.replace('ih', 'hh')}"])
    b = (np.asarray(sd[f"{prefix}.{sfx.replace('weight', 'bias')}"])
         + np.asarray(sd[f"{prefix}.{sfx.replace('weight_ih', 'bias_hh')}"]))
    h = w_hh.shape[1]
    out: dict = {}
    for gi, gate in enumerate(("i", "f", "g", "o")):
        out[f"i{gate}"] = {"kernel": np.ascontiguousarray(
            w_ih[gi * h:(gi + 1) * h].T)}
        out[f"h{gate}"] = {"kernel": np.ascontiguousarray(
            w_hh[gi * h:(gi + 1) * h].T),
            "bias": b[gi * h:(gi + 1) * h]}
    return out


def _slstm_to_flax(sd: Mapping[str, np.ndarray], prefix: str,
                   num_layers: int, bidirectional: bool) -> dict:
    # flax binds the cells at the SLSTM scope as OptimizedLSTMCell_{k}
    # in creation order (fwd, [bwd], per layer)
    out: dict = {}
    k = 0
    for i in range(num_layers):
        out[f"OptimizedLSTMCell_{k}"] = _torch_lstm_layer_to_flax(
            sd, f"{prefix}.lstm", i)
        k += 1
        if bidirectional:
            out[f"OptimizedLSTMCell_{k}"] = _torch_lstm_layer_to_flax(
                sd, f"{prefix}.lstm", i, reverse=True)
            k += 1
    return out


def _seanet_resblock_to_flax(sd: Mapping[str, np.ndarray], prefix: str,
                             activation: str = "ELU") -> dict:
    def conv(p):
        return _plain_or_wn(sd, f"{p}.conv.conv", "conv1d")

    # block indices: [act, conv, act, conv] → block.1, block.3
    c0, c1 = conv(f"{prefix}.block.1"), conv(f"{prefix}.block.3")
    sc = conv(f"{prefix}.shortcut")
    out = {
        "conv_0": c0["layer"], "WeightNorm_0": {"conv_0/kernel/scale": c0["scale"]},
        "conv_1": c1["layer"], "WeightNorm_1": {"conv_1/kernel/scale": c1["scale"]},
        "shortcut": sc["layer"],
        "WeightNorm_2": {"shortcut/kernel/scale": sc["scale"]},
    }
    if activation == "Snake":
        out["act_0"] = {"alpha": np.asarray(
            sd[f"{prefix}.block.0.alpha"]).reshape(-1)}
        out["act_1"] = {"alpha": np.asarray(
            sd[f"{prefix}.block.2.alpha"]).reshape(-1)}
    return out


def speechtokenizer_to_flax(sd: Mapping[str, np.ndarray], *,
                            strides: tuple[int, ...],
                            n_residual_layers: int = 1,
                            lstm_layers: int = 2,
                            bidirectional: bool = True,
                            n_q: int = 8,
                            activation: str = "ELU") -> dict:
    """Reference SpeechTokenizer (model.py:14) → our params. The SEANet
    Sequential indices are reconstructed from the architecture."""
    n = len(strides)

    def conv(p):
        c = _plain_or_wn(sd, f"{p}.conv.conv", "conv1d")
        return c

    # ---- encoder: [conv_in] + per-ratio (res x L, act, down) + lstm +
    # act + conv_out
    enc: dict = {}
    wn_i = 0

    def put(d, fname, c):
        nonlocal wn_i
        d[fname] = c["layer"]
        d[f"WeightNorm_{wn_i}"] = {f"{fname}/kernel/scale": c["scale"]}
        wn_i += 1

    idx = 0
    put(enc, "conv_in", conv(f"encoder.model.{idx}"))
    idx += 1
    for i in range(n):
        for j in range(n_residual_layers):
            enc[f"block_{i}_{j}"] = _seanet_resblock_to_flax(
                sd, f"encoder.model.{idx}", activation)
            idx += 1
        if activation == "Snake":
            enc[f"down_act_{i}"] = {"alpha": np.asarray(
                sd[f"encoder.model.{idx}.alpha"]).reshape(-1)}
        idx += 1  # activation
        put(enc, f"down_{i}", conv(f"encoder.model.{idx}"))
        idx += 1
    enc["lstm"] = _slstm_to_flax(sd, f"encoder.model.{idx}", lstm_layers,
                                 bidirectional)
    idx += 1
    if activation == "Snake":
        enc["final_act"] = {"alpha": np.asarray(
            sd[f"encoder.model.{idx}.alpha"]).reshape(-1)}
    idx += 1
    put(enc, "conv_out", conv(f"encoder.model.{idx}"))

    # ---- decoder: [conv_in, lstm] + per-ratio (act, up, res x L) +
    # act + conv_out
    dec: dict = {}
    wn_i = 0
    idx = 0
    put(dec, "conv_in", conv(f"decoder.model.{idx}"))
    idx += 1
    dec["lstm"] = _slstm_to_flax(sd, f"decoder.model.{idx}", lstm_layers,
                                 False)
    idx += 1
    for i in range(n):
        if activation == "Snake":
            dec[f"up_act_{i}"] = {"alpha": np.asarray(
                sd[f"decoder.model.{idx}.alpha"]).reshape(-1)}
        idx += 1  # activation
        up = _plain_or_wn(sd, f"decoder.model.{idx}.convtr.convtr",
                          "convtranspose1d")
        dec[f"up_{i}"] = {
            "convtr": up["layer"],
            "WeightNorm_0": {"convtr/kernel/scale": up["scale"]},
        }
        idx += 1
        for j in range(n_residual_layers):
            dec[f"block_{i}_{j}"] = _seanet_resblock_to_flax(
                sd, f"decoder.model.{idx}", activation)
            idx += 1
    if activation == "Snake":
        dec["final_act"] = {"alpha": np.asarray(
            sd[f"decoder.model.{idx}.alpha"]).reshape(-1)}
    idx += 1
    put(dec, "conv_out", conv(f"decoder.model.{idx}"))

    params: dict = {"encoder": enc, "decoder": dec}
    q: dict = {}
    for i in range(n_q):
        q[f"codebook_{i}"] = np.asarray(
            sd[f"quantizer.vq.layers.{i}._codebook.embed"])
    params["quantizer"] = q
    if "transform.weight" in sd:
        params["semantic"] = linear_to_dense(
            np.asarray(sd["transform.weight"]),
            np.asarray(sd["transform.bias"]))
    return params


def hf_encodec_to_flax(sd: Mapping[str, np.ndarray], *,
                       ratios: tuple[int, ...] = (8, 5, 4, 2),
                       n_residual_layers: int = 1,
                       lstm_layers: int = 2,
                       n_q: int = 8) -> dict:
    """facebook/encodec_24khz (transformers `EncodecModel` state-dict
    names — the weight-compatible port of the `encodec` pip package the
    reference loads, `/root/reference/utils/tokenizer.py:29`) → our
    `models/codec/encodec.EncodecModel` params.

    Layer indices follow the HF module list: encoder
    [conv, (res, elu, down)×4, lstm, elu, conv], decoder
    [conv, lstm, (elu, convtr, res)×4, elu, conv]. Handles both legacy
    ``weight_g/v`` and torch>=2.1 ``parametrizations`` weight-norm names
    (`_plain_or_wn`)."""
    n = len(ratios)

    def conv(p):
        return _plain_or_wn(sd, f"{p}.conv", "conv1d")

    def resblock(p):
        c0 = _plain_or_wn(sd, f"{p}.block.1.conv", "conv1d")
        c1 = _plain_or_wn(sd, f"{p}.block.3.conv", "conv1d")
        sc = _plain_or_wn(sd, f"{p}.shortcut.conv", "conv1d")
        return {
            "conv_0": c0["layer"],
            "WeightNorm_0": {"conv_0/kernel/scale": c0["scale"]},
            "conv_1": c1["layer"],
            "WeightNorm_1": {"conv_1/kernel/scale": c1["scale"]},
            "shortcut": sc["layer"],
            "WeightNorm_2": {"shortcut/kernel/scale": sc["scale"]},
        }

    enc: dict = {}
    wn_i = 0

    def put(d, fname, c):
        nonlocal wn_i
        d[fname] = c["layer"]
        d[f"WeightNorm_{wn_i}"] = {f"{fname}/kernel/scale": c["scale"]}
        wn_i += 1

    idx = 0
    put(enc, "conv_in", conv(f"encoder.layers.{idx}"))
    idx += 1
    for i in range(n):
        for j in range(n_residual_layers):
            enc[f"block_{i}_{j}"] = resblock(f"encoder.layers.{idx}")
            idx += 1
        idx += 1  # ELU
        put(enc, f"down_{i}", conv(f"encoder.layers.{idx}"))
        idx += 1
    enc["lstm"] = _slstm_to_flax(sd, f"encoder.layers.{idx}", lstm_layers,
                                 False)
    idx += 2  # lstm, ELU
    put(enc, "conv_out", conv(f"encoder.layers.{idx}"))

    dec: dict = {}
    wn_i = 0
    idx = 0
    put(dec, "conv_in", conv(f"decoder.layers.{idx}"))
    idx += 1
    dec["lstm"] = _slstm_to_flax(sd, f"decoder.layers.{idx}", lstm_layers,
                                 False)
    idx += 1
    for i in range(n):
        idx += 1  # ELU
        up = _plain_or_wn(sd, f"decoder.layers.{idx}.conv",
                          "convtranspose1d")
        dec[f"up_{i}"] = {
            "convtr": up["layer"],
            "WeightNorm_0": {"convtr/kernel/scale": up["scale"]},
        }
        idx += 1
        for j in range(n_residual_layers):
            dec[f"block_{i}_{j}"] = resblock(f"decoder.layers.{idx}")
            idx += 1
    idx += 1  # ELU
    put(dec, "conv_out", conv(f"decoder.layers.{idx}"))

    q = {f"codebook_{i}": np.asarray(sd[f"quantizer.layers.{i}"
                                        f".codebook.embed"])
         for i in range(n_q)}
    return {"encoder": enc, "decoder": dec, "quantizer": q}


def coco_to_flax(sd: Mapping[str, np.ndarray], *, mode: str = "contentstyle",
                 downsample: int = 4, num_blocks: int = 12,
                 num_quantizers: int = 1) -> dict:
    """Reference Coco tokenizer (rep_coco_model.py:33) → our CocoCodec."""
    import math as _math

    g = lambda n: np.asarray(sd[n])
    params: dict = {
        "enc_backbone": _vocos_backbone_to_flax(sd, "encoder.0", num_blocks),
        "enc_out": linear_to_dense(g("encoder.1.weight"), g("encoder.1.bias")),
        "dec_backbone": _vocos_backbone_to_flax(sd, "decoder.0", num_blocks),
        "dec_out": linear_to_dense(g("decoder.1.weight"), g("decoder.1.bias")),
        "quantizer": torch_residual_vq_to_flax(sd, num_quantizers),
    }
    if mode in ("contentstyle", "content"):
        params["whisper_input_layer"] = linear_to_dense(
            g("whisper_input_layer.weight"), g("whisper_input_layer.bias"))
        params["whisper_output_layer"] = linear_to_dense(
            g("whisper_output_layer.weight"), g("whisper_output_layer.bias"))
    if mode in ("contentstyle", "style"):
        params["chromagram_input_layer"] = linear_to_dense(
            g("chromagram_input_layer.weight"),
            g("chromagram_input_layer.bias"))
        params["chromagram_output_layer"] = linear_to_dense(
            g("chromagram_output_layer.weight"),
            g("chromagram_output_layer.bias"))
    n_down = int(_math.log2(downsample)) if downsample > 1 else 0
    for k in range(n_down):
        params[f"down_{k}"] = conv1d_to_flax(
            g(f"downsample_layers.{2 * k}.weight"),
            g(f"downsample_layers.{2 * k}.bias"))
        params[f"up_{k}"] = convtranspose1d_to_flax(
            g(f"upsample_layers.{2 * k}.weight"),
            g(f"upsample_layers.{2 * k}.bias"))
    return params


# ---------------------------------------------------------------------------
# Noro — ref models/vc/Noro/noro_model.py
# ---------------------------------------------------------------------------


def noro_reference_encoder_to_flax(sd: Mapping[str, np.ndarray],
                                   prefix: str, num_layers: int) -> dict:
    """ref ReferenceEncoder (noro_model.py:701) → our ReferenceEncoder."""
    g = lambda n: np.asarray(sd[f"{prefix}.{n}"])
    out: dict = {
        "transformer_encoder": _ns3_transformer_to_flax(
            {k[len(prefix) + 1:]: v for k, v in sd.items()
             if k.startswith(f"{prefix}.transformer_encoder.")},
            "transformer_encoder", num_layers),
        "query_embs": {"embedding": g("query_embs.weight")},
        "query_attn": _torch_mha_to_flax(sd, f"{prefix}.query_attn"),
    }
    if f"{prefix}.in_linear.weight" in sd:
        out["in_linear"] = linear_to_dense(g("in_linear.weight"),
                                           g("in_linear.bias"))
    return out


def noro_to_flax(sd: Mapping[str, np.ndarray], *, ref_layers: int,
                 wavenet_layers: int, cattn_every: int = 3) -> dict:
    """ref Noro_VCmodel (noro_model.py:1119) → our Noro params."""
    g = lambda n: np.asarray(sd[n])
    wn_sd = {k[len("diffusion.diff_estimator."):]: v for k, v in sd.items()
             if k.startswith("diffusion.diff_estimator.")}
    return {
        "reference_encoder": noro_reference_encoder_to_flax(
            sd, "reference_encoder", ref_layers),
        "content_f0_ln": {"scale": g("content_f0_enc.0.weight"),
                          "bias": g("content_f0_enc.0.bias")},
        "content_f0_conv": conv1d_to_flax(g("content_f0_enc.2.weight"),
                                          g("content_f0_enc.2.bias")),
        "diffusion": {"diff_estimator": ns2_wavenet_to_flax(
            wn_sd, wavenet_layers, cattn_every)},
    }


def vevo_repcodec_to_flax(sd: Mapping[str, np.ndarray], *,
                          enc_strides: tuple[int, ...] = (1, 1),
                          dec_strides: tuple[int, ...] = (1, 1),
                          block_dilations: tuple[int, ...] = (1, 1),
                          codebook_num: int = 1) -> dict:
    """Reference VevoRepCodec (vevo_repcodec.py:526) → our VevoRepCodec."""
    g = lambda n: np.asarray(sd[n])

    def conv(p, transpose=False):
        w = g(f"{p}.weight")
        b = g(f"{p}.bias") if f"{p}.bias" in sd else None
        return (convtranspose1d_to_flax(w, b) if transpose
                else conv1d_to_flax(w, b))

    def resunit(flax_prefix, tp):
        return {
            f"{flax_prefix}": {
                "conv1": conv(f"{tp}.conv1.conv"),
                "conv2": conv(f"{tp}.conv2"),
            }
        }

    enc: dict = {
        "enc_conv": conv("encoder.conv.conv"),
        "projector": conv("projector.project.conv"),
    }
    for i, s in enumerate(enc_strides):
        for j in range(len(block_dilations)):
            enc.update(resunit(
                f"enc_{i}_res_{j}", f"encoder.conv_blocks.{i}.res_units.{j}"))
        enc[f"enc_{i}_down"] = conv(f"encoder.conv_blocks.{i}.conv.conv")
    dec: dict = {
        "dec_conv1": conv("decoder.conv1.conv"),
        "dec_conv2": conv("decoder.conv2.conv"),
    }
    for i, s in enumerate(dec_strides):
        tp = f"decoder.conv_blocks.{i}.conv"
        dec[f"dec_{i}_up"] = conv(
            f"{tp}.conv" if s == 1 else f"{tp}.deconv", transpose=(s != 1))
        for j in range(len(block_dilations)):
            dec.update(resunit(
                f"dec_{i}_res_{j}", f"decoder.conv_blocks.{i}.res_units.{j}"))
    params: dict = {"enc": enc, "dec": dec}
    for i in range(codebook_num):
        # torch stores embed as (dim, n_embed) — transpose to (n, dim)
        params[f"codebook_{i}"] = np.ascontiguousarray(
            g(f"quantizer.codebook.layers.{i}.embed").T)
    return params


def jets_alignment_to_flax(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference JETS `AlignmentModule` (models/tts/jets/alignments.py:15)
    → our `models/tts/jets/alignments.AlignmentModule` params."""
    g = lambda n: np.asarray(sd[n])
    return {
        name: conv1d_to_flax(g(f"{name}.weight"), g(f"{name}.bias"))
        for name in ("t_conv1", "t_conv2", "f_conv1", "f_conv2", "f_conv3")
    }


def valle_ref_to_flax(sd: Mapping[str, np.ndarray], *,
                      num_layers: int, num_quantizers: int = 8) -> dict:
    """Reference VALLE state dict (models/tts/valle/valle.py:25) → our
    `ValleRef` params. Packed-QKV encoder layers, learnable positional
    alphas on the AR branch, adaptive layer norms + per-stage embeddings
    on the NAR branch; `share_embedding` ties arrive naturally (the tied
    tensors are identical in the state dict)."""
    g = lambda name: np.asarray(sd[name])

    def layer(prefix: str, adaptive: bool) -> dict:
        p: dict = {
            "in_proj": linear_to_dense(g(f"{prefix}.self_attn.in_proj_weight"),
                                       g(f"{prefix}.self_attn.in_proj_bias")),
            "out_proj": linear_to_dense(g(f"{prefix}.self_attn.out_proj.weight"),
                                        g(f"{prefix}.self_attn.out_proj.bias")),
            "linear1": linear_to_dense(g(f"{prefix}.linear1.weight"),
                                       g(f"{prefix}.linear1.bias")),
            "linear2": linear_to_dense(g(f"{prefix}.linear2.weight"),
                                       g(f"{prefix}.linear2.bias")),
        }
        for n in ("norm1", "norm2"):
            if adaptive:
                p[n] = {
                    "project_layer": linear_to_dense(
                        g(f"{prefix}.{n}.project_layer.weight"),
                        g(f"{prefix}.{n}.project_layer.bias")),
                    "norm": {"scale": g(f"{prefix}.{n}.norm.weight"),
                             "bias": g(f"{prefix}.{n}.norm.bias")},
                }
            else:
                p[n] = {"scale": g(f"{prefix}.{n}.weight"),
                        "bias": g(f"{prefix}.{n}.bias")}
        return p

    params: dict = {
        "ar_text_embedding": {
            "embedding": g("ar_text_embedding.word_embeddings.weight")},
        "ar_audio_embedding": {
            "embedding": g("ar_audio_embedding.word_embeddings.weight")},
        "ar_text_position": {"alpha": g("ar_text_position.alpha")},
        "ar_audio_position": {"alpha": g("ar_audio_position.alpha")},
        "ar_predict_layer": {"kernel": g("ar_predict_layer.weight").T},
    }
    for i in range(num_layers):
        params[f"ar_layer_{i}"] = layer(f"ar_decoder.layers.{i}", False)
    if "ar_decoder.norm.weight" in sd:
        params["ar_final_norm"] = {"scale": g("ar_decoder.norm.weight"),
                                   "bias": g("ar_decoder.norm.bias")}
    if num_quantizers > 1:
        params["nar_text_embedding"] = {
            "embedding": g("nar_text_embedding.word_embeddings.weight")}
        for j in range(num_quantizers):
            params[f"nar_audio_embedding_{j}"] = {"embedding": g(
                f"nar_audio_embeddings.{j}.word_embeddings.weight")}
        for i in range(num_layers):
            params[f"nar_layer_{i}"] = layer(f"nar_decoder.layers.{i}", True)
        if "nar_decoder.norm.norm.weight" in sd:
            params["nar_final_norm"] = {
                "project_layer": linear_to_dense(
                    g("nar_decoder.norm.project_layer.weight"),
                    g("nar_decoder.norm.project_layer.bias")),
                "norm": {"scale": g("nar_decoder.norm.norm.weight"),
                         "bias": g("nar_decoder.norm.norm.bias")},
            }
        for j in range(num_quantizers - 1):
            params[f"nar_predict_{j}"] = {
                "kernel": g(f"nar_predict_layers.{j}.weight").T}
            params[f"nar_stage_emb_{j}"] = g(
                f"nar_stage_embeddings.{j}.word_embeddings.weight")[0]
    return params


def torch_jets_to_flax(sd: Mapping[str, np.ndarray], *,
                       enc_layers: int, dec_layers: int,
                       upsample_rates: tuple[int, ...],
                       resblock_kernel_sizes: tuple[int, ...],
                       resblock: str = "1",
                       dilations_per_block: int = 3) -> dict:
    """Reference Jets generator (models/tts/jets/jets.py:391) → our `Jets`
    params: legacy FFT encoder/decoder, variance predictors, alignment
    module, pitch/energy conv embeds, HiFiGAN generator. The reference's
    unused-at-train mel_linear/postnet and bucketized variance embedding
    tables are dropped (never used in its forward/inference)."""
    g = lambda name: np.asarray(sd[name])
    params: dict = {
        "phone_embed": {"embedding": g("encoder.src_word_emb.weight")},
        "alignment_module": jets_alignment_to_flax(
            {k[len("alignment_module."):]: v for k, v in sd.items()
             if k.startswith("alignment_module.")}),
        "duration_predictor": _fs2_variance_predictor(
            sd, "variance_adaptor.duration_predictor"),
        "pitch_predictor": _fs2_variance_predictor(
            sd, "variance_adaptor.pitch_predictor"),
        "energy_predictor": _fs2_variance_predictor(
            sd, "variance_adaptor.energy_predictor"),
        "pitch_embed": conv1d_to_flax(g("pitch_embed.0.weight"),
                                      g("pitch_embed.0.bias")),
        "energy_embed": conv1d_to_flax(g("energy_embed.0.weight"),
                                       g("energy_embed.0.bias")),
        "decoder": torch_hifigan_to_flax(
            {k[len("generator."):]: v for k, v in sd.items()
             if k.startswith("generator.")},
            num_upsamples=len(upsample_rates),
            num_kernels=len(resblock_kernel_sizes), resblock=resblock,
            dilations_per_block=dilations_per_block),
    }
    for i in range(enc_layers):
        params[f"enc_{i}"] = _fs2_fft_block(sd, f"encoder.layer_stack.{i}")
    for i in range(dec_layers):
        params[f"dec_{i}"] = _fs2_fft_block(sd, f"decoder.layer_stack.{i}")
    if "speaker_emb.weight" in sd:
        params["spk"] = embedding_to_flax(g("speaker_emb.weight"))
    return params


def condition_encoder_to_flax(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference SVC `ConditionEncoder`
    (modules/encoder/condition_encoder.py:147) → our
    `modules/condition_encoder.ConditionEncoder` params. Streams absent
    from the state dict are simply skipped."""
    g = lambda n: np.asarray(sd[n])
    params: dict = {}
    if "melody_encoder.nn.weight" in sd:
        params["melody"] = {"f0_embed": {"embedding": g("melody_encoder.nn.weight")}}
        if "melody_encoder.uv_embedding.weight" in sd:
            params["melody"]["uv_embed"] = {
                "embedding": g("melody_encoder.uv_embedding.weight")}
    if "loudness_encoder.nn.weight" in sd:
        params["energy_bins"] = g("loudness_encoder.energy_bins")
        params["loudness_embed"] = {"embedding": g("loudness_encoder.nn.weight")}
    for name in ("whisper", "contentvec", "mert", "wenet"):
        key = f"{name}_encoder.nn.weight"
        if key in sd:
            params[f"{name}_proj"] = {
                "kernel": g(key).T, "bias": g(f"{name}_encoder.nn.bias")}
    if "singer_encoder.nn.weight" in sd:
        params["singer_embed"] = {"embedding": g("singer_encoder.nn.weight")}
    return params


def _sub_state_dict(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _wn_1x1_to_dense(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """weight-normed 1x1 Conv1d → plain Dense params (materialized)."""
    out = torch_weight_norm_to_flax(
        np.asarray(sd[f"{prefix}.weight_g"]),
        np.asarray(sd[f"{prefix}.weight_v"]), "conv1d",
        np.asarray(sd[f"{prefix}.bias"]) if f"{prefix}.bias" in sd else None)
    layer = out["layer"]
    d = {"kernel": layer["kernel"][0]}  # (1, in, out) → (in, out)
    if "bias" in layer:
        d["bias"] = layer["bias"]
    return d


def _dual_convnext_block(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """DualCodec ConvNeXtBlock (dualcodec/model_codec/cnn.py:12) → our
    DualConvNeXtBlock params."""
    g = lambda n: np.asarray(sd[f"{prefix}.{n}"])
    return {
        "dwconv": conv1d_to_flax(g("dwconv.weight"), g("dwconv.bias")),
        "norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
        "pwconv1": linear_to_dense(g("pwconv1.weight"), g("pwconv1.bias")),
        "pwconv2": linear_to_dense(g("pwconv2.weight"), g("pwconv2.bias")),
    }


def dualcodec_to_flax(sd: Mapping[str, np.ndarray], *,
                      strides: tuple[int, ...], n_codebooks: int,
                      convnext_layers: int) -> dict:
    """Reference DualCodec (dualcodec/model_codec/dualcodec_model.py:30)
    state dict → our `models/codec/dualcodec.DualCodec` params."""
    params: dict = {
        "encoder": torch_codec_encoder_to_flax(
            _sub_state_dict(sd, "dac.encoder."), strides=strides),
        "decoder": torch_codec_decoder_to_flax(
            _sub_state_dict(sd, "dac.decoder."), up_ratios=tuple(
                reversed(strides)), prefix="model"),
        "quantizer": {
            f"q{i}": torch_fvq_to_flax(
                sd, prefix=f"dac.quantizer.quantizers.{i}.",
                in_name="in_proj", out_name="out_proj")
            for i in range(n_codebooks)
        },
        "semantic_vq": torch_fvq_to_flax(
            sd, prefix="semantic_vq.quantizers.0.",
            in_name="in_proj", out_name="out_proj"),
        "semantic_in": _wn_1x1_to_dense(sd, "convnext_encoder.0"),
        "semantic_out": _wn_1x1_to_dense(
            sd, f"convnext_decoder.{convnext_layers}"),
    }
    for i in range(convnext_layers):
        params[f"sem_enc_{i}"] = _dual_convnext_block(
            sd, f"convnext_encoder.{i + 1}")
        params[f"sem_dec_{i}"] = _dual_convnext_block(
            sd, f"convnext_decoder.{i}")
    return params


def torch_encoder_layer_to_flax(sd: Mapping[str, np.ndarray],
                                prefix: str) -> dict:
    """`torch.nn.TransformerEncoderLayer` → our
    `modules/transformer.TorchEncoderLayer` params (packed QKV kept)."""
    g = lambda n: np.asarray(sd[f"{prefix}.{n}"])
    return {
        "in_proj": {"kernel": g("self_attn.in_proj_weight").T,
                    "bias": g("self_attn.in_proj_bias")},
        "out_proj": linear_to_dense(g("self_attn.out_proj.weight"),
                                    g("self_attn.out_proj.bias")),
        "linear1": linear_to_dense(g("linear1.weight"), g("linear1.bias")),
        "linear2": linear_to_dense(g("linear2.weight"), g("linear2.bias")),
        "norm1": {"scale": g("norm1.weight"), "bias": g("norm1.bias")},
        "norm2": {"scale": g("norm2.weight"), "bias": g("norm2.bias")},
    }


def transformer_svc_to_flax(cond_sd: Mapping[str, np.ndarray],
                            mapper_sd: Mapping[str, np.ndarray],
                            num_layers: int) -> dict:
    """Reference TransformerSVC (condition encoder + acoustic mapper
    `models/svc/transformer/transformer.py:12`) → our `TransformerSVC`."""
    params: dict = {"condition": condition_encoder_to_flax(cond_sd)}
    for i in range(num_layers):
        params[f"layer_{i}"] = torch_encoder_layer_to_flax(
            mapper_sd, f"transformer_encoder.layers.{i}")
    params["mel_out"] = linear_to_dense(
        np.asarray(mapper_sd["output_mlp.weight"]),
        np.asarray(mapper_sd["output_mlp.bias"]))
    return params


def comosvc_to_flax(cond_sd: Mapping[str, np.ndarray],
                    model_sd: Mapping[str, np.ndarray], *,
                    n_layers: int, denoiser_layers: int,
                    t_mlp_layers: int = 2) -> dict:
    """Reference ComoSVC (condition encoder + Conformer prior encoder +
    Consistency decoder, models/svc/comosvc/comosvc.py:315) → our
    `models/svc/comosvc.ComoSVC` params."""
    t = lambda n: np.asarray(model_sd[n])

    def ln(p: str) -> dict:
        return {"scale": t(f"{p}.gamma"), "bias": t(f"{p}.beta")}

    enc: dict = {}
    for i in range(n_layers):
        a = f"encoder.conformer_encoder.attn_layers.{i}"
        enc[f"MultiHeadAttention_{i}"] = {
            "q": _dense_from_conv1x1(model_sd, f"{a}.conv_q"),
            "k": _dense_from_conv1x1(model_sd, f"{a}.conv_k"),
            "v": _dense_from_conv1x1(model_sd, f"{a}.conv_v"),
            "out": _dense_from_conv1x1(model_sd, f"{a}.conv_o"),
            "rel_k": t(f"{a}.emb_rel_k")[0],
            "rel_v": t(f"{a}.emb_rel_v")[0],
        }
        f = f"encoder.conformer_encoder.ffn_layers.{i}"
        enc[f"ConvFFN_{i}"] = {
            "Conv_0": conv1d_to_flax(t(f"{f}.conv_1.weight"),
                                     t(f"{f}.conv_1.bias")),
            "Conv_1": conv1d_to_flax(t(f"{f}.conv_2.weight"),
                                     t(f"{f}.conv_2.bias")),
        }
        enc[f"LayerNorm_{2 * i}"] = ln(
            f"encoder.conformer_encoder.norm_layers_1.{i}")
        enc[f"LayerNorm_{2 * i + 1}"] = ln(
            f"encoder.conformer_encoder.norm_layers_2.{i}")
    return {
        "condition_encoder": condition_encoder_to_flax(cond_sd),
        "encoder": enc,
        "projection": _dense_from_conv1x1(model_sd, "encoder.projection"),
        "denoise_fn": svc_diffusion_wrapper_to_flax(
            _sub_state_dict(model_sd, "decoder.denoise_fn."),
            denoiser_layers, t_mlp_layers),
    }


# ---------------------------------------------------------------------------
# SSL content encoders (HuBERT / w2v-bert-2.0 / Whisper encoder)
# ---------------------------------------------------------------------------


def _ln_(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _lin_(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    b = (np.asarray(sd[f"{prefix}.bias"])
         if f"{prefix}.bias" in sd else None)
    return linear_to_dense(np.asarray(sd[f"{prefix}.weight"]), b)


def _materialize_wn_dim_last(sd: Mapping[str, np.ndarray], prefix: str):
    """Effective (weight, bias) of a torch conv weight-normed with dim=2
    (HF pos-conv embedding): w = g * v / ||v||_{dims 0,1}. Handles both the
    legacy ``weight_g/weight_v`` and new ``parametrizations.weight.original0/1``
    key layouts."""
    b = np.asarray(sd[f"{prefix}.bias"]) if f"{prefix}.bias" in sd else None
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = np.asarray(sd[f"{prefix}.parametrizations.weight.original0"],
                       np.float64)
        v = np.asarray(sd[f"{prefix}.parametrizations.weight.original1"],
                       np.float64)
    elif f"{prefix}.weight_g" in sd:
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float64)
        v = np.asarray(sd[f"{prefix}.weight_v"], np.float64)
    else:
        return np.asarray(sd[f"{prefix}.weight"]), b
    nv = np.sqrt(np.sum(v**2, axis=(0, 1), keepdims=True))
    return (g * v / np.maximum(nv, 1e-12)).astype(np.float32), b


def hf_hubert_to_flax(sd: Mapping[str, np.ndarray], *, num_layers: int,
                      num_feat_layers: int = 7,
                      feat_extract_norm: str = "group") -> dict:
    """HF `HubertModel` state dict → `models.ssl_encoders.HubertEncoder`
    params (also fits ContentVec / MERT checkpoints exported to the HF
    Hubert/Wav2Vec2 key layout)."""
    fe: dict = {}
    for i in range(num_feat_layers):
        p = f"feature_extractor.conv_layers.{i}"
        b = (np.asarray(sd[f"{p}.conv.bias"])
             if f"{p}.conv.bias" in sd else None)
        fe[f"conv_{i}"] = conv1d_to_flax(np.asarray(sd[f"{p}.conv.weight"]), b)
        if feat_extract_norm == "group" and i == 0:
            fe["group_norm_scale"] = np.asarray(sd[f"{p}.layer_norm.weight"])
            fe["group_norm_bias"] = np.asarray(sd[f"{p}.layer_norm.bias"])
        elif feat_extract_norm == "layer":
            fe[f"layer_norm_{i}"] = _ln_(sd, f"{p}.layer_norm")
    w, b = _materialize_wn_dim_last(sd, "encoder.pos_conv_embed.conv")
    out = {
        "feature_encoder": fe,
        "fp_layer_norm": _ln_(sd, "feature_projection.layer_norm"),
        "fp_projection": _lin_(sd, "feature_projection.projection"),
        "pos_conv_embed": {"conv": conv1d_to_flax(w, b)},
        "layer_norm": _ln_(sd, "encoder.layer_norm"),
    }
    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        out[f"layers_{i}"] = {
            "attention": {
                "q_proj": _lin_(sd, f"{p}.attention.q_proj"),
                "k_proj": _lin_(sd, f"{p}.attention.k_proj"),
                "v_proj": _lin_(sd, f"{p}.attention.v_proj"),
                "out_proj": _lin_(sd, f"{p}.attention.out_proj"),
            },
            "layer_norm": _ln_(sd, f"{p}.layer_norm"),
            "intermediate_dense": _lin_(sd, f"{p}.feed_forward.intermediate_dense"),
            "output_dense": _lin_(sd, f"{p}.feed_forward.output_dense"),
            "final_layer_norm": _ln_(sd, f"{p}.final_layer_norm"),
        }
    return out


def hf_wavlm_sv_to_flax(sd: Mapping[str, np.ndarray], *, num_layers: int,
                        num_feat_layers: int = 7,
                        feat_extract_norm: str = "group",
                        num_tdnn: int = 5) -> dict:
    """HF `WavLMForXVector` state dict → `WavLMForSpeakerVerification`
    params (microsoft/wavlm-base-(plus-)sv layout: encoder keys under
    ``wavlm.``, x-vector head at top level)."""
    w = _sub_state_dict(sd, "wavlm.")
    fe: dict = {}
    for i in range(num_feat_layers):
        p = f"feature_extractor.conv_layers.{i}"
        b = (np.asarray(w[f"{p}.conv.bias"])
             if f"{p}.conv.bias" in w else None)
        fe[f"conv_{i}"] = conv1d_to_flax(np.asarray(w[f"{p}.conv.weight"]), b)
        if feat_extract_norm == "group" and i == 0:
            fe["group_norm_scale"] = np.asarray(w[f"{p}.layer_norm.weight"])
            fe["group_norm_bias"] = np.asarray(w[f"{p}.layer_norm.bias"])
        elif feat_extract_norm == "layer":
            fe[f"layer_norm_{i}"] = _ln_(w, f"{p}.layer_norm")
    pw, pb = _materialize_wn_dim_last(w, "encoder.pos_conv_embed.conv")
    enc: dict = {
        "feature_encoder": fe,
        "fp_layer_norm": _ln_(w, "feature_projection.layer_norm"),
        "fp_projection": _lin_(w, "feature_projection.projection"),
        "pos_conv_embed": {"conv": conv1d_to_flax(pw, pb)},
        "layer_norm": _ln_(w, "encoder.layer_norm"),
    }
    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        attn = {
            "q_proj": _lin_(w, f"{p}.attention.q_proj"),
            "k_proj": _lin_(w, f"{p}.attention.k_proj"),
            "v_proj": _lin_(w, f"{p}.attention.v_proj"),
            "out_proj": _lin_(w, f"{p}.attention.out_proj"),
            "gru_rel_pos_linear": _lin_(
                w, f"{p}.attention.gru_rel_pos_linear"),
            "gru_rel_pos_const": np.asarray(
                w[f"{p}.attention.gru_rel_pos_const"]),
        }
        if i == 0:
            attn["rel_attn_embed"] = np.asarray(
                w[f"{p}.attention.rel_attn_embed.weight"])
        enc[f"layers_{i}"] = {
            "attention": attn,
            "layer_norm": _ln_(w, f"{p}.layer_norm"),
            "intermediate_dense": _lin_(
                w, f"{p}.feed_forward.intermediate_dense"),
            "output_dense": _lin_(w, f"{p}.feed_forward.output_dense"),
            "final_layer_norm": _ln_(w, f"{p}.final_layer_norm"),
        }
    out: dict = {"wavlm": enc, "projector": _lin_(sd, "projector"),
                 "feature_extractor": _lin_(sd, "feature_extractor")}
    if "layer_weights" in sd:
        out["layer_weights"] = np.asarray(sd["layer_weights"])
    for i in range(num_tdnn):
        # HF stores the TDNN conv as a Linear over (in*k) flattened taps
        # (modeling_wavlm.py:1525,1541): weight (out, in*k) viewed as
        # (out, k, in) → flax Conv kernel (k, in, out)
        kw = np.asarray(sd[f"tdnn.{i}.kernel.weight"])
        out_dim = kw.shape[0]
        prev = (np.asarray(sd[f"tdnn.{i - 1}.kernel.weight"]).shape[0]
                if i > 0 else np.asarray(sd["projector.weight"]).shape[0])
        k = kw.shape[1] // prev
        kernel = kw.reshape(out_dim, k, prev).transpose(1, 2, 0)
        out[f"tdnn_{i}"] = {"kernel": kernel,
                            "bias": np.asarray(sd[f"tdnn.{i}.kernel.bias"])}
    return out


def hf_w2v_bert_to_flax(sd: Mapping[str, np.ndarray], *,
                        num_layers: int) -> dict:
    """HF `Wav2Vec2BertModel` (position_embeddings_type="relative_key",
    the w2v-bert-2.0 layout) → `models.ssl_encoders.W2VBertEncoder` params."""
    out = {
        "fp_layer_norm": _ln_(sd, "feature_projection.layer_norm"),
        "fp_projection": _lin_(sd, "feature_projection.projection"),
    }
    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        pw1 = np.asarray(sd[f"{p}.conv_module.pointwise_conv1.weight"])[:, :, 0]
        pw2 = np.asarray(sd[f"{p}.conv_module.pointwise_conv2.weight"])[:, :, 0]
        out[f"layers_{i}"] = {
            "ffn1_layer_norm": _ln_(sd, f"{p}.ffn1_layer_norm"),
            "ffn1_intermediate": _lin_(sd, f"{p}.ffn1.intermediate_dense"),
            "ffn1_output": _lin_(sd, f"{p}.ffn1.output_dense"),
            "self_attn_layer_norm": _ln_(sd, f"{p}.self_attn_layer_norm"),
            "self_attn": {
                "linear_q": _lin_(sd, f"{p}.self_attn.linear_q"),
                "linear_k": _lin_(sd, f"{p}.self_attn.linear_k"),
                "linear_v": _lin_(sd, f"{p}.self_attn.linear_v"),
                "linear_out": _lin_(sd, f"{p}.self_attn.linear_out"),
                "distance_embedding": embedding_to_flax(
                    np.asarray(sd[f"{p}.self_attn.distance_embedding.weight"])),
            },
            "conv_module": {
                "layer_norm": _ln_(sd, f"{p}.conv_module.layer_norm"),
                "pointwise_conv1": linear_to_dense(pw1),
                "depthwise_conv": conv1d_to_flax(
                    np.asarray(sd[f"{p}.conv_module.depthwise_conv.weight"])),
                "depthwise_layer_norm": _ln_(
                    sd, f"{p}.conv_module.depthwise_layer_norm"),
                "pointwise_conv2": linear_to_dense(pw2),
            },
            "ffn2_layer_norm": _ln_(sd, f"{p}.ffn2_layer_norm"),
            "ffn2_intermediate": _lin_(sd, f"{p}.ffn2.intermediate_dense"),
            "ffn2_output": _lin_(sd, f"{p}.ffn2.output_dense"),
            "final_layer_norm": _ln_(sd, f"{p}.final_layer_norm"),
        }
    return out


def hf_whisper_encoder_to_flax(sd: Mapping[str, np.ndarray], *,
                               num_layers: int,
                               prefix: str = "encoder.") -> dict:
    """HF `WhisperModel` state dict (or a bare `WhisperEncoder` one with
    prefix="") → `models.ssl_encoders.WhisperEncoder` params."""
    g = lambda name: f"{prefix}{name}"
    out = {
        "conv1": conv1d_to_flax(np.asarray(sd[g("conv1.weight")]),
                                np.asarray(sd[g("conv1.bias")])),
        "conv2": conv1d_to_flax(np.asarray(sd[g("conv2.weight")]),
                                np.asarray(sd[g("conv2.bias")])),
        "embed_positions": np.asarray(sd[g("embed_positions.weight")]),
        "layer_norm": _ln_(sd, g("layer_norm")),
    }
    for i in range(num_layers):
        p = g(f"layers.{i}")
        out[f"layers_{i}_self_attn"] = {
            "q_proj": _lin_(sd, f"{p}.self_attn.q_proj"),
            "k_proj": _lin_(sd, f"{p}.self_attn.k_proj"),
            "v_proj": _lin_(sd, f"{p}.self_attn.v_proj"),
            "out_proj": _lin_(sd, f"{p}.self_attn.out_proj"),
        }
        out[f"layers_{i}_self_attn_layer_norm"] = _ln_(
            sd, f"{p}.self_attn_layer_norm")
        out[f"layers_{i}_fc1"] = _lin_(sd, f"{p}.fc1")
        out[f"layers_{i}_fc2"] = _lin_(sd, f"{p}.fc2")
        out[f"layers_{i}_final_layer_norm"] = _ln_(sd, f"{p}.final_layer_norm")
    return out


def hf_whisper_decoder_to_flax(sd: Mapping[str, np.ndarray], *,
                               num_layers: int,
                               prefix: str = "decoder.") -> dict:
    """HF `WhisperDecoder` state dict → `models.whisper_asr.WhisperDecoder`
    params (logits are tied to embed_tokens, as in HF)."""
    g = lambda name: f"{prefix}{name}"
    out = {
        "embed_tokens": embedding_to_flax(
            np.asarray(sd[g("embed_tokens.weight")])),
        "embed_positions": np.asarray(sd[g("embed_positions.weight")]),
        "layer_norm": _ln_(sd, g("layer_norm")),
    }
    for i in range(num_layers):
        p = g(f"layers.{i}")
        for attn in ("self_attn", "encoder_attn"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                out[f"layers_{i}_{attn}_{proj}"] = _lin_(
                    sd, f"{p}.{attn}.{proj}")
            out[f"layers_{i}_{attn}_layer_norm"] = _ln_(
                sd, f"{p}.{attn}_layer_norm")
        out[f"layers_{i}_final_layer_norm"] = _ln_(sd, f"{p}.final_layer_norm")
        out[f"layers_{i}_fc1"] = _lin_(sd, f"{p}.fc1")
        out[f"layers_{i}_fc2"] = _lin_(sd, f"{p}.fc2")
    return out


def fairseq_hubert_to_flax(sd: Mapping[str, np.ndarray], *, num_layers: int,
                           num_feat_layers: int = 7,
                           feat_extract_norm: str = "group") -> dict:
    """fairseq HubertModel/Wav2Vec2Model state dict (the layout of the
    ContentVec `checkpoint_best_legacy_500.pt` the reference's SVC
    extractors load, `processors/content_extractor.py:317`) →
    `models.ssl_encoders.HubertEncoder` params.

    fairseq key layout: `feature_extractor.conv_layers.{i}.0` (conv),
    `.2` / `.2.1` (group/layer norm), top-level `layer_norm` (pre-proj
    feature LN), `post_extract_proj`, `encoder.pos_conv.0` (weight-norm
    dim=2), `encoder.layers.{i}.{self_attn.*, self_attn_layer_norm,
    fc1, fc2, final_layer_norm}`, `encoder.layer_norm`."""
    fe: dict = {}
    for i in range(num_feat_layers):
        p = f"feature_extractor.conv_layers.{i}"
        b = (np.asarray(sd[f"{p}.0.bias"]) if f"{p}.0.bias" in sd else None)
        fe[f"conv_{i}"] = conv1d_to_flax(np.asarray(sd[f"{p}.0.weight"]), b)
        if feat_extract_norm == "group" and i == 0:
            fe["group_norm_scale"] = np.asarray(sd[f"{p}.2.weight"])
            fe["group_norm_bias"] = np.asarray(sd[f"{p}.2.bias"])
        elif feat_extract_norm == "layer":
            fe[f"layer_norm_{i}"] = {
                "scale": np.asarray(sd[f"{p}.2.1.weight"]),
                "bias": np.asarray(sd[f"{p}.2.1.bias"]),
            }
    w, b = _materialize_wn_dim_last(sd, "encoder.pos_conv.0")
    out = {
        "feature_encoder": fe,
        "fp_layer_norm": _ln_(sd, "layer_norm"),
        "fp_projection": _lin_(sd, "post_extract_proj"),
        "pos_conv_embed": {"conv": conv1d_to_flax(w, b)},
        "layer_norm": _ln_(sd, "encoder.layer_norm"),
    }
    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        out[f"layers_{i}"] = {
            "attention": {
                "q_proj": _lin_(sd, f"{p}.self_attn.q_proj"),
                "k_proj": _lin_(sd, f"{p}.self_attn.k_proj"),
                "v_proj": _lin_(sd, f"{p}.self_attn.v_proj"),
                "out_proj": _lin_(sd, f"{p}.self_attn.out_proj"),
            },
            "layer_norm": _ln_(sd, f"{p}.self_attn_layer_norm"),
            "intermediate_dense": _lin_(sd, f"{p}.fc1"),
            "output_dense": _lin_(sd, f"{p}.fc2"),
            "final_layer_norm": _ln_(sd, f"{p}.final_layer_norm"),
        }
    return out


def dualcodec_valle_nar_to_flax(sd: Mapping[str, np.ndarray], *,
                                num_layers: int,
                                num_quantizers: int = 8) -> dict:
    """Reference DualCodec ValleNAR state dict
    (`dualcodec/model_tts/valle_nar/valle_nar_model.py`) →
    `models.tts.dualcodec_tts.DualCodecValleNAR` params. The 7 residual
    embeddings gain one extra zero row (the token-dropout mask slot) and
    the 7 per-layer LM heads are stacked into one (7, H, V) param."""
    g = lambda name: np.asarray(sd[name])

    def ada(prefix: str) -> dict:
        return {"to_weight": linear_to_dense(g(f"{prefix}.to_weight.weight"),
                                             g(f"{prefix}.to_weight.bias"))}

    backbone: dict = {}
    for i in range(num_layers):
        p = f"model.model.layers.{i}"
        backbone[f"layer_{i}"] = {
            "input_norm": ada(f"{p}.input_layernorm"),
            "post_norm": ada(f"{p}.post_attention_layernorm"),
            "attn": {
                "q_proj": linear_to_dense(g(f"{p}.self_attn.q_proj.weight")),
                "k_proj": linear_to_dense(g(f"{p}.self_attn.k_proj.weight")),
                "v_proj": linear_to_dense(g(f"{p}.self_attn.v_proj.weight")),
                "o_proj": linear_to_dense(g(f"{p}.self_attn.o_proj.weight")),
            },
            "mlp": {
                "gate_proj": linear_to_dense(g(f"{p}.mlp.gate_proj.weight")),
                "up_proj": linear_to_dense(g(f"{p}.mlp.up_proj.weight")),
                "down_proj": linear_to_dense(g(f"{p}.mlp.down_proj.weight")),
            },
        }
    backbone["final_norm"] = ada("model.model.norm")
    rest = []
    for i in range(1, num_quantizers):
        w = g(f"prompt_embedder.embeddings.{i}.weight")
        rest.append(np.concatenate([w, np.zeros((1, w.shape[1]), w.dtype)]))
    heads = [np.ascontiguousarray(g(f"model.lm_head.{j}.weight").T)
             for j in range(num_quantizers - 1)]
    return {
        "phone_embedder": embedding_to_flax(g("phone_embedder.weight")),
        "embed_first": embedding_to_flax(
            g("prompt_embedder.embeddings.0.weight")),
        "embed_rest": np.stack(rest),
        "embed_cond": embedding_to_flax(g("model.model.embed_cond.weight")),
        "backbone": backbone,
        "lm_heads": np.stack(heads),
    }


# ---------------------------------------------------------------------------
# DebaTTS T2S — ref models/tts/debatts/t2s_model.py
# ---------------------------------------------------------------------------


def debatts_t2s_to_flax(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """Reference ``T2SLlama_new`` (`models/tts/debatts/t2s_model.py:26`) →
    our DebaTTST2S. Same torch layout as the Vevo AR wrapper: ``model.`` =
    LlamaForCausalLM (embed/layers/norm under ``model.model.*``, head under
    ``model.lm_head``)."""
    return vevo_ar_to_flax(sd, num_layers)


# ---------------------------------------------------------------------------
# RawNet3 speaker embedder — ref evaluation/metrics/similarity/models/
# ---------------------------------------------------------------------------


def _bn_(sd: Mapping[str, np.ndarray], prefix: str) -> tuple[dict, dict]:
    g = lambda n: np.asarray(sd[n])
    return ({"scale": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias")},
            {"mean": g(f"{prefix}.running_mean"),
             "var": g(f"{prefix}.running_var")})


def _rawnet_block_to_flax(sd: Mapping[str, np.ndarray], prefix: str,
                          scale: int) -> tuple[dict, dict]:
    """One reference Bottle2neck (`RawNetBasicBlock.py:58`) →
    (params, batch_stats) for our `models/rawnet3.Bottle2neck`."""
    g = lambda n: np.asarray(sd[n])
    p: dict = {"conv1": conv1d_to_flax(g(f"{prefix}.conv1.weight"),
                                       g(f"{prefix}.conv1.bias")),
               "conv3": conv1d_to_flax(g(f"{prefix}.conv3.weight"),
                                       g(f"{prefix}.conv3.bias"))}
    s: dict = {}
    p["bn1"], s["bn1"] = _bn_(sd, f"{prefix}.bn1")
    p["bn3"], s["bn3"] = _bn_(sd, f"{prefix}.bn3")
    for i in range(scale - 1):
        p[f"conv_{i}"] = conv1d_to_flax(g(f"{prefix}.convs.{i}.weight"),
                                        g(f"{prefix}.convs.{i}.bias"))
        p[f"bn_{i}"], s[f"bn_{i}"] = _bn_(sd, f"{prefix}.bns.{i}")
    if f"{prefix}.residual.0.weight" in sd:
        p["residual"] = conv1d_to_flax(g(f"{prefix}.residual.0.weight"))
    p["afms"] = {"alpha": g(f"{prefix}.afms.alpha")[:, 0],
                 "fc": linear_to_dense(g(f"{prefix}.afms.fc.weight"),
                                       g(f"{prefix}.afms.fc.bias"))}
    return p, s


def torch_rawnet3_to_flax(sd: Mapping[str, np.ndarray], *,
                          model_scale: int = 8,
                          out_bn: bool = False) -> tuple[dict, dict]:
    """Reference RawNet3 (`RawNetModel.py:15`, ckpt
    `pretrained/rawnet3/model.pt["model"]`) → (params, batch_stats) for
    `models/rawnet3.RawNet3`. The reference's top-level `bn1` is dead
    (never called in forward) and is skipped."""
    g = lambda n: np.asarray(sd[n])
    params: dict = {
        "in_scale": g("preprocess.1.weight"),
        "in_bias": g("preprocess.1.bias"),
        "sinc": {"low_hz_": g("conv1.filterbank.low_hz_"),
                 "band_hz_": g("conv1.filterbank.band_hz_")},
        "layer4": conv1d_to_flax(g("layer4.weight"), g("layer4.bias")),
        "att_conv1": conv1d_to_flax(g("attention.0.weight"),
                                    g("attention.0.bias")),
        "att_conv2": conv1d_to_flax(g("attention.3.weight"),
                                    g("attention.3.bias")),
        "fc6": linear_to_dense(g("fc6.weight"), g("fc6.bias")),
    }
    stats: dict = {}
    for name in ("layer1", "layer2", "layer3"):
        params[name], stats[name] = _rawnet_block_to_flax(
            sd, name, model_scale)
    params["att_bn"], stats["att_bn"] = _bn_(sd, "attention.2")
    params["bn5"], stats["bn5"] = _bn_(sd, "bn5")
    if out_bn:
        params["bn6"], stats["bn6"] = _bn_(sd, "bn6")
    return params, stats


# ---------------------------------------------------------------------------
# GE2E / Resemblyzer voice encoder
# ---------------------------------------------------------------------------


def torch_ge2e_to_flax(sd: Mapping[str, np.ndarray],
                       num_layers: int = 3) -> dict:
    """resemblyzer VoiceEncoder (`nn.LSTM(40, 256, 3)` + `linear`) → our
    `models/ge2e.GE2EEncoder` params."""
    params: dict = {f"lstm_{i}": _torch_lstm_layer_to_flax(sd, "lstm", i)
                    for i in range(num_layers)}
    params["linear"] = linear_to_dense(np.asarray(sd["linear.weight"]),
                                       np.asarray(sd["linear.bias"]))
    return params


# ---------------------------------------------------------------------------
# VGGish (FAD embedder)
# ---------------------------------------------------------------------------


def torch_vggish_to_flax(sd: Mapping[str, np.ndarray]) -> dict:
    """torchvggish (harritaylor/torchvggish `pytorch_vggish.pth` /
    `vggish-10086976.pth`) state dict → our `models/vggish.VGGish` params.

    torch layout: `features.{0,3,6,8,11,13}` convs,
    `embeddings.{0,2,4}` linears. The fc ordering matches ours without
    index remapping because torchvggish transposes NCHW→NHWC before
    flattening (VGG.forward) and our layout is NHWC natively."""
    g = lambda n: np.asarray(sd[n])
    conv_idx = [0, 3, 6, 8, 11, 13]
    params: dict = {}
    for ci, ti in enumerate(conv_idx):
        params[f"conv_{ci}"] = conv2d_to_flax(
            g(f"features.{ti}.weight"), g(f"features.{ti}.bias"))
    for fi, ti in enumerate([0, 2]):
        params[f"fc_{fi}"] = linear_to_dense(
            g(f"embeddings.{ti}.weight"), g(f"embeddings.{ti}.bias"))
    params["embedding"] = linear_to_dense(
        g("embeddings.4.weight"), g("embeddings.4.bias"))
    return params


def hf_t5_encoder_to_flax(sd: Mapping[str, np.ndarray],
                          num_layers: int = 12,
                          gated: bool = False) -> dict:
    """HF `T5EncoderModel` state dict (t5-base / t5-v1.1 naming) → our
    `modules/t5.T5Encoder` params. The reference loads this frozen on the
    host (`models/tta/ldm/audioldm_trainer.py:42`); we run it on-device."""
    g = lambda n: np.asarray(sd[n])
    params: dict = {
        "embed_tokens": embedding_to_flax(g("shared.weight")
                                          if "shared.weight" in sd
                                          else g("encoder.embed_tokens.weight")),
        "relative_attention_bias": g(
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"),
        "final_layer_norm": {"weight": g("encoder.final_layer_norm.weight")},
    }
    for i in range(num_layers):
        p = f"encoder.block.{i}"
        blk: dict = {
            "ln_attn": {"weight": g(f"{p}.layer.0.layer_norm.weight")},
            "attn": {
                n: linear_to_dense(g(f"{p}.layer.0.SelfAttention.{n}.weight"))
                for n in ("q", "k", "v", "o")
            },
            "ln_ffn": {"weight": g(f"{p}.layer.1.layer_norm.weight")},
        }
        if gated:
            blk["ffn"] = {
                "wi_0": linear_to_dense(
                    g(f"{p}.layer.1.DenseReluDense.wi_0.weight")),
                "wi_1": linear_to_dense(
                    g(f"{p}.layer.1.DenseReluDense.wi_1.weight")),
                "wo": linear_to_dense(
                    g(f"{p}.layer.1.DenseReluDense.wo.weight")),
            }
        else:
            blk["ffn"] = {
                "wi": linear_to_dense(
                    g(f"{p}.layer.1.DenseReluDense.wi.weight")),
                "wo": linear_to_dense(
                    g(f"{p}.layer.1.DenseReluDense.wo.weight")),
            }
        params[f"block_{i}"] = blk
    return params


def clap_text_to_flax(sd: Mapping[str, np.ndarray],
                      num_layers: int = 12) -> dict:
    """Vendored open_clip CLAP text tower (reference
    `models/tta/picoaudio/picoaudio/audioldm/clap/open_clip/model.py:
    476-497` — token/positional embeddings, `text_branch.resblocks.*`
    packed-QKV attention blocks, `ln_final`, the 2-layer
    `text_projection`) → `modules/clap_text.ClapTextEncoder` params.
    Keys may carry a `module.` DDP prefix (the published checkpoints
    do)."""
    def g(n):
        if n not in sd and f"module.{n}" in sd:
            n = f"module.{n}"
        return np.asarray(sd[n])

    def ln(n):
        return {"scale": g(f"{n}.weight"), "bias": g(f"{n}.bias")}

    params: dict = {
        "token_embedding": embedding_to_flax(g("token_embedding.weight")),
        "positional_embedding": g("positional_embedding"),
        "ln_final": ln("ln_final"),
        "proj_fc1": linear_to_dense(g("text_projection.0.weight"),
                                    g("text_projection.0.bias")),
        "proj_fc2": linear_to_dense(g("text_projection.2.weight"),
                                    g("text_projection.2.bias")),
    }
    for i in range(num_layers):
        p = f"text_branch.resblocks.{i}"
        params[f"block_{i}"] = {
            "ln_1": ln(f"{p}.ln_1"),
            "in_proj": linear_to_dense(g(f"{p}.attn.in_proj_weight"),
                                       g(f"{p}.attn.in_proj_bias")),
            "out_proj": linear_to_dense(g(f"{p}.attn.out_proj.weight"),
                                        g(f"{p}.attn.out_proj.bias")),
            "ln_2": ln(f"{p}.ln_2"),
            "c_fc": linear_to_dense(g(f"{p}.mlp.c_fc.weight"),
                                    g(f"{p}.mlp.c_fc.bias")),
            "c_proj": linear_to_dense(g(f"{p}.mlp.c_proj.weight"),
                                      g(f"{p}.mlp.c_proj.bias")),
        }
    return params
