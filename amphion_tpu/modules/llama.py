"""Llama-style transformer backbone: AR (KV-cache decode) and NAR (adaptive
RMSNorm) variants.

This is the workhorse behind the flagship models, covering the reference's
uses of Llama architectures (reference: `models/tts/maskgct/llama_nar.py:202`
`DiffLlama` / `:427` `DiffLlamaPrefix` — adaptive-RMSNorm NAR backbones for
MaskGCT T2S/S2A; `models/vc/autoregressive_transformer/ar_model.py:79` —
`LlamaForCausalLM` for Vevo's AR transformer; VALL-E's AR/NAR decoders).

TPU design notes:
- rotary embeddings precomputed as compile-time constants;
- decode uses a fixed-size KV cache updated with `dynamic_update_slice`
  inside `lax.scan` — static shapes, no recompilation per token;
- the adaptive (timestep-conditioned) RMSNorm modulation is a single fused
  (scale, shift, gate) projection per block, as in DiT/adaLN.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LlamaConfig:
    hidden_size: int = 1024
    num_layers: int = 16
    num_heads: int = 16
    num_kv_heads: int | None = None  # GQA; None = MHA
    intermediate_size: int | None = None  # None = 4 * hidden (SwiGLU 8/3 applied)
    rope_theta: float = 1e4
    max_position: int = 4096
    adaptive: bool = False  # adaLN conditioning (NAR diffusion backbones)
    # "none" | "int8": decode-time weight-only quantization — projection
    # kernels are stored int8 + per-channel scale and consumed by the
    # Pallas int8 matmul (ops/pallas_kernels.int8_matmul_pallas), so the
    # HBM-bound decode loop reads int8 bytes per step. Use
    # `quantize_llama_params` to transform a trained f32 tree.
    decode_quant: str = "none"
    # fuse q/k/v into ONE quantized matmul and gate/up into another when
    # decode_quant is active (4 Pallas dispatches per layer instead of 7):
    # the decode scan runs ~140 tiny kernels per token otherwise, and the
    # per-kernel pipeline setup is a real fraction of the weight-stream
    # floor at B=1. quantize_llama_params(..., fuse=True) produces the
    # matching fused param tree (concat along N — per-column scales make
    # the fusion exact).
    fused_quant_proj: bool = True
    # int8 KV cache (per-position-per-head symmetric scales): at decode
    # the cache re-read per token rivals the quantized weight stream
    # (e.g. 0.28 GB/token bf16 vs 0.39 GB int4 weights on the Vevo AR at
    # L~1150) — int8 halves it. Enabled by _quantize_for_decode alongside
    # weight quantization; exact-shape opt-in (init_cache changes).
    kv_quant: bool = False
    dtype: str = "float32"
    remat: bool = False  # rematerialize blocks (trade FLOPs for memory)
    # fused flash attention (ops/pallas_kernels.flash_attention_pallas) for
    # the full-sequence (no-KV-cache) path: O(L) memory, logits never hit
    # HBM; decode/prefill keep the dense path (tiny T, cache-offset math).
    # "auto" (default) = on for single-chip TPU runs when the shape is big
    # enough to fill the kernel grid (see `flash_for`), off on CPU
    # (interpreted Pallas) and under multi-device GSPMD (pallas_call has no
    # partitioning rule — the dense path shards cleanly)
    use_flash: bool | str = "auto"
    # minimum batch·seqlen for "auto" flash: the kernel's grid is
    # (B·H, L/256) programs, and at small grids the MXU sits idle between
    # programs while XLA's dense attention pipelines fine. Measured v5e
    # crossover data (`bench.py --only flash`, _ab_fm.py A/B):
    # B=8/L=2048 (16384 tok) flash 1.54x FASTER; B=1/L=1219 (1219 tok)
    # flash 1.47x SLOWER (0.503 s vs 0.343 s on the Vevo FM 32-step stage).
    flash_min_tokens: int = 4096

    @property
    def flash_enabled(self) -> bool:
        """Platform-level eligibility (shape-blind; see `flash_for`)."""
        env = os.environ.get("AMPHION_FLASH")
        if env is not None:  # global override for A/B runs
            return env != "0"
        if self.use_flash == "auto":
            return (jax.default_backend() in ("tpu", "axon")
                    and jax.device_count() == 1)
        return bool(self.use_flash)

    def flash_for(self, batch: int, seqlen: int) -> bool:
        """Shape-aware gate used at trace time: under "auto", flash must
        also clear `flash_min_tokens` (small grids lose to dense — see the
        field comment). Explicit True/False and the AMPHION_FLASH env
        override bypass the shape check."""
        if not self.flash_enabled:
            return False
        if os.environ.get("AMPHION_FLASH") is not None:
            return True
        if self.use_flash == "auto":
            return batch * seqlen >= self.flash_min_tokens
        return True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    @property
    def ffn_dim(self) -> int:
        if self.intermediate_size is not None:
            return self.intermediate_size
        # Llama convention: 2/3 * 4h rounded to multiple of 256
        d = int(2 * 4 * self.hidden_size / 3)
        return (d + 255) // 256 * 256


class RMSNorm(nn.Module):
    eps: float = 1e-6
    # passthrough: return (x, scale) UNNORMALIZED — lets a fused Pallas
    # matmul apply the norm as an in-kernel prologue (param path is
    # unchanged, so checkpoints are oblivious)
    passthrough: bool = False

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        if self.passthrough:
            return x, scale
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps) * scale).astype(x.dtype)


class AdaptiveRMSNorm(nn.Module):
    """RMSNorm with conditioning-dependent scale (MaskGCT adaLN).

    Matches the reference parameterization exactly (ref
    `llama_nar.py:35-53` LlamaAdaptiveRMSNorm): scale = Linear(cond) with
    zero kernel / ones bias init (identity at init), no shift, no
    nonlinearity on cond — so converted MaskGCT checkpoints load 1:1."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, cond):
        # cond: (B, D) or (B, T, D)
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        normed = (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        weight = nn.Dense(
            x.shape[-1], kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones, name="to_weight",
        )(cond)
        if weight.ndim == 2:
            weight = weight[:, None, :]
        return normed * weight


def rotary_tables(max_pos: int, head_dim: int, theta: float = 1e4):
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    t = np.arange(max_pos, dtype=np.float64)
    freqs = np.outer(t, inv)
    return np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, T, H, D); cos/sin: (T, D/2)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


class QDense(nn.Module):
    """Weight-only-int8 Dense (no bias) — single-device decode paths only
    (pallas_call has no GSPMD partitioning rule; multi-device TP decode
    stays on the bf16 dense path, as in __graft_entry__). Params:
    kernel_q (K, N) int8 +
    scale (N,) f32, applied via the Pallas streaming matmul."""

    features: int

    @nn.compact
    def __call__(self, x):
        from amphion_tpu.ops.pallas_kernels import int8_matmul_pallas

        k_in = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", nn.initializers.zeros, (k_in, self.features),
            jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        x2 = x.reshape(-1, k_in)
        out = int8_matmul_pallas(x2.astype(jnp.float32), kernel_q, scale)
        return out.reshape(*x.shape[:-1], self.features).astype(x.dtype)


def int4_group(k_in: int) -> int:
    """Largest group size ≤128 dividing K (sub-channel int4 scales);
    shared by QDense4 and quantize_llama_params so shapes agree."""
    for g in (128, 64, 32, 16, 8, 4, 2):
        if k_in % g == 0:
            return g
    raise ValueError(f"int4 decode needs even K, got {k_in}")


class QDense4(nn.Module):
    """Weight-only-int4 Dense (no bias): params kernel_q (K, N) **native
    jnp.int4** + scale (K/group, N) f32, applied via the Pallas streaming
    int4 matmul — half the decode HBM traffic of int8, hardware unpack."""

    features: int

    @nn.compact
    def __call__(self, x, rms_scale=None):
        from amphion_tpu.ops.pallas_kernels import int4_matmul_pallas

        k_in = x.shape[-1]
        g = int4_group(k_in)
        kernel_q = self.param(
            "kernel_q", nn.initializers.zeros, (k_in, self.features),
            jnp.int4)
        scale = self.param(
            "scale", nn.initializers.ones, (k_in // g, self.features))
        x2 = x.reshape(-1, k_in)
        out = int4_matmul_pallas(x2.astype(jnp.float32), kernel_q, scale,
                                 group=g, rms_scale=rms_scale,
                                 rms_eps=1e-6)
        return out.reshape(*x.shape[:-1], self.features).astype(x.dtype)


def _proj(cfg: LlamaConfig, features: int, name: str):
    if cfg.decode_quant == "int8":
        return QDense(features, name=name)
    if cfg.decode_quant == "int4":
        return QDense4(features, name=name)
    return nn.Dense(features, use_bias=False, name=name)


def validate_quantized_tree(params, cfg) -> None:
    """Raise a clear error when a quantized param tree's fused/unfused
    layout disagrees with ``cfg.fused_quant_proj`` (the mismatch otherwise
    surfaces as an opaque flax missing-param 'qkv_proj' at apply time).
    No-op for unquantized configs/trees."""
    if cfg.decode_quant == "none":
        return
    found_fused = found_unfused = False

    def walk(tree):
        nonlocal found_fused, found_unfused
        if not isinstance(tree, dict):
            return
        if "qkv_proj" in tree or "gateup_proj" in tree:
            found_fused = True
        if "q_proj" in tree and isinstance(tree["q_proj"], dict) \
                and "kernel_q" in tree["q_proj"]:
            found_unfused = True
        for v in tree.values():
            walk(v)

    walk(params)
    if cfg.fused_quant_proj and found_unfused and not found_fused:
        raise ValueError(
            "quantized param tree is UNFUSED (separate q/k/v projections) "
            "but cfg.fused_quant_proj=True expects fused qkv_proj/"
            "gateup_proj — re-quantize with quantize_llama_params(..., "
            "fuse=True) or set LlamaConfig(fused_quant_proj=False)")
    if not cfg.fused_quant_proj and found_fused:
        raise ValueError(
            "quantized param tree is FUSED (qkv_proj/gateup_proj) but "
            "cfg.fused_quant_proj=False expects separate q/k/v — "
            "re-quantize with fuse=False or set fused_quant_proj=True")


def quantize_llama_params(params, quant: str = "int8", fuse: bool = True,
                          cfg=None):
    """f32 decoder param tree → quantized-decode tree: every projection
    kernel (q/k/v/o, gate/up/down) becomes {kernel_q, scale}; other leaves
    pass through. Pair with `LlamaConfig(decode_quant=quant)` —
    ``"int8"`` (per-channel) or ``"int4"`` (group-wise sub-channel).

    ``fuse`` (default, matching `fused_quant_proj`): q/k/v concatenate
    into one ``qkv_proj`` and gate/up into one ``gateup_proj`` along the
    OUTPUT axis before quantization — exact (scales are per output
    column / per column-group), and the decode scan runs 4 streaming
    kernels per layer instead of 7.

    Pass ``cfg`` (a LlamaConfig) to derive ``fuse`` from
    ``cfg.fused_quant_proj`` — guarantees the tree layout matches the
    config that will apply it (see ``validate_quantized_tree``)."""
    if cfg is not None:
        fuse = cfg.fused_quant_proj
    from amphion_tpu.ops.pallas_kernels import (
        quantize_weight_int4,
        quantize_weight_int8,
    )

    proj_names = {"q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj"}

    def quantize(w):
        if quant == "int4":
            return quantize_weight_int4(w, group=int4_group(w.shape[0]))
        return quantize_weight_int8(w)

    def is_proj(v):
        return (isinstance(v, dict) and "kernel" in v
                and getattr(v["kernel"], "ndim", 0) == 2)

    def qdict(w):
        w_q, scale = quantize(jnp.asarray(w))
        return {"kernel_q": w_q, "scale": scale}

    def walk(tree):
        out = {}
        fused_away: set = set()
        if fuse:
            if all(n in tree and is_proj(tree[n])
                   for n in ("q_proj", "k_proj", "v_proj")):
                out["qkv_proj"] = qdict(jnp.concatenate(
                    [jnp.asarray(tree[n]["kernel"])
                     for n in ("q_proj", "k_proj", "v_proj")], axis=1))
                fused_away |= {"q_proj", "k_proj", "v_proj"}
            if all(n in tree and is_proj(tree[n])
                   for n in ("gate_proj", "up_proj")):
                out["gateup_proj"] = qdict(jnp.concatenate(
                    [jnp.asarray(tree[n]["kernel"])
                     for n in ("gate_proj", "up_proj")], axis=1))
                fused_away |= {"gate_proj", "up_proj"}
        for k, v in tree.items():
            if k in fused_away:
                continue
            if k in proj_names and is_proj(v):
                out[k] = qdict(v["kernel"])
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(params)


class LlamaAttention(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, bias=None, positions=None, cache=None,
                 cache_index=None, kv_mask=None, causal=False,
                 rms_scale=None):
        """x: (B, T, D). If ``cache`` is given, T is the new-token count and
        keys/values are appended at ``cache_index``; returns updated cache.
        With ``cfg.use_flash`` (and no cache/bias) the padding mask and
        causality go to the fused kernel as ``kv_mask``/``causal`` instead
        of an additive bias. With ``rms_scale`` (int4 fused path), x is the
        UN-normalized block input and the RMSNorm runs as an in-kernel
        prologue of the qkv matmul."""
        c = self.cfg
        b, t, _ = x.shape
        nq = c.num_heads * c.head_dim
        nkv = c.kv_heads * c.head_dim
        if (rms_scale is not None and c.decode_quant == "int4"
                and c.fused_quant_proj):
            qkv = QDense4(nq + 2 * nkv, name="qkv_proj")(x, rms_scale)
            q, k, v = jnp.split(qkv, [nq, nq + nkv], axis=-1)
        elif c.decode_quant != "none" and c.fused_quant_proj:
            qkv = _proj(c, nq + 2 * nkv, "qkv_proj")(x)
            q, k, v = jnp.split(qkv, [nq, nq + nkv], axis=-1)
        else:
            q = _proj(c, nq, "q_proj")(x)
            k = _proj(c, nkv, "k_proj")(x)
            v = _proj(c, nkv, "v_proj")(x)
        q = q.reshape(b, t, c.num_heads, c.head_dim)
        k = k.reshape(b, t, c.kv_heads, c.head_dim)
        v = v.reshape(b, t, c.kv_heads, c.head_dim)

        cos_t, sin_t = rotary_tables(c.max_position, c.head_dim, c.rope_theta)
        cos_t, sin_t = jnp.asarray(cos_t), jnp.asarray(sin_t)
        if positions is None:
            if cache_index is not None:
                positions = cache_index + jnp.arange(t)
            else:
                positions = jnp.arange(t)
        cos = jnp.take(cos_t, positions, axis=0)
        sin = jnp.take(sin_t, positions, axis=0)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)

        new_cache = None
        if cache is not None and len(cache) == 4:
            # int8 KV cache: quantize the incoming K/V per (pos, head)
            # with a symmetric amax/127 scale, append, and dequantize the
            # WHOLE cache on read (the read is the bandwidth hot path;
            # dequant is elementwise VPU work on streamed data, the same
            # trade the int8 weight matmul makes). Garbage beyond
            # cache_index is masked out of the scores / zero-weighted.
            ck, cv, ks, vs = cache  # head-major: (B, H, S, D) / (B, H, S)
            at = (0, 0, cache_index, 0)

            def q8(x):  # (B, T, H, D) → (B, H, T, D) int8, (B, H, T) scale
                x = jnp.swapaxes(x, 1, 2)
                s = jnp.max(jnp.abs(x), axis=-1) / 127.0
                s = jnp.maximum(s, 1e-8)
                return (jnp.round(x / s[..., None]).astype(jnp.int8),
                        s.astype(jnp.float32))

            kq, ksc = q8(k.astype(jnp.float32))
            vq, vsc = q8(v.astype(jnp.float32))
            ck = jax.lax.dynamic_update_slice(ck, kq, at)
            cv = jax.lax.dynamic_update_slice(cv, vq, at)
            ks = jax.lax.dynamic_update_slice(ks, ksc, at[:3])
            vs = jax.lax.dynamic_update_slice(vs, vsc, at[:3])
            new_cache = (ck, cv, ks, vs)
            import os as _os

            if (c.kv_heads == c.num_heads and bias is None and t == 1
                    and kv_mask is None
                    and _os.environ.get("AMPHION_FUSED_DECODE_ATTN")):
                # fully-fused single-step decode attention: scores,
                # masked softmax and the weighted V-sum in ONE Pallas
                # program per (batch, head), cache stays int8 into VMEM
                # (ops/pallas_kernels.decode_attention_int8).
                # OFF by default: measured SLOWER than the scale-after-dot
                # einsum path on v5e (0.849 vs 0.733 s/500 tok on the Vevo
                # AR — at B=1/H=16 the 16-program grid under-fills the
                # chip and per-program fixed costs beat XLA's fusion).
                from amphion_tpu.ops.pallas_kernels import (
                    decode_attention_int8,
                )

                o = decode_attention_int8(
                    q[:, 0].astype(jnp.float32), ck, cv, ks, vs,
                    valid_len=(cache_index + 1)
                    * jnp.ones((b,), jnp.int32))
                out = o.astype(x.dtype).reshape(b, 1,
                                                c.num_heads * c.head_dim)
                out = _proj(c, c.hidden_size, "o_proj")(out)
                return out, new_cache
            if c.kv_heads == c.num_heads and bias is None:
                # keep the cache int8 all the way to the dots: the
                # per-(position, head) scales factor OUT of the head-dim
                # contraction exactly, so apply them to the scores /
                # probabilities instead of the cache — the int8→bf16
                # convert then sits inside the einsum operand (fusable)
                # rather than materializing a scaled dense copy per step.
                scores = jnp.einsum("bqhd,bhkd->bhqk", q,
                                    ck.astype(x.dtype))
                scores = scores * ks.astype(x.dtype)[:, :, None, :]
                scores = scores / np.sqrt(c.head_dim)
                neg = jnp.finfo(scores.dtype).min
                s_len = ck.shape[2]
                pos_k = jnp.arange(s_len)[None, None, None, :]
                # per-query causal bound: query i (absolute position
                # cache_index+i) may attend keys <= its own position —
                # correct for chunked multi-token decode (t>1), reduces
                # to the old cache_index+t-1 bound at t==1.
                pos_q = (cache_index + jnp.arange(t))[None, None, :, None]
                scores = jnp.where(pos_k <= pos_q, scores, neg)
                if kv_mask is not None:
                    scores = jnp.where(kv_mask[:, None, None, :] > 0,
                                       scores, neg)
                probs = jax.nn.softmax(scores.astype(jnp.float32),
                                       axis=-1).astype(x.dtype)
                probs = probs * vs.astype(x.dtype)[:, :, None, :]
                out = jnp.einsum("bhqk,bhkd->bqhd", probs,
                                 cv.astype(x.dtype))
                out = out.reshape(b, t, c.num_heads * c.head_dim)
                out = _proj(c, c.hidden_size, "o_proj")(out)
                return out, new_cache
            k = jnp.swapaxes(
                ck.astype(x.dtype) * ks[..., None].astype(x.dtype), 1, 2)
            v = jnp.swapaxes(
                cv.astype(x.dtype) * vs[..., None].astype(x.dtype), 1, 2)
        elif cache is not None:
            ck, cv = cache  # (B, S, Hkv, D)
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
            k, v = ck, cv
            new_cache = (ck, cv)

        if c.flash_for(b, t) and cache is None and bias is None:
            from amphion_tpu.ops.pallas_kernels import flash_attention

            out = flash_attention(q, k, v, kv_mask, causal)
            out = out.reshape(b, t, c.num_heads * c.head_dim)
            return _proj(c, c.hidden_size, "o_proj")(out)

        if c.kv_heads != c.num_heads:
            rep = c.num_heads // c.kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(c.head_dim)
        neg = jnp.finfo(scores.dtype).min
        if causal:
            tq, tk = scores.shape[-2], scores.shape[-1]
            scores = jnp.where(
                jnp.tril(jnp.ones((tq, tk), bool))[None, None], scores, neg)
        if kv_mask is not None:
            scores = jnp.where(kv_mask[:, None, None, :] > 0, scores, neg)
        if cache is not None:
            # mask out cache slots beyond cache_index + t
            s = k.shape[1]
            pos_k = jnp.arange(s)[None, None, None, :]
            scores = jnp.where(
                pos_k <= (cache_index + t - 1), scores, jnp.finfo(scores.dtype).min
            )
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(b, t, c.num_heads * c.head_dim)
        out = _proj(c, c.hidden_size, "o_proj")(out)
        return (out, new_cache) if cache is not None else out


class LlamaMLP(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, rms_scale=None):
        c = self.cfg
        if (rms_scale is not None and c.decode_quant == "int4"
                and c.fused_quant_proj):
            gu = QDense4(2 * c.ffn_dim, name="gateup_proj")(x, rms_scale)
            gate, up = jnp.split(gu, 2, axis=-1)
        elif c.decode_quant != "none" and c.fused_quant_proj:
            gu = _proj(c, 2 * c.ffn_dim, "gateup_proj")(x)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = _proj(c, c.ffn_dim, "gate_proj")(x)
            up = _proj(c, c.ffn_dim, "up_proj")(x)
        return _proj(c, c.hidden_size, "down_proj")(nn.silu(gate) * up)


class LlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, cond=None, bias=None, positions=None, cache=None,
                 cache_index=None, kv_mask=None, causal=False):
        c = self.cfg
        # fused-RMSNorm decode (A/B knob): the norm runs as an in-kernel
        # prologue of the int4 qkv/gateup Pallas matmuls — two fewer XLA
        # kernels per layer per step. Exactness test in test_pallas.py.
        fuse_rms = (cache is not None and c.decode_quant == "int4"
                    and c.fused_quant_proj and not c.adaptive
                    and os.environ.get("AMPHION_FUSED_RMS") == "1")
        in_scale = post_scale = None
        if c.adaptive:
            assert cond is not None
            h = AdaptiveRMSNorm(name="input_norm")(x, cond)
        elif fuse_rms:
            h, in_scale = RMSNorm(name="input_norm",
                                  passthrough=True)(x)
        else:
            h = RMSNorm(name="input_norm")(x)
        attn_out = LlamaAttention(c, name="attn")(
            h, bias=bias, positions=positions, cache=cache,
            cache_index=cache_index, kv_mask=kv_mask, causal=causal,
            rms_scale=in_scale
        )
        if cache is not None:
            attn_out, new_cache = attn_out
        else:
            new_cache = None
        x = x + attn_out
        if c.adaptive:
            h = AdaptiveRMSNorm(name="post_norm")(x, cond)
        elif fuse_rms:
            h, post_scale = RMSNorm(name="post_norm",
                                    passthrough=True)(x)
        else:
            h = RMSNorm(name="post_norm")(x)
        x = x + LlamaMLP(c, name="mlp")(h, rms_scale=post_scale)
        return (x, new_cache) if cache is not None else x


class LlamaEncoder(nn.Module):
    """NAR (bidirectional) stack; ``adaptive=True`` gives the MaskGCT-style
    diffusion backbone conditioned on the timestep embedding."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, cond=None, mask=None):
        bias = kv_mask = None
        if self.cfg.flash_for(x.shape[0], x.shape[1]):
            kv_mask = mask  # fused kernel consumes the padding mask directly
        elif mask is not None:
            bias = jnp.where(mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)
        # optional rematerialization: activations are recomputed in the
        # backward pass instead of stored — O(sqrt(L)) memory for long
        # sequences / big batches at ~30% extra FLOPs
        block_cls = (nn.remat(LlamaBlock, static_argnums=())
                     if self.cfg.remat else LlamaBlock)
        for i in range(self.cfg.num_layers):
            x = block_cls(self.cfg, name=f"layer_{i}")(x, cond=cond, bias=bias,
                                                       kv_mask=kv_mask)
        if self.cfg.adaptive:
            return AdaptiveRMSNorm(name="final_norm")(x, cond)
        return RMSNorm(name="final_norm")(x)


class LlamaDecoder(nn.Module):
    """AR (causal) stack with prefill + single-token decode via KV cache."""

    cfg: LlamaConfig

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        c = self.cfg
        if c.kv_quant:
            # int8 KV cache + per-(position, head) scales: the decode loop
            # re-reads the whole cache every token, so cache bytes rival
            # the (already-quantized) weight stream at long contexts —
            # int8 halves that traffic (see LlamaAttention write/read).
            # HEAD-MAJOR layout (B, H, S, D): the fused decode-attention
            # kernel grids over (B·H) rows without a transposed copy.
            return [
                (
                    jnp.zeros((batch, c.kv_heads, max_len, c.head_dim),
                              jnp.int8),
                    jnp.zeros((batch, c.kv_heads, max_len, c.head_dim),
                              jnp.int8),
                    jnp.zeros((batch, c.kv_heads, max_len), jnp.float32),
                    jnp.zeros((batch, c.kv_heads, max_len), jnp.float32),
                )
                for _ in range(c.num_layers)
            ]
        return [
            (
                jnp.zeros((batch, max_len, c.kv_heads, c.head_dim), dtype),
                jnp.zeros((batch, max_len, c.kv_heads, c.head_dim), dtype),
            )
            for _ in range(c.num_layers)
        ]

    @nn.compact
    def __call__(self, x, mask=None, caches=None, cache_index=None,
                 kv_valid=None):
        """Causal forward. With ``caches`` (list per layer) the call appends
        at ``cache_index`` and returns (hidden, new_caches).

        ``kv_valid`` (B, S) marks which cache slots are real content — the
        ragged-batch serving path left-pads shorter prompts (exact under
        RoPE: attention scores depend only on relative distance) and masks
        the pad slots here. Pad *queries* keep their own slot attendable so
        no softmax row is fully masked (their outputs are never read, but a
        NaN there would poison later layers' cached K/V)."""
        t = x.shape[1]
        if caches is None:
            bias = kv_mask = None
            use_flash = self.cfg.flash_for(x.shape[0], t)
            if use_flash:
                kv_mask = mask  # causal handled analytically in the kernel
            else:
                bias = jnp.where(
                    jnp.tril(jnp.ones((t, t), bool)), 0.0,
                    jnp.finfo(jnp.float32).min
                )[None, None]
                if mask is not None:
                    bias = bias + jnp.where(
                        mask[:, None, None, :], 0.0,
                        jnp.finfo(jnp.float32).min
                    )
            block_cls = (nn.remat(LlamaBlock, static_argnums=())
                         if self.cfg.remat else LlamaBlock)
            for i in range(self.cfg.num_layers):
                x = block_cls(self.cfg, name=f"layer_{i}")(
                    x, bias=bias, kv_mask=kv_mask, causal=use_flash)
            return RMSNorm(name="final_norm")(x)
        new_caches = []
        neg = jnp.finfo(jnp.float32).min
        if t > 1:
            # prefill: causal within the new chunk (quantized caches are
            # head-major (B, H, S, D); dense are (B, S, H, D))
            s_len = caches[0][0].shape[2 if len(caches[0]) == 4 else 1]
            q_pos = cache_index + jnp.arange(t)[:, None]
            k_pos = jnp.arange(s_len)[None, :]
            keep = (k_pos <= q_pos)[None, None]
            if kv_valid is not None:
                self_slot = (k_pos == q_pos)[None, None]
                keep = keep & (kv_valid[:, None, None, :] | self_slot)
            bias = jnp.where(keep, 0.0, neg)
        elif kv_valid is not None:
            # single-token step: pass the validity as a MASK, not a bias —
            # equivalent math, and it keeps the quantized-cache fast paths
            # (bias forces the dense dequantizing tail)
            bias = None
        else:
            bias = None
        step_mask = kv_valid if (t == 1 and kv_valid is not None) else None
        for i in range(self.cfg.num_layers):
            x, cch = LlamaBlock(self.cfg, name=f"layer_{i}")(
                x, bias=bias, cache=caches[i], cache_index=cache_index,
                kv_mask=step_mask,
            )
            new_caches.append(cch)
        return RMSNorm(name="final_norm")(x), new_caches


def sinusoidal_step_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Diffusion-step embedding, reference formula exactly
    (ref `llama_nar.py:20-33` SinusoidalPosEmb: exp-spaced frequencies over
    half the dim, [sin | cos] concat, raw t — no time scaling)."""
    half = dim // 2
    scale = np.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half) * -scale)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class MLP2(nn.Module):
    """Linear(4h) → SiLU → Linear(out or h) (ref cond_mlp / diff_step_mlp /
    mel_mlp / mel_out_mlp, `llama_nar.py:159-181`)."""

    hidden: int
    out: int | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(4 * self.hidden, name="Dense_0")(x)
        return nn.Dense(self.out or self.hidden, name="Dense_1")(nn.silu(x))


class DiffLlamaEncoder(nn.Module):
    """Reference DiffLlama (ref `llama_nar.py:202`): per-token conditioning
    added to the input through cond_mlp, diffusion step through adaLN."""

    cfg: LlamaConfig

    def setup(self):
        self.cond_mlp = MLP2(self.cfg.hidden_size, name="cond_mlp")
        self.diff_step_mlp = MLP2(self.cfg.hidden_size, name="diff_step_mlp")
        self.encoder = LlamaEncoder(self.cfg, name="encoder")

    def __call__(self, x, t, cond, mask=None):
        """x (B, T, D); t (B,) diffusion step; cond (B, T, D) per-token."""
        x = x + self.cond_mlp(cond)
        d = self.diff_step_mlp(
            sinusoidal_step_embedding(t, self.cfg.hidden_size)).astype(x.dtype)
        return self.encoder(x, cond=d, mask=mask)


class DiffLlamaPrefixEncoder(nn.Module):
    """Reference DiffLlamaPrefix (ref `llama_nar.py:427`): the conditioning
    (phone embedding) is prepended as a prefix after cond_mlp; diffusion
    step through adaLN; the prefix positions are cut from the output."""

    cfg: LlamaConfig

    def setup(self):
        self.cond_mlp = MLP2(self.cfg.hidden_size, name="cond_mlp")
        self.diff_step_mlp = MLP2(self.cfg.hidden_size, name="diff_step_mlp")
        self.encoder = LlamaEncoder(self.cfg, name="encoder")

    def __call__(self, x, t, x_mask, phone_emb=None, phone_mask=None):
        d = self.diff_step_mlp(
            sinusoidal_step_embedding(t, self.cfg.hidden_size)).astype(x.dtype)
        if phone_emb is not None:
            prefix = self.cond_mlp(phone_emb)
            h = jnp.concatenate([prefix, x], axis=1)
            m = jnp.concatenate([phone_mask, x_mask], axis=1)
            lp = phone_emb.shape[1]
        else:
            h, m, lp = x, x_mask, 0
        out = self.encoder(h, cond=d, mask=m)
        return out[:, lp:]
