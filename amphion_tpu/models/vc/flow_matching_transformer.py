"""Vevo flow-matching transformer: content-style tokens → mel.

Checkpoint-compatible re-design of the reference (reference:
`models/vc/flow_matching_transformer/fmt_model.py:13` FlowMatchingTransformer
+ `llama_nar.py:127` DiffLlama): `cond_emb` (token embedding or feature
linear) + a DiffLlama whose mel in/out MLPs live INSIDE the backbone
(mel_mlp / mel_out_mlp, each Linear→SiLU→Linear), per-token condition added
through cond_mlp, the flow time through adaLN (raw t — no time scaling),
and the reference's prompt-prefix protocol: prompt frames are kept CLEAN in
the input (timbre conditioning), the loss covers only non-prompt frames,
and classifier-free guidance at inference runs the estimator a second time
on the target-only region with zeroed condition, with the reference's
std-rescale (`reverse_diffusion`, fmt_model.py:232-279).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.flow_matching import cfm_loss, cfm_pair
from amphion_tpu.modules.llama import (
    MLP2,
    LlamaConfig,
    LlamaEncoder,
    sinusoidal_step_embedding,
)


@dataclass(frozen=True)
class FMTConfig:
    token_vocab: int = 8192  # content-style tokens (cond_codebook_size)
    n_mel: int = 80
    hidden: int = 1024
    num_layers: int = 16
    num_heads: int = 16
    max_position: int = 8192
    use_cond_code: bool = True  # False: continuous cond features via Dense
    cond_dim: int = 1024  # feature dim when use_cond_code=False
    cond_drop_prob: float = 0.2  # ref cfg_scale: prob of uncond training step
    sigma_min: float = 1e-5
    time_scheduler: str = "linear"  # or "cos" (CosyVoice-style)
    # integer nearest-neighbor upsampling of the condition stream to the
    # mel frame rate (DualCodec-VoiceBox: 12.5 Hz semantic codes × 4 →
    # 50 Hz mel; ref dualcodec voicebox_models.py cond_scale_factor)
    cond_scale_factor: int = 1

    remat: bool = False  # rematerialize backbone blocks (memory lever)
    # "none" | "int8" | "int4": inference-time weight-only quantization of
    # the estimator's projection kernels — the 32-step ODE re-reads every
    # weight per step, so the loop is weight-HBM-bound like AR decode and
    # int8 halves the dominant traffic again over bf16. Set via
    # fmt_inference(compute_dtype="int8"|"int4").
    decode_quant: str = "none"

    def llama(self) -> LlamaConfig:
        return LlamaConfig(
            hidden_size=self.hidden, num_layers=self.num_layers,
            num_heads=self.num_heads, adaptive=True,
            intermediate_size=self.hidden * 4,
            max_position=self.max_position, remat=self.remat,
            decode_quant=self.decode_quant,
        )


class DiffLlamaMel(nn.Module):
    """Reference FMT DiffLlama (llama_nar.py:127): built-in mel in/out MLPs,
    x = mel_mlp(x) + cond_mlp(cond), adaLN layers + final norm on the
    diffusion-step embedding, mel_out_mlp head."""

    cfg: LlamaConfig
    n_mel: int

    def setup(self):
        h = self.cfg.hidden_size
        self.mel_mlp = MLP2(h, name="mel_mlp")
        self.cond_mlp = MLP2(h, name="cond_mlp")
        self.diff_step_mlp = MLP2(h, name="diff_step_mlp")
        self.encoder = LlamaEncoder(self.cfg, name="encoder")
        self.mel_out_mlp = MLP2(h, out=self.n_mel, name="mel_out_mlp")

    def __call__(self, x, t, cond, mask=None):
        """x (B, T, n_mel); t (B,) flow time in [0, 1] (raw — the reference
        feeds t directly into the sinusoidal embedding); cond (B, T, D)."""
        h = self.mel_mlp(x) + self.cond_mlp(cond)
        d = self.diff_step_mlp(
            sinusoidal_step_embedding(t, self.cfg.hidden_size)).astype(h.dtype)
        out = self.encoder(h, cond=d, mask=mask)
        return self.mel_out_mlp(out)


class FlowMatchingTransformer(nn.Module):
    cfg: FMTConfig

    def setup(self):
        c = self.cfg
        if c.use_cond_code:
            self.cond_emb = nn.Embed(c.token_vocab, c.hidden)
        else:
            self.cond_emb = nn.Dense(c.hidden)
        self.diff_estimator = DiffLlamaMel(c.llama(), c.n_mel)

    def _cond(self, tokens):
        if self.cfg.use_cond_code:
            # defensive clip: the AR stage samples the reference's FULL
            # unified vocab (protocol parity — ar_model.py generate), so
            # an untrained/misbehaving model can emit ids outside the
            # style codebook; flax Embed out-of-range lookups FILL NaN
            # under jit, which poisons the whole ODE. Clipping is a no-op
            # for legal inputs.
            tokens = jnp.clip(tokens, 0, self.cfg.token_vocab - 1)
        cond = self.cond_emb(tokens)
        if self.cfg.cond_scale_factor != 1:
            cond = jnp.repeat(cond, self.cfg.cond_scale_factor, axis=1)
        return cond

    def velocity(self, x_t, t, tokens, prompt_mel, prompt_len_mask, x_mask,
                 drop_cond=False):
        """Predict the flow. x_t: (B, T, n_mel) noisy target mel;
        prompt_mel: (B, T, n_mel) with valid frames marked by
        prompt_len_mask (B, T) — prompt frames enter CLEAN (ref
        forward_diffusion: xt = noisy*mask + x*(1-mask)); tokens: (B, T)."""
        cond = self._cond(tokens)[:, :x_t.shape[1]]
        # ref loss_t: condition dropped entirely for CFG training steps
        cond = cond * (1.0 - jnp.asarray(drop_cond, jnp.float32))
        x_in = jnp.where(prompt_len_mask[..., None] > 0, prompt_mel, x_t)
        return self.diff_estimator(x_in, t, cond, mask=x_mask)

    def loss(self, mel, tokens, prompt_len_mask, x_mask, rng):
        """CFM loss on non-prompt frames (ref compute_loss/loss_t). The
        trainer supplies prompt_len_mask; a zero prompt row is the
        reference's uncond/CFG case, in which the condition is dropped."""
        c = self.cfg
        r_t, r_n = jax.random.split(rng)
        b = mel.shape[0]
        t = jnp.clip(jax.random.uniform(r_t, (b,)), 1e-5, 1.0)
        if c.time_scheduler == "cos":
            t = 1.0 - jnp.cos(t * jnp.pi * 0.5)
        noise = jax.random.normal(r_n, mel.shape)
        x_t, v_target = cfm_pair(mel, t, noise, c.sigma_min)
        # ref: cond dropped for rows whose prompt_len == 0
        has_prompt = (jnp.sum(prompt_len_mask, axis=1) > 0)[:, None, None]
        cond = self._cond(tokens)[:, :mel.shape[1]] * has_prompt.astype(mel.dtype)
        x_in = jnp.where(prompt_len_mask[..., None] > 0, mel, x_t)
        v_pred = self.diff_estimator(x_in, t, cond, mask=x_mask)
        w = x_mask * (1.0 - prompt_len_mask)
        loss = cfm_loss(v_pred, v_target, w)
        return loss, {"fm_loss": loss}

    def flow_eval(self, xt, t, cond_tokens, prompt_mel, cfg=1.0,
                  rescale_cfg=0.75):
        """One flow evaluation of the reference `reverse_diffusion` step
        (fmt_model.py:232-279): estimator on [prompt; x_t]; when cfg > 0 a
        second uncond pass on the TARGET-ONLY region with zeroed condition,
        combined with the std-rescale trick. xt: (B, Lt, n_mel);
        cond_tokens: (B, Lp+Lt); prompt_mel: (B, Lp, n_mel)."""
        lp = prompt_mel.shape[1]
        x_full = jnp.concatenate([prompt_mel, xt], axis=1)
        cond = self._cond(cond_tokens)[:, :x_full.shape[1]].astype(xt.dtype)
        # CFG std-rescale + Euler integration stay f32 even when the
        # estimator runs bf16 (fmt_inference compute_dtype)
        flow = self.diff_estimator(x_full, t, cond)[:, lp:].astype(jnp.float32)
        if cfg > 0:
            un = self.diff_estimator(
                xt, t, jnp.zeros_like(cond[:, lp:])).astype(jnp.float32)
            pos_std = jnp.std(flow)
            flow_cfg = flow + cfg * (flow - un)
            rescaled = flow_cfg * pos_std / jnp.maximum(
                jnp.std(flow_cfg), 1e-12)
            flow = rescale_cfg * rescaled + (1 - rescale_cfg) * flow_cfg
        return flow

    def flow_eval_fused(self, xt, t, cond_tokens, prompt_mel, cfg=1.0,
                        rescale_cfg=0.75):
        """`flow_eval` with the CFG cond/uncond passes fused into ONE
        batch-2B estimator call. The uncond row is the target-only region
        placed at positions 0..Lt-1 and right-padded to the cond row's
        length with an attention mask — identical math to the reference's
        second `reverse_diffusion` pass (fmt_model.py:232-279), batched.

        NOT the inference default: measured on v5e at B=1/Lp=281/Lt=938 it
        LOSES to two-pass `flow_eval` (0.627 s vs 0.343 s per 32-step ODE)
        — the padded uncond row adds ~30% attention+FFN work and the mask
        forces the bias-add attention path. Kept for parity experiments."""
        b, lt = xt.shape[0], xt.shape[1]
        lp = prompt_mel.shape[1]
        x_cond = jnp.concatenate([prompt_mel, xt], axis=1)  # (B, Lp+Lt)
        cond = self._cond(cond_tokens)[:, : lp + lt].astype(xt.dtype)
        if cfg <= 0:
            return self.diff_estimator(
                x_cond, t, cond)[:, lp:].astype(jnp.float32)
        x_un = jnp.pad(xt, ((0, 0), (0, lp), (0, 0)))
        x2 = jnp.concatenate([x_cond, x_un], axis=0)
        cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        valid_un = (jnp.arange(lp + lt) < lt).astype(xt.dtype)
        mask2 = jnp.concatenate(
            [jnp.ones((b, lp + lt), xt.dtype),
             jnp.broadcast_to(valid_un, (b, lp + lt))], axis=0)
        est = self.diff_estimator(x2, t2, cond2, mask=mask2)
        flow = est[:b, lp:].astype(jnp.float32)
        un = est[b:, :lt].astype(jnp.float32)
        pos_std = jnp.std(flow)
        flow_cfg = flow + cfg * (flow - un)
        rescaled = flow_cfg * pos_std / jnp.maximum(jnp.std(flow_cfg), 1e-12)
        return rescale_cfg * rescaled + (1 - rescale_cfg) * flow_cfg


def _fmt_quant_prep(model, compute_dtype):
    """(model', dt, quant) for the ODE loop: int8/int4 rebuild the
    estimator with quantized projections (QDense via decode_quant) and
    run activations bf16 — the same weight-streaming lever as AR decode
    (`ar_transformer._quantize_for_decode`); prompt-region KV canNOT be
    cached across ODE steps instead: the adaLN modulation depends on the
    flow time t, so prompt K/V legitimately change every step."""
    if compute_dtype in ("int8", "int4"):
        import dataclasses

        model = FlowMatchingTransformer(
            dataclasses.replace(model.cfg, decode_quant=compute_dtype))
        return model, jnp.dtype(jnp.bfloat16), compute_dtype
    return model, jnp.dtype(compute_dtype), None


def _fmt_cast_params(params, dt, quant):
    from amphion_tpu.modules.llama import quantize_llama_params

    params = jax.tree_util.tree_map(
        lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
    if quant:
        params = {**params,
                  "diff_estimator": quantize_llama_params(
                      params["diff_estimator"], quant)}
    return params


@functools.lru_cache(maxsize=32)
def _fmt_inference_jitted(model, b, lp, lt, num_steps, cfg_scale,
                          rescale_cfg, compute_dtype, explicit_noise=False,
                          solver="euler"):
    n_mel = model.cfg.n_mel
    h = 1.0 / num_steps
    model, dt, quant = _fmt_quant_prep(model, compute_dtype)

    def core(params, tokens, prompt_mel, rng):
        # the 32-step ODE re-reads the estimator weights every step — bf16
        # weights halve that HBM traffic and double MXU rate (int8/int4
        # halve/quarter it again); integration state and CFG math stay
        # f32 (flow_eval upcasts)
        params = _fmt_cast_params(params, dt, quant)
        pm = prompt_mel.astype(dt)
        xt0 = rng if explicit_noise else jax.random.normal(rng, (b, lt, n_mel))

        def flow_at(xt, t):
            # two-pass CFG, NOT flow_eval_fused: measured on v5e at the
            # bench shape (B=1, Lp=281, Lt=938, 32 steps) the fused batch-2B
            # call is SLOWER — 0.627 s vs 0.343 s dense (the uncond row pads
            # Lt→Lp+Lt and the mask forces a bias-add attention path)
            return model.apply(
                {"params": params}, xt.astype(dt), t, tokens, pm, cfg_scale,
                rescale_cfg, method=FlowMatchingTransformer.flow_eval)

        if solver == "midpoint":
            # explicit midpoint (RK2): 2 estimator evals per step — so the
            # cost unit across solvers is EVALS, and midpoint at n steps
            # costs the same as Euler at 2n. Second-order in h where the
            # reference's midpoint-sampled Euler is first-order.
            def body(xt, i):
                t0 = i.astype(jnp.float32) * h * jnp.ones((b,))
                k1 = flow_at(xt, t0)
                k2 = flow_at(xt + 0.5 * h * k1, t0 + 0.5 * h)
                return xt + h * k2, None
        else:
            def body(xt, i):
                # midpoint times t = (i + 0.5)/n (ref fmt_model.py:260)
                t = (i.astype(jnp.float32) + 0.5) * h * jnp.ones((b,))
                return xt + h * flow_at(xt, t), None

        xt, _ = jax.lax.scan(body, xt0, jnp.arange(num_steps))
        return xt

    return jax.jit(core)


def fmt_inference(
    model: FlowMatchingTransformer,
    params,
    tokens: jax.Array,  # (B, Lp+Lt) frame-aligned content-style tokens
    prompt_mel: jax.Array,  # (B, Lp, n_mel) clean prompt mel
    rng: jax.Array,
    num_steps: int = 32,
    cfg_scale: float = 0.0,
    rescale_cfg: float = 0.75,
    compute_dtype: str = "bfloat16",
    noise: jax.Array | None = None,
    solver: str = "euler",
):
    """ODE from noise to mel with the reference's prompt-prefix + CFG
    std-rescale protocol. Memoized self-jitting (eager loops dispatch
    op-by-op through the TPU tunnel). The estimator runs in
    ``compute_dtype`` (bf16 default — same decode lever as MaskGCT/VALL-E);
    CFG std-rescale and the integration state stay f32. ``noise``
    (B, Lt, n_mel) replaces the internally drawn x_0 (parity tests).
    ``solver``: "euler" (the reference's midpoint-sampled Euler,
    fmt_model.py:260; 1 estimator eval/step) or "midpoint" (explicit RK2,
    2 evals/step — compare at matched EVAL budget; see the `fm_frontier`
    bench for the measured step/solver latency-quality frontier). Returns
    generated target mel (B, Lt, n_mel)."""
    b = tokens.shape[0]
    lp = prompt_mel.shape[1]
    lt = tokens.shape[1] * model.cfg.cond_scale_factor - lp
    return _fmt_inference_jitted(
        model, b, lp, lt, num_steps, float(cfg_scale), float(rescale_cfg),
        compute_dtype, noise is not None, solver)(
        params, tokens, prompt_mel, rng if noise is None else noise)


@functools.lru_cache(maxsize=32)
def _fmt_inference_ragged_jitted(model, b, lp_tok, lt_tok, num_steps,
                                 cfg_scale, rescale_cfg, compute_dtype,
                                 explicit_noise=False, solver="euler"):
    from amphion_tpu.ops.ragged import (
        masked_std,
        pack_segments,
        unpack_target,
    )

    n_mel = model.cfg.n_mel
    csf = model.cfg.cond_scale_factor
    lp, lt = lp_tok * csf, lt_tok * csf
    h = 1.0 / num_steps
    model, dt, quant = _fmt_quant_prep(model, compute_dtype)

    def cond_of(m, toks):
        return m._cond(toks)

    def estimate(m, x, t, cond, mask):
        return m.diff_estimator(x, t, cond, mask=mask)

    def core(params, prompt_tokens, prompt_tok_len, target_tokens,
             target_tok_len, prompt_mel, rng):
        params = _fmt_cast_params(params, dt, quant)
        pm = prompt_mel.astype(dt)
        p_len = prompt_tok_len.astype(jnp.int32) * csf  # (B,) prompt frames
        t_len = target_tok_len.astype(jnp.int32) * csf  # (B,) target frames
        tok_full = pack_segments(
            [prompt_tokens.astype(jnp.int32), target_tokens.astype(jnp.int32)],
            [prompt_tok_len.astype(jnp.int32), target_tok_len.astype(jnp.int32)])
        cond = model.apply({"params": params}, tok_full,
                           method=cond_of).astype(dt)
        pos_full = jnp.arange(lp + lt)[None, :]
        x_mask = (pos_full < (p_len + t_len)[:, None]).astype(jnp.float32)
        pos_t = jnp.arange(lt)[None, :]
        t_valid = pos_t < t_len[:, None]
        t_mask = t_valid.astype(jnp.float32)
        if explicit_noise:
            xt0 = rng * t_mask[..., None]
        else:
            xt0 = jax.vmap(
                lambda k: jax.random.normal(k, (lt, n_mel)))(rng)
            xt0 = xt0 * t_mask[..., None]

        def flow_at(xt, t):
            x_full = pack_segments([pm, xt.astype(dt)], [p_len, t_len])
            flow_full = model.apply(
                {"params": params}, x_full, t, cond, x_mask,
                method=estimate)
            flow = unpack_target(flow_full, p_len, lt).astype(jnp.float32)
            if cfg_scale > 0:
                un = model.apply(
                    {"params": params}, xt.astype(dt), t,
                    jnp.zeros((b, lt, cond.shape[-1]), dt), t_mask,
                    method=estimate).astype(jnp.float32)
                # per-sample masked std (the fixed-shape path's jnp.std is
                # batch-global — correct only at B=1; serving must not
                # couple requests through the CFG rescale)
                pos_std = masked_std(flow, t_valid)
                flow_cfg = flow + cfg_scale * (flow - un)
                rescaled = flow_cfg * pos_std / jnp.maximum(
                    masked_std(flow_cfg, t_valid), 1e-12)
                flow = rescale_cfg * rescaled + (1 - rescale_cfg) * flow_cfg
            return flow * t_mask[..., None]

        if solver == "midpoint":
            def body(xt, i):
                t0 = i.astype(jnp.float32) * h * jnp.ones((b,))
                k1 = flow_at(xt, t0)
                k2 = flow_at(xt + 0.5 * h * k1, t0 + 0.5 * h)
                return xt + h * k2, None
        else:
            def body(xt, i):
                t = (i.astype(jnp.float32) + 0.5) * h * jnp.ones((b,))
                return xt + h * flow_at(xt, t), None

        xt, _ = jax.lax.scan(body, xt0, jnp.arange(num_steps))
        return xt

    return jax.jit(core)


def fmt_inference_ragged(
    model: FlowMatchingTransformer,
    params,
    prompt_tokens: jax.Array,  # (B, Lp_tok_max) right-padded
    prompt_tok_len: jax.Array,  # (B,)
    target_tokens: jax.Array,  # (B, Lt_tok_max) right-padded
    target_tok_len: jax.Array,  # (B,)
    prompt_mel: jax.Array,  # (B, Lp_tok_max*csf, n_mel) right-padded
    rngs: jax.Array,  # (B,) key array — one noise stream per request
    num_steps: int = 32,
    cfg_scale: float = 0.0,
    rescale_cfg: float = 0.75,
    compute_dtype: str = "bfloat16",
    noise: jax.Array | None = None,
    solver: str = "euler",
):
    """Ragged batched `fmt_inference`: B requests with per-sample prompt /
    target lengths share ONE compiled 32-step ODE (the serving path).
    Per step the prompt mel and the Euler state are packed left-aligned
    ``[prompt_i | target_i | pad]`` (`ops/ragged.py` — exact RoPE
    positions) with pad frames masked out of attention; the CFG std-rescale
    runs per-sample over valid target frames so results do not depend on
    batch composition (tests/test_ragged_vevo.py). Returns target mel
    (B, Lt_tok_max*csf, n_mel), valid through each sample's own
    ``target_tok_len*csf`` frames."""
    b, lp_tok = prompt_tokens.shape
    lt_tok = target_tokens.shape[1]
    assert prompt_mel.shape[1] == lp_tok * model.cfg.cond_scale_factor
    fn = _fmt_inference_ragged_jitted(
        model, b, lp_tok, lt_tok, num_steps, float(cfg_scale),
        float(rescale_cfg), compute_dtype, noise is not None, solver)
    return fn(params, jnp.asarray(prompt_tokens), jnp.asarray(prompt_tok_len),
              jnp.asarray(target_tokens), jnp.asarray(target_tok_len),
              jnp.asarray(prompt_mel), rngs if noise is None else noise)
