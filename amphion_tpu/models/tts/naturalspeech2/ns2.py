"""NaturalSpeech2: zero-shot latent-diffusion TTS over codec latents,
checkpoint-compatible with the reference (`models/tts/naturalspeech2/`):

- prior encoder (`prior_encoder.py:18`): phone embedding (σ=1e-5 init) +
  SALN transformer conditioned on the prompt encoding, duration + pitch
  predictors with periodic cross-attention on the prompt
  (`modules/naturalpseech2/transformers.py:238,358`), length regulation,
  log-pitch bucketize + embedding;
- WaveNet denoiser (`wavenet.py:131`): FiLM/cross-attention residual
  blocks over the speaker query embeddings, gated dilated convs,
  1/sqrt(L) skip aggregation;
- diffusion (`diffusion.py:13`): x0-prediction SDE with
  cum_beta = beta_min·t + (beta_max-beta_min)/2·t², mean-reverting to 0
  with stationary variance sigma²;
- NaturalSpeech2 (`ns2.py:22`): prompt encoder (SALN stack, no cln) +
  32 learned speaker queries attending over the prompt.

The reference pulls latents from EnCodec (unavailable offline); here the
model consumes codec latents directly — wire any codec's continuous
latents (e.g. `models/codec/amphion_codec`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.modules.duration import length_regulate
from amphion_tpu.modules.saln_transformer import NS3TransformerEncoder


@dataclass(frozen=True)
class NS2Config:
    num_phones: int = 512
    latent_dim: int = 128  # codec latent channels
    hidden: int = 512
    n_layers: int = 6
    n_heads: int = 8
    ffn_filter: int = 2048
    # duration / pitch predictors (ref cfg.prior_encoder.*_predictor)
    predictor_filter: int = 512
    predictor_kernel: int = 3
    predictor_layers: int = 10
    predictor_cattn_every: int = 3
    predictor_heads: int = 8
    # pitch bins
    pitch_min: float = 50.0
    pitch_max: float = 1100.0
    pitch_bins_num: int = 512
    # wavenet (ref cfg.diffusion.wavenet)
    wavenet_layers: int = 40
    wavenet_cattn_every: int = 3
    wavenet_dilation_cycle: int = 2
    wavenet_heads: int = 8
    # diffusion (ref cfg.diffusion)
    beta_min: float = 0.05
    beta_max: float = 20.0
    sigma: float = 1.0
    noise_factor: float = 1.0
    query_tokens: int = 32
    max_frames: int = 1000


class MHA(nn.Module):
    """torch nn.MultiheadAttention equivalent (separate q/k/v/out Dense;
    the converter splits the packed in_proj)."""

    hidden: int
    heads: int

    @nn.compact
    def __call__(self, q_in, kv, key_mask=None):
        b, tq, d = q_in.shape
        nh, hd = self.heads, self.hidden // self.heads
        q = nn.Dense(d, name="q")(q_in).reshape(b, tq, nh, hd)
        k = nn.Dense(d, name="k")(kv).reshape(b, kv.shape[1], nh, hd)
        v = nn.Dense(d, name="v")(kv).reshape(b, kv.shape[1], nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        if key_mask is not None:
            scores = jnp.where(key_mask[:, None, None, :] > 0, scores,
                               jnp.finfo(scores.dtype).min)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, tq, d)
        return nn.Dense(d, name="out")(o)


class ConvCrossAttnPredictor(nn.Module):
    """Duration / pitch predictor (ref transformers.py:238,358): conv-ReLU-LN
    stack with a pre-LN cross-attention on the prompt every
    `cattn_every` layers, residuals from layer 1 on, linear head."""

    filter_size: int
    kernel_size: int = 3
    num_layers: int = 10
    cattn_every: int = 3
    heads: int = 8

    @nn.compact
    def __call__(self, x, mask, ref_emb, ref_mask):
        """x (B, N, d); mask (B, N); ref_emb (B, T', d); ref_mask (B, T')."""
        for idx in range(self.num_layers):
            # ref transformers.py:306: `res` is saved BEFORE the
            # cross-attention — the post-conv residual adds the
            # pre-attention activations
            res = x
            if idx % self.cattn_every == 0:
                a = idx // self.cattn_every
                y = nn.LayerNorm(epsilon=1e-5, name=f"cattn_ln_{a}")(x)
                y = MHA(self.filter_size, self.heads, name=f"cattn_{a}")(
                    y, ref_emb, key_mask=ref_mask)
                x = (y + x) / np.sqrt(2.0)
            x = nn.Conv(self.filter_size, (self.kernel_size,),
                        padding="SAME", name=f"conv_{idx}")(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"ln_{idx}")(x)
            if idx != 0:
                x = x + res
            if mask is not None:
                x = x * mask[..., None]
        return nn.Dense(1, name="linear")(x)[..., 0]


class PriorEncoder(nn.Module):
    """ref prior_encoder.py:18."""

    cfg: NS2Config

    def setup(self):
        c = self.cfg
        self.phone_emb = nn.Embed(
            c.num_phones, c.hidden,
            embedding_init=nn.initializers.normal(1e-5), name="phone_emb")
        self.encoder = NS3TransformerEncoder(
            hidden=c.hidden, num_layers=c.n_layers, heads=c.n_heads,
            filter_size=c.ffn_filter, use_cln=True, name="encoder")
        self.duration_predictor = ConvCrossAttnPredictor(
            c.predictor_filter, c.predictor_kernel, c.predictor_layers,
            c.predictor_cattn_every, c.predictor_heads,
            name="duration_predictor")
        self.pitch_predictor = ConvCrossAttnPredictor(
            c.predictor_filter, c.predictor_kernel, c.predictor_layers,
            c.predictor_cattn_every, c.predictor_heads,
            name="pitch_predictor")
        self.pitch_embedding = nn.Embed(c.pitch_bins_num, c.hidden,
                                        name="pitch_embedding")

    def _pitch_bins(self):
        c = self.cfg
        return jnp.asarray(np.exp(np.linspace(
            np.log(c.pitch_min), np.log(c.pitch_max), c.pitch_bins_num - 1)))

    def __call__(self, phone_id, duration=None, pitch=None, phone_mask=None,
                 mask=None, ref_emb=None, ref_mask=None, is_inference=False,
                 max_frames=None):
        """phone_id (B, N); duration (B, N); pitch (B, T); ref_emb (B, T', d).
        Returns the frame-rate prior condition + predictor outputs."""
        c = self.cfg
        x = self.phone_emb(phone_id)
        x = self.encoder(x, condition=ref_emb, mask=phone_mask)
        dur_log = self.duration_predictor(x, phone_mask, ref_emb, ref_mask)
        dur_round = jnp.maximum(
            jnp.round(jnp.exp(dur_log) - 1.0), 0.0).astype(jnp.int32)
        if phone_mask is not None:
            dur_round = dur_round * phone_mask.astype(jnp.int32)

        use_dur = dur_round if (is_inference or duration is None) else duration
        t_max = max_frames or (pitch.shape[1] if pitch is not None
                               else c.max_frames)
        x, fmask = length_regulate(x, use_dur, t_max)
        fmask = fmask.astype(jnp.float32)
        frame_mask = mask if mask is not None else fmask

        pitch_pred_log = self.pitch_predictor(x, frame_mask, ref_emb, ref_mask)
        bins = self._pitch_bins()
        if is_inference or pitch is None:
            tok = jnp.searchsorted(bins, jnp.exp(pitch_pred_log))
        else:
            tok = jnp.searchsorted(bins, pitch)
        x = x + self.pitch_embedding(tok)
        if (not is_inference) and mask is not None:
            x = x * mask[..., None]
        return {
            "prior_out": x, "frame_mask": fmask,
            "dur_pred_log": dur_log, "dur_pred_round": dur_round,
            "pitch_pred_log": pitch_pred_log, "pitch_token": tok,
        }


class FiLM(nn.Module):
    """ref wavenet.py:13 (gain bias-init 1, bias bias-init 0)."""

    @nn.compact
    def __call__(self, x, condition):
        d = x.shape[-1]
        gain = nn.Dense(d, bias_init=nn.initializers.ones, name="gain")(condition)
        bias = nn.Dense(d, name="bias")(condition)
        if gain.ndim == 2:
            gain = gain[:, None, :]
        if bias.ndim == 2:
            bias = bias[:, None, :]
        return x * gain + bias


class WaveNetResBlock(nn.Module):
    """ref wavenet.py:68 ResidualBlock."""

    hidden: int
    dilation: int
    heads: int
    has_cattn: bool

    @nn.compact
    def __call__(self, x, x_mask, cond, diff_emb, spk_query_emb):
        """x (B, T, d); cond (B, T, d) — each block has its OWN cond_proj
        (ref wavenet.py:83: self.cond_proj per ResidualBlock); diff_emb
        (B, d)."""
        d = self.hidden
        cond2 = nn.Dense(2 * d, name="cond_proj")(cond)
        y = x + nn.Dense(d, name="diffusion_proj")(diff_emb)[:, None, :]
        if x_mask is not None:
            y = y * x_mask[..., None]
        if self.has_cattn:
            y_ = nn.LayerNorm(epsilon=1e-5, name="ln")(y)
            y_ = MHA(d, self.heads, name="attn")(y_, spk_query_emb)
        y = nn.Conv(2 * d, (3,), kernel_dilation=(self.dilation,),
                    padding="SAME", name="dilated_conv")(y) + cond2
        if self.has_cattn:
            y = FiLM(name="film")(y, y_)
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Dense(2 * d, name="out_proj")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        if x_mask is not None:
            residual = residual * x_mask[..., None]
            skip = skip * x_mask[..., None]
        return (x + residual) / np.sqrt(2.0), skip


class WaveNet(nn.Module):
    """ref wavenet.py:131."""

    cfg: NS2Config

    @nn.compact
    def __call__(self, x, x_mask, cond, diffusion_step, spk_query_emb):
        """x (B, T, latent); cond (B, T, hidden); diffusion_step (B,)."""
        c = self.cfg
        d = c.hidden
        cond = nn.LayerNorm(epsilon=1e-5, name="cond_ln")(cond)
        h = jax.nn.relu(nn.Dense(d, name="in_proj")(x))
        # sinusoidal step embedding (ref SinusoidalPosEmb, raw t)
        half = d // 2
        freqs = jnp.exp(jnp.arange(half) * -(np.log(10000.0) / (half - 1)))
        ang = diffusion_step.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        emb = nn.Dense(4 * d, name="mlp_0")(emb)
        emb = emb * jnp.tanh(jax.nn.softplus(emb))  # Mish
        emb = nn.Dense(d, name="mlp_1")(emb)
        skips = 0.0
        for i in range(c.wavenet_layers):
            h, skip = WaveNetResBlock(
                d, 2 ** (i % c.wavenet_dilation_cycle), c.wavenet_heads,
                has_cattn=(i % c.wavenet_cattn_every == 0),
                name=f"layer_{i}")(h, x_mask, cond, emb, spk_query_emb)
            skips = skips + skip
        h = skips / np.sqrt(c.wavenet_layers)
        h = jax.nn.relu(nn.Dense(d, name="skip_proj")(h))
        return nn.Dense(c.latent_dim, kernel_init=nn.initializers.zeros,
                        name="out_proj")(h)


class Diffusion(nn.Module):
    """ref diffusion.py:13 — x0-prediction mean-reverting SDE."""

    cfg: NS2Config

    def setup(self):
        self.diff_estimator = WaveNet(self.cfg, name="diff_estimator")

    def _cum_beta(self, t):
        c = self.cfg
        return c.beta_min * t + 0.5 * (c.beta_max - c.beta_min) * t**2

    def _beta_t(self, t):
        c = self.cfg
        return c.beta_min + (c.beta_max - c.beta_min) * t

    def forward_diffusion(self, x0, t, z):
        c = self.cfg
        cb = self._cum_beta(t)[:, None, None]
        mean = x0 * jnp.exp(-0.5 * cb / c.sigma**2)
        var = c.sigma**2 * (1.0 - jnp.exp(-cb / c.sigma**2))
        return mean + z * jnp.sqrt(var) * c.noise_factor

    def loss_terms(self, x, x_mask, cond, spk_query_emb, t, z):
        """ref forward (diffusion.py:25-45): returns x0_pred / noise_pred."""
        c = self.cfg
        xt = self.forward_diffusion(x, t, z)
        cb = self._cum_beta(t)[:, None, None]
        x0_pred = self.diff_estimator(xt, x_mask, cond, t, spk_query_emb)
        mean_pred = x0_pred * jnp.exp(-0.5 * cb / c.sigma**2)
        var = c.sigma**2 * (1.0 - jnp.exp(-cb / c.sigma**2))
        noise_pred = (xt - mean_pred) / (jnp.sqrt(var) * c.noise_factor)
        return {"x0_pred": x0_pred, "noise_pred": noise_pred, "noise": z,
                "xt": xt}

    def cal_dxt(self, xt, x_mask, cond, spk_query_emb, t, h):
        c = self.cfg
        cb = self._cum_beta(t)[:, None, None]
        bt = self._beta_t(t)[:, None, None]
        # estimator runs in xt.dtype (bf16 under ns2_sample's default);
        # the SDE coefficient math stays f32
        x0_pred = self.diff_estimator(
            xt, x_mask, cond, t, spk_query_emb).astype(jnp.float32)
        xt = xt.astype(jnp.float32)
        mean_pred = x0_pred * jnp.exp(-0.5 * cb / c.sigma**2)
        var = c.sigma**2 * (1.0 - jnp.exp(-cb / c.sigma**2))
        logp = -(xt - mean_pred) / (var + 1e-8)
        return -0.5 * h * bt * (logp + xt / c.sigma**2)


class NaturalSpeech2(nn.Module):
    """ref ns2.py:22 (minus the EnCodec wrapper — latents come in
    directly)."""

    cfg: NS2Config

    def setup(self):
        c = self.cfg
        self.prior_encoder = PriorEncoder(c, name="prior_encoder")
        self.diffusion = Diffusion(c, name="diffusion")
        self.prompt_encoder = NS3TransformerEncoder(
            hidden=c.hidden, num_layers=c.n_layers, heads=c.n_heads,
            filter_size=c.ffn_filter, use_cln=False, name="prompt_encoder")
        self.prompt_lin = nn.Dense(c.hidden, name="prompt_lin")
        self.query_emb = nn.Embed(c.query_tokens, c.hidden, name="query_emb")
        self.query_attn = MHA(c.hidden, c.n_heads, name="query_attn")

    def encode_prompt(self, ref_latent, ref_mask):
        """(B, T', latent) prompt latents → (spk_emb (B, T', d),
        spk_query_emb (B, Q, d)) (ref ns2.py:109-128)."""
        c = self.cfg
        ref = self.prompt_lin(ref_latent)
        ref = self.prompt_encoder(ref, mask=ref_mask)
        q = self.query_emb(jnp.arange(c.query_tokens))[None]
        q = jnp.broadcast_to(q, (ref.shape[0], c.query_tokens, c.hidden))
        q = self.query_attn(q, ref, key_mask=ref_mask)
        return ref, q

    def loss(self, latent, phone_id, phone_mask, ref_latent, ref_mask,
             duration, pitch, mask, rng):
        """Training objective (ref ns2_loss.py + trainer): diffusion data
        loss on x0/noise + duration + pitch losses."""
        r_t, r_n = jax.random.split(rng)
        b = latent.shape[0]
        spk_emb, spk_query = self.encode_prompt(ref_latent, ref_mask)
        prior = self.prior_encoder(
            phone_id, duration=duration, pitch=pitch, phone_mask=phone_mask,
            mask=mask, ref_emb=spk_emb, ref_mask=ref_mask)
        t = jnp.clip(jax.random.uniform(r_t, (b,)), 1e-5, 1.0 - 1e-5)
        z = jax.random.normal(r_n, latent.shape)
        diff = self.diffusion.loss_terms(
            latent, mask, prior["prior_out"], spk_query, t, z)
        w = mask[..., None]
        norm = jnp.maximum(jnp.sum(w) * latent.shape[-1], 1.0)
        diff_loss = (jnp.sum((diff["x0_pred"] - latent) ** 2 * w) / norm
                     + jnp.sum((diff["noise_pred"] - z) ** 2 * w) / norm)
        log_d_tgt = jnp.log(duration.astype(jnp.float32) + 1.0)
        dur_loss = jnp.sum((prior["dur_pred_log"] - log_d_tgt) ** 2
                           * phone_mask) / jnp.maximum(jnp.sum(phone_mask), 1.0)
        pitch_loss = jnp.sum((jnp.exp(prior["pitch_pred_log"]) - pitch) ** 2
                             * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        total = diff_loss + dur_loss + pitch_loss
        return total, {"diff": diff_loss, "dur": dur_loss,
                       "pitch": pitch_loss}

    def prior_infer(self, phone_id, phone_mask, ref_latent, ref_mask,
                    max_frames=None):
        spk_emb, spk_query = self.encode_prompt(ref_latent, ref_mask)
        prior = self.prior_encoder(
            phone_id, phone_mask=phone_mask, ref_emb=spk_emb,
            ref_mask=ref_mask, is_inference=True, max_frames=max_frames)
        return prior["prior_out"], prior["frame_mask"], spk_query

    def denoise_step(self, xt, x_mask, cond, spk_query, t, h):
        return self.diffusion.cal_dxt(xt, x_mask, cond, spk_query, t, h)


@functools.lru_cache(maxsize=16)
def _ns2_sample_jitted(model, num_steps, max_frames, compute_dtype):
    c = model.cfg
    dt = jnp.dtype(compute_dtype)
    h = 1.0 / num_steps

    def core(params, phone_id, phone_mask, ref_latent, ref_mask, rng):
        # prior (duration/pitch) stays f32 so frame counts match training;
        # the num_steps x WaveNet denoise loop — the hot path — runs in
        # compute_dtype with f32 SDE math (cal_dxt upcasts)
        cond, fmask, spk_query = model.apply(
            {"params": params}, phone_id, phone_mask, ref_latent, ref_mask,
            max_frames, method=NaturalSpeech2.prior_infer)
        b, t_len = fmask.shape
        params_dt = jax.tree_util.tree_map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params)
        cond_dt = cond.astype(dt)
        sq_dt = spk_query.astype(dt)
        xt = jax.random.normal(rng, (b, t_len, c.latent_dim)) * c.noise_factor

        def body(x, i):
            t = (1.0 - (i.astype(jnp.float32) + 0.5) * h) * jnp.ones((b,))
            dxt = model.apply(
                {"params": params_dt}, x.astype(dt), fmask, cond_dt, sq_dt,
                t, h, method=NaturalSpeech2.denoise_step)
            return x - dxt, None

        xt, _ = jax.lax.scan(body, xt, jnp.arange(num_steps))
        return xt * fmask[..., None], fmask

    return jax.jit(core)


def ns2_sample(
    model: NaturalSpeech2, params, phone_id, phone_mask, ref_latent, ref_mask,
    rng, num_steps: int = 100, max_frames: int | None = None,
    compute_dtype: str = "bfloat16",
):
    """Reverse SDE Euler sampler (ref diffusion.py reverse_diffusion:
    t from 1 → 0, xt -= dxt). Memoized self-jitting (eager loops dispatch
    op-by-op through the TPU tunnel); denoiser in ``compute_dtype``."""
    return _ns2_sample_jitted(model, num_steps, max_frames, compute_dtype)(
        params, phone_id, phone_mask, ref_latent, ref_mask, rng)


def ns2_config_from_model_cfg(m, num_phones: int, latent_dim: int,
                              max_frames: int) -> NS2Config:
    """Build NS2Config from a reference-style ``cfg.model.ns2`` block."""
    get = (lambda k, d: m.get(k, d)) if m else (lambda k, d: d)
    hidden = get("hidden", 256)
    heads = get("n_heads", 4)
    return NS2Config(
        num_phones=num_phones, latent_dim=latent_dim, hidden=hidden,
        n_layers=get("n_layers", 4), n_heads=heads,
        ffn_filter=get("ffn_filter", 4 * hidden),
        predictor_filter=get("predictor_filter", hidden),
        predictor_layers=get("predictor_layers", 4),
        predictor_cattn_every=get("predictor_cattn_every", 3),
        predictor_heads=get("predictor_heads", heads),
        wavenet_layers=get("denoiser_layers", 12),
        wavenet_cattn_every=get("wavenet_cattn_every", 3),
        wavenet_dilation_cycle=get("wavenet_dilation_cycle", 2),
        wavenet_heads=heads,
        query_tokens=get("query_tokens", 32), max_frames=max_frames,
    )
