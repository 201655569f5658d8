"""ComoSVC: Karras-EDM teacher + consistency-distilled one-step student,
checkpoint-compatible with the reference (`models/svc/comosvc/comosvc.py`):

- Conformer prior encoder (`transformer/conformer.py:369` — the VITS-style
  relative-window attention Encoder, window 4, k3 conv FFN, + 1x1
  projection to mel) predicting `mu` from condition features;
- EDM preconditioning (`comosvc.py:52` EDMPrecond) around the
  DiffusionWrapper BiDilConv denoiser (`diffusion_wrapper.py:12`, ==
  our `WaveNetDenoiser`) with the consistency-model c_out
  `(sigma - sigma_min) * sigma_data / sqrt(sigma^2 + sigma_data^2)` and
  `c_noise = log(sigma)/4` fed to the step encoder;
- teacher training: `EDMLoss` (`:89`) with Grad-TTS-style noise centered
  on the prior, `noise = (randn + mu) * sigma`, plus prior L2 and SSIM
  losses (`:353` compute_loss);
- teacher sampling: Karras `edm_sampler` (`:110`, Euler, S_churn=0);
- distillation: `CTLoss_D` (`:184`) — EMA target net, frozen pretrained
  teacher Heun step between adjacent Karras boundaries (`t_steps`, `:35`);
- one/few-step `CT_sampler` (`:243`).

All samplers/losses are pure functions over parameter trees so the EMA /
pretrained copies of the reference become explicit param arguments.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.modules.condition_encoder import (
    ConditionEncoder,
    ConditionEncoderConfig,
)
from amphion_tpu.modules.transformer import TransformerEncoder
from amphion_tpu.modules.wavenet_denoiser import (
    WaveNetDenoiser,
    WaveNetDenoiserConfig,
)
from amphion_tpu.ops.dsp import ssim


@dataclass(frozen=True)
class ComoSVCConfig:
    n_mel: int = 100
    condition: ConditionEncoderConfig = field(
        default_factory=lambda: ConditionEncoderConfig(output_dim=384))
    # conformer prior encoder (ref config/comosvc.json:114)
    hidden: int = 384  # == condition.output_dim (ref input_dim)
    n_heads: int = 2
    n_layers: int = 6
    filter_channels: int = 512
    dropout: float = 0.1
    # BiDilConv denoiser conditioned on the n_mel prior
    denoiser: WaveNetDenoiserConfig = field(
        default_factory=lambda: WaveNetDenoiserConfig(
            in_dim=100, cond_dim=100))
    # karras diffusion (ref config/comosvc.json:123-130)
    p_mean: float = -1.2
    p_std: float = 1.2
    sigma_data: float = 0.5
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    n_timesteps: int = 18  # consistency boundary count N


def karras_boundaries(c: ComoSVCConfig) -> np.ndarray:
    """Consistency t_steps table (ref `Consistency.__init__:35`):
    [0, sigma_min, ..., sigma_max], length N+1, ascending."""
    i = np.arange(c.n_timesteps, dtype=np.float64)
    t = (c.sigma_min ** (1 / c.rho)
         + i / (c.n_timesteps - 1)
         * (c.sigma_max ** (1 / c.rho) - c.sigma_min ** (1 / c.rho))) ** c.rho
    return np.concatenate([[0.0], t]).astype(np.float32)


class ComoSVC(nn.Module):
    cfg: ComoSVCConfig

    def setup(self):
        c = self.cfg
        self.condition_encoder = ConditionEncoder(
            c.condition, name="condition_encoder")
        self.encoder = TransformerEncoder(
            c.hidden, c.n_heads, c.n_layers, c.filter_channels,
            kernel_size=3, window_size=4, dropout=c.dropout, name="encoder")
        self.projection = nn.Dense(c.n_mel, name="projection")
        self.denoise_fn = WaveNetDenoiser(c.denoiser, name="denoise_fn")

    def prior(self, features: dict, mask=None):
        """Condition features → mel prior mu (ref Conformer.forward)."""
        x = self.condition_encoder(features)
        return self.projection(self.encoder(x, mask))

    def precond(self, x, sigma, mu):
        """EDM-preconditioned denoiser D(x, sigma) (ref EDMPrecond:52).
        x, mu (B, T, n_mel); sigma scalar or (B,)."""
        c = self.cfg
        sigma = jnp.broadcast_to(jnp.asarray(sigma, x.dtype), (x.shape[0],))
        s = sigma[:, None, None]
        sd2 = c.sigma_data**2
        c_skip = sd2 / (s**2 + sd2)
        c_out = (s - c.sigma_min) * c.sigma_data / jnp.sqrt(s**2 + sd2)
        c_in = 1.0 / jnp.sqrt(sd2 + s**2)
        c_noise = jnp.log(sigma) / 4.0
        f = self.denoise_fn(c_in * x, c_noise, mu)
        return c_skip * x + c_out * f

    def edm_loss(self, mel, features: dict, mask, rng):
        """Teacher Karras loss (ref EDMLoss:89): sigma ~ exp(N(P_mean,
        P_std)), Grad-TTS noise centered on the prior."""
        c = self.cfg
        mu = self.prior(features, mask)
        r_s, r_n = jax.random.split(rng)
        b = mel.shape[0]
        sigma = jnp.exp(
            jax.random.normal(r_s, (b,)) * c.p_std + c.p_mean)
        s = sigma[:, None, None]
        weight = (s**2 + c.sigma_data**2) / (s * c.sigma_data) ** 2
        noise = (jax.random.normal(r_n, mel.shape) + mu) * s
        d = self.precond(mel + noise, sigma, mu)
        w = mask[..., None]
        diff = jnp.sum(weight * (d - mel) ** 2 * w) / jnp.maximum(
            jnp.sum(w) * mel.shape[-1], 1.0)
        return diff, mu

    def compute_loss(self, mel, features: dict, mask, rng,
                     skip_diff: bool = False):
        """(ssim, prior, diff) losses (ref ComoSVC.compute_loss:353)."""
        diff, mu = self.edm_loss(mel, features, mask, rng)
        w = mask[..., None]
        n_mel = mel.shape[-1]
        # ref divides by sum(mask_repeated) * n_mel = valid * n_mel^2
        denom = jnp.maximum(jnp.sum(w) * n_mel * n_mel, 1.0)
        prior = jnp.sum(
            0.5 * ((mel - mu) ** 2 + math.log(2 * math.pi)) * w
        ) / denom
        # ref utils/ssim.py:73 — 1 - SSIM on +6-biased mel images
        s = 1.0 - jnp.mean(ssim(mu + 6.0, mel + 6.0))
        if skip_diff:
            diff = jnp.zeros_like(diff)
        return {"ssim": s, "prior": prior, "diff": diff}


# -- functional samplers / distillation --------------------------------------


def _precond_apply(model: ComoSVC, params):
    def fn(x, sigma, mu):
        return model.apply({"params": params}, x, sigma, mu,
                           method=ComoSVC.precond)
    return fn


def edm_sampler(model: ComoSVC, params, features: dict, shape, rng,
                num_steps: int = 40):
    """Teacher Karras sampler (ref edm_sampler:110 — Euler, S_churn=0;
    initial x = (randn + mu) * t0, ref forward:492)."""
    c = model.cfg
    mu = model.apply({"params": params}, features, method=ComoSVC.prior)
    n = num_steps + 1
    i = np.arange(n, dtype=np.float64)
    t = (c.sigma_max ** (1 / c.rho)
         + i / (n - 1) * (c.sigma_min ** (1 / c.rho)
                          - c.sigma_max ** (1 / c.rho))) ** c.rho
    t_steps = jnp.asarray(np.concatenate([t, [0.0]]), jnp.float32)
    d_fn = _precond_apply(model, params)
    x = (jax.random.normal(rng, shape) + mu) * t_steps[0]

    def body(x, idx):
        t_cur = t_steps[idx]
        t_next = t_steps[idx + 1]
        den = d_fn(x, t_cur, mu)
        d_cur = (x - den) / t_cur
        return x + (t_next - t_cur) * d_cur, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def ct_loss(model: ComoSVC, params, params_ema, params_pretrained,
            mel, features: dict, mask, rng):
    """Consistency distillation loss (ref CTLoss_D:184): student at
    t_{n+1}, EMA target at t_n after a Heun teacher step. The EMA update
    itself is trainer-side (`optax.incremental_update`, mu=0.95)."""
    c = model.cfg
    boundaries = jnp.asarray(karras_boundaries(c))
    mu = model.apply({"params": params}, features, method=ComoSVC.prior)
    r_n, r_z = jax.random.split(rng)
    b = mel.shape[0]
    n = jax.random.randint(r_n, (b,), 1, c.n_timesteps)
    z = jax.random.normal(r_z, mel.shape) + mu
    tn1 = boundaries[n + 1]
    tn = boundaries[n]
    x_hat = mel + tn1[:, None, None] * z

    f_theta = model.apply({"params": params}, x_hat, tn1, mu,
                          method=ComoSVC.precond)

    pre = _precond_apply(model, params_pretrained)
    den = pre(x_hat, tn1, mu)
    d_cur = (x_hat - den) / tn1[:, None, None]
    y_tn = x_hat + (tn - tn1)[:, None, None] * d_cur
    den2 = pre(y_tn, tn, mu)
    d_prime = (y_tn - den2) / tn[:, None, None]
    y_tn = x_hat + (tn - tn1)[:, None, None] * (0.5 * d_cur + 0.5 * d_prime)
    f_ema = model.apply({"params": params_ema}, y_tn, tn, mu,
                        method=ComoSVC.precond)
    f_ema = jax.lax.stop_gradient(f_ema)

    w = mask[..., None]
    return jnp.sum((f_theta - f_ema) ** 2 * w) / jnp.maximum(
        jnp.sum(w) * mel.shape[-1], 1.0)


def ct_sampler(model: ComoSVC, params, features: dict, shape, rng,
               t_steps: int = 1):
    """One/few-step consistency sampler (ref CT_sampler:243)."""
    c = model.cfg
    mu = model.apply({"params": params}, features, method=ComoSVC.prior)
    d_fn = _precond_apply(model, params)
    if t_steps == 1:
        sig = [c.sigma_max]
    else:
        n = t_steps + 1
        i = np.arange(n, dtype=np.float64)
        sig = ((c.sigma_min ** (1 / c.rho)
                + i / (n - 1) * (c.sigma_max ** (1 / c.rho)
                                 - c.sigma_min ** (1 / c.rho))) ** c.rho)[::-1]
    r0, rng = jax.random.split(rng)
    # ref forward:506 — initial latents = (randn + mu) * sigma_max
    x = (jax.random.normal(r0, shape) + mu) * sig[0]
    x = d_fn(x, jnp.asarray(sig[0], jnp.float32), mu)
    for t in list(sig[1:-1]):
        rng, rz = jax.random.split(rng)
        z = jax.random.normal(rz, shape) + mu
        x_tn = x + math.sqrt(max(t**2 - c.sigma_min**2, 0.0)) * z
        x = d_fn(x_tn, jnp.asarray(t, jnp.float32), mu)
    return x


@functools.lru_cache(maxsize=16)
def _comosvc_sample_jitted(model, shape, num_steps, teacher):
    def core(params, features, rng):
        if teacher:
            return edm_sampler(model, params, features, shape, rng, num_steps)
        return ct_sampler(model, params, features, shape, rng, num_steps)

    return jax.jit(core)


def comosvc_sample(model: ComoSVC, params, features: dict, shape, rng,
                   num_steps: int = 1, teacher: bool = False):
    """Inference entry: teacher Karras sampling or distilled CT steps.
    Memoized self-jitting — the eager CT loop otherwise dispatches each
    denoiser call op-by-op through the TPU tunnel."""
    return _comosvc_sample_jitted(model, tuple(shape), num_steps, teacher)(
        params, features, rng)
