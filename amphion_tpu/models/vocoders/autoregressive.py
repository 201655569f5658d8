"""Autoregressive vocoders: WaveNet (mu-law categorical) and WaveRNN.

Reference: `models/vocoders/autoregressive/wavenet/wavenet.py:38` and
`wavernn/wavernn.py`. On TPU these are primarily of historical/parity
interest — the sample-rate AR loop is latency-bound — so training is the
teacher-forced parallel path (fully MXU-friendly) and generation is a
`lax.scan` over samples.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


def mu_law_encode(x: jax.Array, mu: int = 255) -> jax.Array:
    """[-1,1] float → [0, mu] int."""
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    return ((y + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)


def mu_law_decode(ids: jax.Array, mu: int = 255) -> jax.Array:
    y = ids.astype(jnp.float32) / mu * 2.0 - 1.0
    return jnp.sign(y) * ((1.0 + mu) ** jnp.abs(y) - 1.0) / mu


@dataclass(frozen=True)
class WaveNetConfig:
    n_mel: int = 80
    hop_size: int = 256
    residual_channels: int = 64
    num_layers: int = 20
    dilation_cycle: int = 10
    classes: int = 256
    # "mulaw": 256-way categorical over mu-law ids; "mol": discretized
    # mixture of logistics over raw [-1, 1] samples (ref wavenet.py:42-44,
    # utils/distribution.py)
    out_mode: str = "mulaw"
    num_mixtures: int = 10


class WaveNetVocoder(nn.Module):
    """Causal dilated WaveNet, mel-conditioned; mu-law categorical or
    mixture-of-logistics output head."""

    cfg: WaveNetConfig

    @nn.compact
    def __call__(self, audio_in, mel):
        """Teacher-forced head params: audio_in (B, T) — mu-law ids
        ("mulaw") or raw samples in [-1, 1] ("mol") → (B, T, classes) or
        (B, T, 3*num_mixtures), predicting the NEXT sample."""
        c = self.cfg
        if c.out_mode == "mol":
            x = nn.Dense(c.residual_channels, name="embed_scalar")(
                audio_in[..., None].astype(jnp.float32))
        else:
            x = nn.Embed(c.classes, c.residual_channels, name="embed")(audio_in)
        cond = jnp.repeat(mel, c.hop_size, axis=1)[:, : x.shape[1]]
        cond = nn.Conv(2 * c.residual_channels, (1,), name="cond")(cond)
        skip_total = 0.0
        for i in range(c.num_layers):
            dilation = 2 ** (i % c.dilation_cycle)
            # causal conv: left-pad only
            y = nn.Conv(2 * c.residual_channels, (2,), kernel_dilation=(dilation,),
                        padding=[(dilation, 0)], name=f"dil_{i}")(x)
            y = y + cond
            a, b = jnp.split(y, 2, axis=-1)
            y = jnp.tanh(a) * jax.nn.sigmoid(b)
            y = nn.Conv(2 * c.residual_channels, (1,), name=f"out_{i}")(y)
            res, skip = jnp.split(y, 2, axis=-1)
            x = x + res
            skip_total = skip_total + skip
        h = jax.nn.relu(skip_total)
        h = jax.nn.relu(nn.Conv(c.residual_channels, (1,), name="post1")(h))
        out_dim = (3 * c.num_mixtures if c.out_mode == "mol" else c.classes)
        return nn.Conv(out_dim, (1,), name="post2")(h)

    def loss(self, audio, mel):
        c = self.cfg
        if c.out_mode == "mol":
            from amphion_tpu.ops.distributions import (
                discretized_mix_logistic_loss,
            )

            y_hat = self(audio[:, :-1], mel)
            return discretized_mix_logistic_loss(y_hat, audio[:, 1:],
                                                 num_classes=c.classes)
        ids = mu_law_encode(audio)
        logits = self(ids[:, :-1], mel)
        targets = ids[:, 1:]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return -jnp.mean(ll)


@dataclass(frozen=True)
class WaveRNNConfig:
    n_mel: int = 80
    hop_size: int = 256
    rnn_dim: int = 512
    fc_dim: int = 512
    classes: int = 256


class WaveRNNVocoder(nn.Module):
    """Single-GRU WaveRNN over mu-law classes (ref `wavernn/wavernn.py`)."""

    cfg: WaveRNNConfig

    @nn.compact
    def __call__(self, audio_ids, mel):
        c = self.cfg
        cond = jnp.repeat(mel, c.hop_size, axis=1)[:, : audio_ids.shape[1]]
        x = nn.Embed(c.classes, 64, name="embed")(audio_ids)
        inp = jnp.concatenate([x, cond], axis=-1)
        gru = nn.RNN(nn.GRUCell(c.rnn_dim), name="gru")
        h = gru(inp)
        h = jax.nn.relu(nn.Dense(c.fc_dim, name="fc1")(h))
        return nn.Dense(c.classes, name="fc2")(h)

    def loss(self, audio, mel):
        ids = mu_law_encode(audio)
        logits = self(ids[:, :-1], mel)
        targets = ids[:, 1:]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return -jnp.mean(ll)


# ---------------------------------------------------------------------------
# Sample-by-sample generation (lax.scan programs)
# ---------------------------------------------------------------------------


def _dense(p, x):
    return x @ p["kernel"] + p.get("bias", 0.0)


def wavenet_generate(cfg: WaveNetConfig, params, mel: jax.Array,
                     rng: jax.Array, temperature: float = 1.0) -> jax.Array:
    """AR waveform generation (ref `wavenet.py` incremental forward): one
    `lax.scan` over samples with per-layer dilation ring buffers (the
    kernel-2 dilated conv needs only the layer input from `dilation` steps
    back; buffers init to zero = the causal left padding). Returns
    (B, frames*hop) float audio in [-1, 1].

    The step math reads the same param tree as the teacher-forced
    `__call__`; `tests/test_ar_vocoder_generate.py` locks the two paths
    together."""
    c = cfg
    b, frames, _ = mel.shape
    t_total = frames * c.hop_size
    cond_all = jnp.repeat(mel, c.hop_size, axis=1)  # (B, T, n_mel)
    cond_all = _dense({"kernel": params["cond"]["kernel"][0],
                       "bias": params["cond"]["bias"]}, cond_all)
    dilations = [2 ** (i % c.dilation_cycle) for i in range(c.num_layers)]
    bufs0 = [jnp.zeros((b, d, c.residual_channels)) for d in dilations]

    def net_step(x, cond_t, bufs):
        new_bufs = []
        skip_total = 0.0
        for i, d in enumerate(dilations):
            kp = params[f"dil_{i}"]
            y = (bufs[i][:, 0] @ kp["kernel"][0] + x @ kp["kernel"][1]
                 + kp["bias"] + cond_t)
            a_, b_ = jnp.split(y, 2, axis=-1)
            y = jnp.tanh(a_) * jax.nn.sigmoid(b_)
            y = _dense({"kernel": params[f"out_{i}"]["kernel"][0],
                        "bias": params[f"out_{i}"]["bias"]}, y)
            res, skip = jnp.split(y, 2, axis=-1)
            new_bufs.append(jnp.concatenate([bufs[i][:, 1:], x[:, None]],
                                            axis=1))
            x = x + res
            skip_total = skip_total + skip
        h = jax.nn.relu(skip_total)
        h = jax.nn.relu(_dense({"kernel": params["post1"]["kernel"][0],
                                "bias": params["post1"]["bias"]}, h))
        out = _dense({"kernel": params["post2"]["kernel"][0],
                      "bias": params["post2"]["bias"]}, h)
        return out, new_bufs

    mol = c.out_mode == "mol"

    def body(carry, t):
        prev, bufs, r = carry
        if mol:
            x = _dense(params["embed_scalar"], prev[..., None])
        else:
            x = jnp.take(params["embed"]["embedding"], prev, axis=0)
        out, bufs = net_step(x, cond_all[:, t], bufs)
        r, sub = jax.random.split(r)
        if mol:
            from amphion_tpu.ops.distributions import (
                sample_from_discretized_mix_logistic,
            )

            nxt = sample_from_discretized_mix_logistic(
                sub, out[:, None])[:, 0]
            sample = nxt
        else:
            nxt = jax.random.categorical(sub, out / temperature, axis=-1)
            sample = mu_law_decode(nxt)
        return (nxt, bufs, r), sample

    if mol:
        init_prev = jnp.zeros((b,), jnp.float32)
    else:
        init_prev = jnp.full((b,), c.classes // 2, jnp.int32)

    @jax.jit
    def run(rng):
        (_, _, _), samples = jax.lax.scan(
            body, (init_prev, bufs0, rng), jnp.arange(t_total))
        return jnp.moveaxis(samples, 0, 1)

    return run(rng)


def wavernn_generate(cfg: WaveRNNConfig, params, mel: jax.Array,
                     rng: jax.Array, temperature: float = 1.0) -> jax.Array:
    """AR WaveRNN generation: GRU-cell steps under `lax.scan`
    (ref `wavernn/wavernn.py` generate)."""
    import flax.linen as fnn

    c = cfg
    b, frames, _ = mel.shape
    t_total = frames * c.hop_size
    cond_all = jnp.repeat(mel, c.hop_size, axis=1)
    cell = fnn.GRUCell(c.rnn_dim)
    # the RNN wrapper shares scope with its cell: params live at GRUCell_0
    cell_params = params["GRUCell_0"]

    def body(carry, t):
        prev, h, r = carry
        x = jnp.take(params["embed"]["embedding"], prev, axis=0)
        inp = jnp.concatenate([x, cond_all[:, t]], axis=-1)
        h, y = cell.apply({"params": cell_params}, h, inp)
        y = jax.nn.relu(_dense(params["fc1"], y))
        logits = _dense(params["fc2"], y)
        r, sub = jax.random.split(r)
        nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        return (nxt, h, r), mu_law_decode(nxt)

    h0 = jnp.zeros((b, c.rnn_dim))
    init_prev = jnp.full((b,), c.classes // 2, jnp.int32)

    @jax.jit
    def run(rng):
        (_, _, _), samples = jax.lax.scan(
            body, (init_prev, h0, rng), jnp.arange(t_total))
        return jnp.moveaxis(samples, 0, 1)

    return run(rng)
