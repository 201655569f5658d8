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
    """Reference `wavernn/wavernn.py:98` cfg.VOCODER fields."""

    n_mel: int = 80  # INPUT_DIM
    upsample_factors: tuple[int, ...] = (4, 8, 8)  # UPSAMPLE_FACTORS
    rnn_dim: int = 512  # RNN_DIMS
    fc_dim: int = 512  # FC_DIMS
    compute_dims: int = 128  # COMPUTE_DIMS
    res_out_dims: int = 128  # RES_OUT_DIMS (aux = 4 splits of //4)
    res_blocks: int = 10  # RES_BLOCKS
    mel_pad: int = 2  # MEL_FRAME_PAD
    mode: str = "mu_law_quantize"  # | "mol" (ref "mu_law": 30-param MoL)
    bits: int = 8  # mu_law_quantize classes = 2**bits

    @property
    def hop_size(self) -> int:
        h = 1
        for s in self.upsample_factors:
            h *= s
        return h

    @property
    def n_classes(self) -> int:
        # ref wavernn.py:105-108 (the `elif` is always-true → 30 = MoL)
        return 2 ** self.bits if self.mode == "mu_law_quantize" else 30


class _WaveRNNResBlock(nn.Module):
    """1x1 conv + BN (x2) residual block (ref `wavernn.py:13-29`)."""

    dims: int

    @nn.compact
    def __call__(self, x, train: bool):
        r = x
        x = nn.Conv(self.dims, (1,), use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.dims, (1,), use_bias=False, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(x)
        return x + r


class MelResNet(nn.Module):
    """Valid-conv mel ResNet producing the aux features
    (ref `wavernn.py:32-52`); eats ``pad`` frames from each side."""

    compute_dims: int
    res_out_dims: int
    res_blocks: int
    pad: int

    @nn.compact
    def __call__(self, mel, train: bool):
        # mel (B, N, n_mel) NLC; VALID conv trims 2*pad frames
        x = nn.Conv(self.compute_dims, (2 * self.pad + 1,), padding="VALID",
                    use_bias=False, name="conv_in")(mel)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn")(x)
        x = jax.nn.relu(x)
        for i in range(self.res_blocks):
            x = _WaveRNNResBlock(self.compute_dims, name=f"block_{i}")(
                x, train)
        return nn.Conv(self.res_out_dims, (1,), name="conv_out")(x)


class WaveRNNUpsample(nn.Module):
    """Stretch+smooth mel upsampler (ref `UpsampleNetwork`,
    `wavernn.py:68-95`): per-scale nearest-neighbour repeat followed by a
    1×(2s+1) averaging-init conv shared across mel rows; the MelResNet aux
    stream is repeated by the total scale. Both are trimmed/aligned to
    ``(N - 2*pad) * hop`` samples."""

    cfg: WaveRNNConfig

    @nn.compact
    def __call__(self, mel, train: bool):
        c = self.cfg
        total = c.hop_size
        aux = MelResNet(c.compute_dims, c.res_out_dims, c.res_blocks,
                        c.mel_pad, name="resnet")(mel, train)
        aux = jnp.repeat(aux, total, axis=1)
        # image (B, n_mel, N, 1): smooth along time only
        m = mel.transpose(0, 2, 1)[..., None]
        for i, scale in enumerate(c.upsample_factors):
            m = jnp.repeat(m, scale, axis=2)
            m = nn.Conv(
                1, (1, 2 * scale + 1), padding=((0, 0), (scale, scale)),
                use_bias=False,
                kernel_init=nn.initializers.constant(1.0 / (2 * scale + 1)),
                name=f"up_conv_{i}",
            )(m)
        indent = c.mel_pad * total
        m = m[:, :, indent:-indent, 0].transpose(0, 2, 1)  # (B, T, n_mel)
        return m, aux


class WaveRNNVocoder(nn.Module):
    """Dual-GRU WaveRNN (ref `wavernn.py:98-178`): continuous sample
    input, residual GRUs, MelResNet aux features split four ways and fed
    to [input, rnn2, fc1, fc2]."""

    cfg: WaveRNNConfig

    @nn.compact
    def __call__(self, x, mel, train: bool = False):
        """x (B, T) float samples in [-1, 1]; mel (B, N, n_mel) with
        T = (N - 2*mel_pad) * hop → (B, T, n_classes) logits/MoL params."""
        c = self.cfg
        a = c.res_out_dims // 4
        mels_up, aux = WaveRNNUpsample(c, name="upsample")(mel, train)
        t = x.shape[1]
        mels_up, aux = mels_up[:, :t], aux[:, :t]
        a1, a2, a3, a4 = (aux[..., :a], aux[..., a:2 * a],
                          aux[..., 2 * a:3 * a], aux[..., 3 * a:4 * a])
        h = nn.Dense(c.rnn_dim, name="I")(
            jnp.concatenate([x[..., None], mels_up, a1], axis=-1))
        res = h
        h = nn.RNN(nn.GRUCell(c.rnn_dim, name="rnn1"))(h)
        h = h + res
        res = h
        h = nn.RNN(nn.GRUCell(c.rnn_dim, name="rnn2"))(
            jnp.concatenate([h, a2], axis=-1))
        h = h + res
        h = jax.nn.relu(nn.Dense(c.fc_dim, name="fc1")(
            jnp.concatenate([h, a3], axis=-1)))
        h = jax.nn.relu(nn.Dense(c.fc_dim, name="fc2")(
            jnp.concatenate([h, a4], axis=-1)))
        return nn.Dense(c.n_classes, name="fc3")(h)

    @nn.compact
    def condition(self, mel):
        """Precompute (mels_up, aux) for the sample-by-sample decoder."""
        return WaveRNNUpsample(self.cfg, name="upsample")(mel, False)

    def loss(self, audio, mel, train: bool = True):
        """audio (B, T+1) raw samples (T = usable upsampled length); the
        model sees samples [0, T) and predicts [1, T]."""
        c = self.cfg
        if c.mode == "mol":
            from amphion_tpu.ops.distributions import (
                discretized_mix_logistic_loss,
            )

            y_hat = self(audio[:, :-1], mel, train)
            return discretized_mix_logistic_loss(y_hat, audio[:, 1:])
        ids = mu_law_encode(audio, 2 ** c.bits - 1)
        x_in = label_to_float(ids[:, :-1], c.bits)
        logits = self(x_in, mel, train)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]
        return -jnp.mean(ll)


def label_to_float(ids: jax.Array, bits: int) -> jax.Array:
    """Quantized label → [-1, 1] float input (fatchord WaveRNN convention)."""
    return 2.0 * ids.astype(jnp.float32) / (2 ** bits - 1.0) - 1.0


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


def wavernn_generate(cfg: WaveRNNConfig, variables, mel: jax.Array,
                     rng: jax.Array, temperature: float = 1.0) -> jax.Array:
    """AR WaveRNN generation: dual GRU-cell steps under `lax.scan` reading
    the same variables as the teacher-forced path (mels/aux precomputed by
    `WaveRNNVocoder.condition`). Greedy (temperature→0) decode is locked
    token-exact to the parallel forward by
    tests/test_ar_vocoder_generate.py."""
    import flax.linen as fnn

    c = cfg
    model = WaveRNNVocoder(c)
    mels_up, aux = model.apply(variables, mel,
                               method=WaveRNNVocoder.condition)
    b, t_total, _ = mels_up.shape
    a = c.res_out_dims // 4
    params = variables["params"]
    cell = fnn.GRUCell(c.rnn_dim)
    mol = c.mode != "mu_law_quantize"
    if mol:
        from amphion_tpu.ops.distributions import (
            sample_from_discretized_mix_logistic,
        )

    def body(carry, t):
        prev, h1, h2, r = carry
        inp = jnp.concatenate(
            [prev[:, None], mels_up[:, t], aux[:, t, :a]], axis=-1)
        x = _dense(params["I"], inp)
        res = x
        h1, x = cell.apply({"params": params["rnn1"]}, h1, x)
        x = x + res
        res = x
        h2, x = cell.apply(
            {"params": params["rnn2"]}, h2,
            jnp.concatenate([x, aux[:, t, a:2 * a]], axis=-1))
        x = x + res
        x = jax.nn.relu(_dense(
            params["fc1"],
            jnp.concatenate([x, aux[:, t, 2 * a:3 * a]], axis=-1)))
        x = jax.nn.relu(_dense(
            params["fc2"],
            jnp.concatenate([x, aux[:, t, 3 * a:4 * a]], axis=-1)))
        out = _dense(params["fc3"], x)
        r, sub = jax.random.split(r)
        if mol:
            nxt = sample_from_discretized_mix_logistic(sub, out[:, None, :])[:, 0]
            wav_t = nxt
        else:
            ids = jax.random.categorical(sub, out / temperature, axis=-1)
            nxt = label_to_float(ids, c.bits)
            wav_t = mu_law_decode(ids, 2 ** c.bits - 1)
        return (nxt, h1, h2, r), wav_t

    h0 = jnp.zeros((b, c.rnn_dim))
    x0 = jnp.zeros((b,))

    @jax.jit
    def run(rng):
        _, samples = jax.lax.scan(
            body, (x0, h0, h0, rng), jnp.arange(t_total))
        return jnp.moveaxis(samples, 0, 1)

    return run(rng)
