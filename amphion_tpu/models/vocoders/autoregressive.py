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
import numpy as np


def mu_law_encode(x: jax.Array, mu: int = 255) -> jax.Array:
    """[-1,1] float → [0, mu] int."""
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    return ((y + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)


def mu_law_decode(ids: jax.Array, mu: int = 255) -> jax.Array:
    y = ids.astype(jnp.float32) / mu * 2.0 - 1.0
    return jnp.sign(y) * ((1.0 + mu) ** jnp.abs(y) - 1.0) / mu


@dataclass(frozen=True)
class WaveNetConfig:
    """Reference `wavenet/wavenet.py:38` cfg.VOCODER fields (r9y9-style
    WaveNet with local conditioning). Weight-normed reference convs are
    materialized to plain convs by the converter."""

    n_mel: int = 80  # INPUT_DIM (cin_channels)
    upsample_scales: tuple[int, ...] = (4, 4, 4, 4)  # UPSAMPLE_SCALES
    mel_frame_pad: int = 2  # MEL_FRAME_PAD (cin_pad)
    out_channels: int = 256  # OUT_CHANNELS (classes, or 3*num_mixtures)
    layers: int = 20  # LAYERS
    stacks: int = 2  # STACKS (dilation cycles: d = 2**(i % (L//stacks)))
    residual_channels: int = 64
    gate_channels: int = 128
    skip_out_channels: int = 64
    kernel_size: int = 3
    dropout: float = 0.05
    scalar_input: bool = False  # SCALAR_INPUT: floats in + MoL head

    @property
    def hop_size(self) -> int:
        h = 1
        for s in self.upsample_scales:
            h *= s
        return h


class WaveNetUpsample(nn.Module):
    """ConvInUpsampleNetwork (ref `wavenet/upsample.py:80`): wide-context
    conv_in over mel, then per-scale nearest stretch + averaging-init
    smoothing conv, indent-trimmed by ``cin_pad * hop``."""

    cfg: WaveNetConfig

    @nn.compact
    def __call__(self, mel):
        c = self.cfg
        pad = c.mel_frame_pad
        m = nn.Conv(c.n_mel, (2 * pad + 1,), padding=((pad, pad),),
                    use_bias=False, name="conv_in")(mel)
        m = m.transpose(0, 2, 1)[..., None]  # (B, n_mel, N, 1)
        for j, scale in enumerate(c.upsample_scales):
            m = jnp.repeat(m, scale, axis=2)
            m = nn.Conv(
                1, (1, 2 * scale + 1), padding=((0, 0), (scale, scale)),
                use_bias=False,
                kernel_init=nn.initializers.constant(1.0 / (2 * scale + 1)),
                name=f"up_conv_{j}",
            )(m)
        indent = pad * c.hop_size
        if indent > 0:
            m = m[:, :, indent:-indent]
        return m[..., 0].transpose(0, 2, 1)  # (B, T, n_mel)


class WaveNetVocoder(nn.Module):
    """Causal dilated WaveNet with per-layer local conditioning
    (ref `wavenet.py:121-149` + `modules.py:37`): gated residual blocks
    ``(x + res)·√½`` with separate skip convs, skip sum scaled ``√(1/L)``,
    relu→1x1→relu→1x1 head; one-hot mu-law input (or scalar + MoL)."""

    cfg: WaveNetConfig

    @nn.compact
    def __call__(self, audio_in, mel, train: bool = False):
        """audio_in (B, T): mu-law ids (one-hot path) or raw samples in
        [-1, 1] (scalar_input); mel (B, N, n_mel) with
        T = (N - 2*mel_frame_pad) * hop → (B, T, out_channels)."""
        c = self.cfg
        cond = WaveNetUpsample(c, name="upsample")(mel)
        t = audio_in.shape[1]
        cond = cond[:, :t]
        if c.scalar_input:
            x = audio_in[..., None].astype(jnp.float32)
        else:
            x = jax.nn.one_hot(audio_in, c.out_channels)
        x = nn.Conv(c.residual_channels, (1,), name="first_conv")(x)
        half = c.gate_channels // 2
        skips = 0.0
        lps = c.layers // c.stacks
        for i in range(c.layers):
            d = 2 ** (i % lps)
            res = x
            h = nn.Dropout(c.dropout, deterministic=not train)(x)
            h = nn.Conv(c.gate_channels, (c.kernel_size,),
                        kernel_dilation=(d,),
                        padding=(((c.kernel_size - 1) * d, 0),),
                        name=f"dil_{i}")(h)
            cnd = nn.Conv(c.gate_channels, (1,), use_bias=False,
                          name=f"cond_{i}")(cond)
            a = jnp.tanh(h[..., :half] + cnd[..., :half])
            b = jax.nn.sigmoid(h[..., half:] + cnd[..., half:])
            g = a * b
            skips = skips + nn.Conv(c.skip_out_channels, (1,),
                                    name=f"skip_{i}")(g)
            x = (nn.Conv(c.residual_channels, (1,), name=f"out_{i}")(g)
                 + res) * float(np.sqrt(0.5))
        h = skips * float(np.sqrt(1.0 / c.layers))
        h = jax.nn.relu(h)
        h = jax.nn.relu(nn.Conv(c.skip_out_channels, (1,), name="post1")(h))
        return nn.Conv(c.out_channels, (1,), name="post2")(h)

    @nn.compact
    def condition(self, mel):
        """Precompute the upsampled conditioning for incremental decode."""
        return WaveNetUpsample(self.cfg, name="upsample")(mel)

    def loss(self, audio, mel, train: bool = True):
        """audio (B, T+1) raw samples; model sees [0, T), predicts [1, T]."""
        c = self.cfg
        if c.scalar_input:
            from amphion_tpu.ops.distributions import (
                discretized_mix_logistic_loss,
            )

            y_hat = self(audio[:, :-1], mel, train)
            return discretized_mix_logistic_loss(y_hat, audio[:, 1:])
        ids = mu_law_encode(audio, c.out_channels - 1)
        logits = self(ids[:, :-1], mel, train)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]
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


def wavenet_generate(cfg: WaveNetConfig, variables, mel: jax.Array,
                     rng: jax.Array, temperature: float = 1.0) -> jax.Array:
    """AR waveform generation (ref `wavenet.py` incremental_forward): one
    `lax.scan` over samples with per-layer dilation ring buffers (a
    kernel-k dilated conv needs the layer input at t - j*d for
    j = 1..k-1; buffers init to zero = the causal left padding).
    Per-layer cond 1x1s are precomputed over the whole utterance. Returns
    (B, (N - 2*mel_frame_pad)*hop) float audio in [-1, 1].

    The step math reads the same param tree as the teacher-forced
    `__call__`; `tests/test_ar_vocoder_generate.py` locks the two paths
    together."""
    c = cfg
    model = WaveNetVocoder(c)
    cond_all = model.apply(variables, mel, method=WaveNetVocoder.condition)
    params = variables["params"]
    b, t_total, _ = cond_all.shape
    lps = c.layers // c.stacks
    dilations = [2 ** (i % lps) for i in range(c.layers)]
    k = c.kernel_size
    half = c.gate_channels // 2
    root2i = float(np.sqrt(0.5))

    def _c1(p, x):  # 1x1 conv params applied as a dense
        return x @ p["kernel"][0] + p.get("bias", 0.0)

    # per-layer conditioning, precomputed (B, T, gate)
    conds = [_c1(params[f"cond_{i}"], cond_all) for i in range(c.layers)]
    bufs0 = [jnp.zeros((b, (k - 1) * d, c.residual_channels))
             for d in dilations]

    def net_step(x, t, bufs):
        new_bufs = []
        skips = 0.0
        for i, d in enumerate(dilations):
            res = x
            kp = params[f"dil_{i}"]
            # taps: buffer[j*d] holds the input at t - (k-1-j)*d
            h = x @ kp["kernel"][k - 1] + kp["bias"]
            for j in range(k - 1):
                h = h + bufs[i][:, j * d] @ kp["kernel"][j]
            h = h + conds[i][:, t]
            g = jnp.tanh(h[..., :half]) * jax.nn.sigmoid(h[..., half:])
            skips = skips + _c1(params[f"skip_{i}"], g)
            x = (_c1(params[f"out_{i}"], g) + res) * root2i
            new_bufs.append(
                jnp.concatenate([bufs[i][:, 1:], res[:, None]], axis=1))
        h = jax.nn.relu(skips * float(np.sqrt(1.0 / c.layers)))
        h = jax.nn.relu(_c1(params["post1"], h))
        return _c1(params["post2"], h), new_bufs

    mol = c.scalar_input

    def body(carry, t):
        prev, bufs, r = carry
        if mol:
            x = _c1(params["first_conv"], prev[..., None])
        else:
            x = (jnp.take(params["first_conv"]["kernel"][0], prev, axis=0)
                 + params["first_conv"]["bias"])
        out, bufs = net_step(x, t, bufs)
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
            sample = mu_law_decode(nxt, c.out_channels - 1)
        return (nxt, bufs, r), sample

    if mol:
        init_prev = jnp.zeros((b,), jnp.float32)
    else:
        init_prev = jnp.full((b,), c.out_channels // 2, jnp.int32)

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
