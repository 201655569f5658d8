import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.modules.transformer import (
    FFTBlock,
    MultiHeadAttention,
    TransformerEncoder,
    _absolute_to_relative,
    _relative_to_absolute,
    sinusoidal_positions,
)
from amphion_tpu.modules.llama import (
    LlamaConfig,
    LlamaDecoder,
    LlamaEncoder,
)
from amphion_tpu.ops.sampling import sample_logits, top_k_filter, top_p_filter


def test_sinusoidal_positions():
    tab = sinusoidal_positions(10, 8)
    assert tab.shape == (10, 8)
    assert np.allclose(tab[0], [0, 1] * 4)


def test_relative_absolute_roundtrip():
    rng = np.random.default_rng(0)
    t, w = 6, 2
    rel = jnp.asarray(rng.standard_normal((1, 1, t, 2 * w + 1)).astype(np.float32))
    absm = _relative_to_absolute(rel, t)
    # check entries: abs[q, j] == rel[q, j-q+w] within window
    a = np.asarray(absm)[0, 0]
    r = np.asarray(rel)[0, 0]
    for q in range(t):
        for j in range(t):
            k = j - q + w
            expect = r[q, k] if 0 <= k <= 2 * w else 0.0
            assert abs(a[q, j] - expect) < 1e-6
    back = _absolute_to_relative(absm, w)
    b = np.asarray(back)[0, 0]
    for q in range(t):
        for k in range(2 * w + 1):
            j = q + k - w
            expect = a[q, j] if 0 <= j < t else 0.0
            assert abs(b[q, k] - expect) < 1e-6


def test_transformer_encoder_mask():
    enc = TransformerEncoder(channels=32, num_heads=4, num_layers=2, ffn_hidden=64)
    x = jnp.ones((2, 10, 32))
    mask = jnp.asarray([[1] * 10, [1] * 6 + [0] * 4], jnp.float32)
    params = enc.init(jax.random.key(0), x, mask)["params"]
    y = enc.apply({"params": params}, x, mask)
    assert y.shape == x.shape
    assert np.allclose(np.asarray(y)[1, 6:], 0.0)


def test_fft_block():
    blk = FFTBlock(channels=32, num_heads=2, ffn_hidden=64)
    x = jnp.ones((2, 8, 32))
    params = blk.init(jax.random.key(0), x)["params"]
    assert blk.apply({"params": params}, x).shape == x.shape


def test_llama_decoder_cache_matches_full():
    cfg = LlamaConfig(hidden_size=32, num_layers=2, num_heads=4, max_position=32)
    dec = LlamaDecoder(cfg)
    x = jax.random.normal(jax.random.key(1), (2, 7, 32))
    params = dec.init(jax.random.key(0), x)["params"]
    full = dec.apply({"params": params}, x)

    caches = dec.init_cache(2, 16)
    # prefill 4 tokens, then decode 3 one at a time
    out_p, caches = dec.apply(
        {"params": params}, x[:, :4], caches=caches, cache_index=0
    )
    outs = [out_p]
    for i in range(4, 7):
        o, caches = dec.apply(
            {"params": params}, x[:, i : i + 1], caches=caches, cache_index=i
        )
        outs.append(o)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=2e-5)


def test_llama_encoder_adaptive():
    cfg = LlamaConfig(hidden_size=32, num_layers=2, num_heads=4, adaptive=True)
    enc = LlamaEncoder(cfg)
    x = jnp.ones((2, 6, 32))
    cond = jnp.ones((2, 32))
    params = enc.init(jax.random.key(0), x, cond)["params"]
    y = enc.apply({"params": params}, x, cond)
    assert y.shape == x.shape


def test_top_k_filter():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.0]])
    out = np.asarray(top_k_filter(logits, 2))
    assert np.isneginf(out[0, 0]) and np.isneginf(out[0, 3])
    assert out[0, 1] == 3.0 and out[0, 2] == 2.0


def test_top_p_filter_keeps_top1():
    logits = jnp.asarray([[10.0, 0.0, -1.0]])
    out = np.asarray(top_p_filter(logits, 0.1))
    assert out[0, 0] == 10.0
    assert np.isneginf(out[0, 1:]).all()


def test_sample_logits_greedy_and_random():
    logits = jnp.asarray([[0.0, 5.0, 1.0]])
    assert int(sample_logits(jax.random.key(0), logits, temperature=0.0)[0]) == 1
    draws = {
        int(sample_logits(jax.random.key(i), logits, temperature=1.0, top_k=2)[0])
        for i in range(50)
    }
    assert draws <= {1, 2}
