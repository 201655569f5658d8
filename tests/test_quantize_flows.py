import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.modules.quantize import (
    FactorizedVectorQuantize,
    LookupFreeQuantize,
    ResidualVQ,
    VectorQuantize,
)
from amphion_tpu.modules.flows import (
    ConvFlow,
    ElementwiseAffine,
    ResidualCouplingBlock,
    WN,
    log_flow,
    rational_quadratic_spline,
)
from amphion_tpu.modules.duration import (
    DurationPredictor,
    StochasticDurationPredictor,
    length_regulate,
)
from amphion_tpu.ops.mas import maximum_path


def test_vq_basic(rng):
    vq = VectorQuantize(codebook_size=16, codebook_dim=8)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    params = vq.init(jax.random.key(0), x)["params"]
    out, idx, losses = vq.apply({"params": params}, x)
    assert out.shape == x.shape and idx.shape == (2, 5)
    assert idx.max() < 16
    dec = vq.apply({"params": params}, idx, method=VectorQuantize.decode)
    np.testing.assert_allclose(
        np.asarray(dec), np.asarray(out), atol=1e-5
    )  # straight-through value == decode
    # gradient flows through encoder input
    g = jax.grad(lambda p, x: vq.apply({"params": p}, x)[0].sum(), argnums=1)(params, x)
    assert np.abs(np.asarray(g)).sum() > 0


def test_fvq_encode_decode(rng):
    fvq = FactorizedVectorQuantize(codebook_size=32, codebook_dim=4, input_dim=16)
    x = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
    params = fvq.init(jax.random.key(0), x)["params"]
    out, idx, _ = fvq.apply({"params": params}, x)
    idx2 = fvq.apply({"params": params}, x, method=FactorizedVectorQuantize.encode)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
    dec = fvq.apply({"params": params}, idx, method=FactorizedVectorQuantize.decode)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(out), atol=1e-5)


def test_rvq_reconstruction_improves(rng):
    rvq = ResidualVQ(num_quantizers=4, codebook_size=64, codebook_dim=4, input_dim=8)
    x = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    params = rvq.init(jax.random.key(0), x)["params"]
    out, idx, losses = rvq.apply({"params": params}, x)
    assert idx.shape == (4, 2, 10)
    dec = rvq.apply({"params": params}, idx, method=ResidualVQ.decode)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(out), atol=1e-5)


def test_lfq(rng):
    lfq = LookupFreeQuantize(codebook_dim=8, input_dim=16)
    x = jnp.asarray(rng.standard_normal((2, 5, 16)).astype(np.float32))
    params = lfq.init(jax.random.key(0), x)["params"]
    out, idx, losses = lfq.apply({"params": params}, x)
    assert out.shape == x.shape
    assert int(idx.max()) < 256 and int(idx.min()) >= 0


def test_wn_shapes(rng):
    wn = WN(hidden_channels=16, num_layers=3, gin_channels=8)
    x = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
    g = jnp.ones((2, 1, 8))
    params = wn.init(jax.random.key(0), x, None, g)["params"]
    y = wn.apply({"params": params}, x, None, g)
    assert y.shape == x.shape


def test_coupling_block_invertible(rng):
    flow = ResidualCouplingBlock(channels=8, hidden_channels=16, n_flows=2)
    x = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    mask = jnp.ones((2, 10))
    params = flow.init(jax.random.key(0), x, mask)["params"]
    z, logdet = flow.apply({"params": params}, x, mask)
    back = flow.apply({"params": params}, z, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)
    assert logdet.shape == (2,)


def test_spline_invertible(rng):
    k = 8
    shape = (2, 10)
    x = jnp.asarray(rng.uniform(-4, 4, shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(shape + (k,)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal(shape + (k,)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal(shape + (k - 1,)).astype(np.float32))
    y, ld = rational_quadratic_spline(x, w, h, d)
    x2, ld2 = rational_quadratic_spline(y, w, h, d, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-3)


def test_convflow_invertible(rng):
    flow = ConvFlow(in_channels=4, hidden_channels=16)
    x = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))
    mask = jnp.ones((2, 6))
    params = flow.init(jax.random.key(0), x, mask)["params"]
    z, _ = flow.apply({"params": params}, x, mask)
    back = flow.apply({"params": params}, z, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-3)


def test_log_flow():
    x = jnp.asarray([[[1.0], [2.0]]])
    y, ld = log_flow(x)
    back = log_flow(y, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def _naive_mas(value, t_text, t_mel):
    v = np.full((t_text, t_mel), -1e9)
    v[0, 0] = value[0, 0]
    for t in range(1, t_mel):
        for j in range(t_text):
            best = v[j, t - 1]
            if j > 0:
                best = max(best, v[j - 1, t - 1])
            v[j, t] = value[j, t] + best
    path = np.zeros((t_text, t_mel))
    j = t_text - 1
    for t in range(t_mel - 1, -1, -1):
        path[j, t] = 1
        if t > 0 and (j > 0 and v[j - 1, t - 1] > v[j, t - 1]):
            j -= 1
    return path


def test_mas_matches_naive(rng):
    t_text, t_mel = 5, 12
    value = rng.standard_normal((2, t_text, t_mel)).astype(np.float32)
    mask = np.ones((2, t_text, t_mel), np.float32)
    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    for b in range(2):
        expect = _naive_mas(value[b], t_text, t_mel)
        np.testing.assert_array_equal(path[b], expect)


def test_mas_padded(rng):
    value = rng.standard_normal((1, 6, 15)).astype(np.float32)
    mask = np.zeros((1, 6, 15), np.float32)
    mask[0, :4, :10] = 1  # 4 text tokens, 10 mel frames
    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    assert path[0, 4:, :].sum() == 0 and path[0, :, 10:].sum() == 0
    assert path[0].sum() == 10  # one text index per valid mel frame
    expect = _naive_mas(value[0, :4, :10], 4, 10)
    np.testing.assert_array_equal(path[0, :4, :10], expect)
    # monotonicity
    j = path[0, :4, :10].argmax(axis=0)
    assert (np.diff(j) >= 0).all() and j[0] == 0 and j[-1] == 3


def test_length_regulate_matches_naive():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    dur = jnp.asarray([[2, 0, 3, 1]])
    out, mask = length_regulate(x, dur, max_len=8)
    naive = np.concatenate(
        [np.repeat(np.asarray(x)[0, i : i + 1], int(dur[0, i]), axis=0) for i in range(4)]
    )
    assert mask[0].sum() == 6
    np.testing.assert_allclose(np.asarray(out)[0, :6], naive, atol=1e-6)
    assert np.asarray(out)[0, 6:].sum() == 0


def test_duration_predictor(rng):
    dp = DurationPredictor(hidden_channels=16)
    x = jnp.asarray(rng.standard_normal((2, 7, 8)).astype(np.float32))
    params = dp.init(jax.random.key(0), x)["params"]
    out = dp.apply({"params": params}, x)
    assert out.shape == (2, 7)


def test_stochastic_duration_predictor(rng):
    sdp = StochasticDurationPredictor(hidden_channels=16, n_flows=2)
    x = jnp.asarray(rng.standard_normal((1, 5, 8)).astype(np.float32))
    mask = jnp.ones((1, 5))
    w = jnp.asarray(rng.integers(1, 5, (1, 5)).astype(np.float32))
    params = sdp.init(
        jax.random.key(0), x, mask, w=w, rng=jax.random.key(1)
    )["params"]
    nll = sdp.apply({"params": params}, x, mask, w=w, rng=jax.random.key(2))
    assert nll.shape == (1,) and np.isfinite(float(nll[0]))
    logw = sdp.apply(
        {"params": params}, x, mask, reverse=True, rng=jax.random.key(3)
    )
    assert logw.shape == (1, 5)
    assert np.isfinite(np.asarray(logw)).all()
