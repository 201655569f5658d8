"""Ragged batched Vevo serving paths (AR decode + FM ODE).

Contracts (the serving-critical properties):
- a request served in a ragged batch produces the SAME result as served
  alone (batch-composition / padding invariance — per-request RNG keys,
  kv_valid masking, per-sample CFG std);
- the ragged program at exact shapes matches the fixed-shape
  `ar_transformer_generate` / `fmt_inference` programs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.models.vc.ar_transformer import (
    ARTransformer,
    ARTransformerConfig,
    ar_transformer_generate,
    ar_transformer_generate_ragged,
)
from amphion_tpu.models.vc.flow_matching_transformer import (
    FlowMatchingTransformer,
    FMTConfig,
    fmt_inference,
    fmt_inference_ragged,
)

AR_CFG = ARTransformerConfig(
    input_vocab=8, output_vocab=16, hidden=32, intermediate=64,
    num_layers=2, num_heads=2, max_position=256)
FM_CFG = FMTConfig(token_vocab=16, n_mel=8, hidden=32, num_layers=2,
                   num_heads=2, max_position=256)


@pytest.fixture(scope="module")
def ar_setup():
    model = ARTransformer(AR_CFG)
    toks = jnp.zeros((1, 6), jnp.int32)
    m = jnp.ones((1, 6), jnp.float32)
    params = model.init(jax.random.key(0), toks, m, toks, m,
                        method=ARTransformer.loss)["params"]
    return model, params


@pytest.fixture(scope="module")
def fm_setup():
    model = FlowMatchingTransformer(FM_CFG)
    tok = jnp.zeros((1, 10), jnp.int32)
    mel = jnp.zeros((1, 10, 8))
    pmask = jnp.concatenate([jnp.ones((1, 4)), jnp.zeros((1, 6))], axis=1)
    xmask = jnp.ones((1, 10), jnp.float32)
    params = model.init(jax.random.key(0), mel, tok, pmask, xmask,
                        jax.random.key(1),
                        method=FlowMatchingTransformer.loss)["params"]
    return model, params


def _gen_fixed(model, params, content, **kw):
    toks, n = ar_transformer_generate(
        model, params, content, jax.random.key(7), temperature=0.0,
        compute_dtype="float32", **kw)
    return np.asarray(toks), np.asarray(n)


def _gen_ragged(model, params, content, content_len, **kw):
    b = content.shape[0]
    keys = jax.vmap(jax.random.key)(jnp.arange(b, dtype=jnp.uint32))
    toks, n = ar_transformer_generate_ragged(
        model, params, content, content_len, keys, temperature=0.0,
        compute_dtype="float32", **kw)
    return np.asarray(toks), np.asarray(n)


def test_ar_ragged_matches_fixed_at_exact_shape(ar_setup):
    model, params = ar_setup
    content = jax.random.randint(jax.random.key(1), (1, 9), 0, 8)
    ft, fn = _gen_fixed(model, params, content, max_new=12)
    rt, rn = _gen_ragged(model, params, content,
                         jnp.array([9], jnp.int32), max_new=12)
    np.testing.assert_array_equal(ft, rt)
    np.testing.assert_array_equal(fn, rn)


def test_ar_ragged_prompt_output_matches_fixed(ar_setup):
    model, params = ar_setup
    content = jax.random.randint(jax.random.key(2), (1, 7), 0, 8)
    prompt_out = jax.random.randint(jax.random.key(3), (1, 5), 0, 16)
    ft, _ = _gen_fixed(model, params, content, max_new=10,
                       prompt_output_tokens=prompt_out)
    rt, _ = _gen_ragged(model, params, content, jnp.array([7], jnp.int32),
                        max_new=10, prompt_output_tokens=prompt_out,
                        prompt_output_len=jnp.array([5], jnp.int32))
    np.testing.assert_array_equal(ft, rt)


def test_ar_ragged_pad_and_batch_invariance(ar_setup):
    model, params = ar_setup
    c0 = jax.random.randint(jax.random.key(4), (6,), 0, 8)
    c1 = jax.random.randint(jax.random.key(5), (10,), 0, 8)
    pad = 12
    buf = np.zeros((2, pad), np.int32)
    buf[0, :6] = np.asarray(c0)
    buf[1, :10] = np.asarray(c1)
    lens = jnp.array([6, 10], jnp.int32)
    keys = jax.vmap(jax.random.key)(jnp.asarray([11, 22], jnp.uint32))
    bt, bn = ar_transformer_generate_ragged(
        model, params, jnp.asarray(buf), lens, keys, max_new=8,
        compute_dtype="float32")
    # each request alone, same per-request key, same padded buffer width
    for i, (c, ln, seed) in enumerate([(c0, 6, 11), (c1, 10, 22)]):
        solo = np.zeros((1, pad), np.int32)
        solo[0, :ln] = np.asarray(c)
        k = jax.vmap(jax.random.key)(jnp.asarray([seed], jnp.uint32))
        st, sn = ar_transformer_generate_ragged(
            model, params, jnp.asarray(solo), jnp.array([ln], jnp.int32),
            k, max_new=8, compute_dtype="float32")
        np.testing.assert_array_equal(np.asarray(bt)[i], np.asarray(st)[0])
        assert int(bn[i]) == int(sn[0])


def _ragged_fm(model, params, ptok, plen, ttok, tlen, noise, cfg=0.0):
    b = ptok.shape[0]
    pm = jax.random.normal(jax.random.key(9),
                           (b, ptok.shape[1], 8)) * 0.1
    keys = jax.vmap(jax.random.key)(jnp.arange(b, dtype=jnp.uint32))
    out = fmt_inference_ragged(
        model, params, ptok, plen, ttok, tlen, pm, keys, num_steps=4,
        cfg_scale=cfg, compute_dtype="float32", noise=noise)
    return np.asarray(out), np.asarray(pm)


@pytest.mark.parametrize("cfg", [0.0, 1.0])
def test_fm_ragged_matches_fixed_at_exact_shape(fm_setup, cfg):
    model, params = fm_setup
    lp, lt = 4, 7
    ptok = jax.random.randint(jax.random.key(1), (1, lp), 0, 16)
    ttok = jax.random.randint(jax.random.key(2), (1, lt), 0, 16)
    noise = jax.random.normal(jax.random.key(3), (1, lt, 8))
    rag, pm = _ragged_fm(model, params, ptok, jnp.array([lp]), ttok,
                         jnp.array([lt]), noise, cfg=cfg)
    fixed = fmt_inference(
        model, params, jnp.concatenate([ptok, ttok], axis=1),
        jnp.asarray(pm), jax.random.key(0), num_steps=4, cfg_scale=cfg,
        compute_dtype="float32", noise=noise)
    np.testing.assert_allclose(rag, np.asarray(fixed), atol=2e-4)


def test_fm_ragged_midpoint_matches_fixed(fm_setup):
    """solver="midpoint" (RK2) through the ragged serving path must equal
    the fixed-shape midpoint ODE at the exact shape (same x_0)."""
    model, params = fm_setup
    lp, lt = 4, 7
    ptok = jax.random.randint(jax.random.key(1), (1, lp), 0, 16)
    ttok = jax.random.randint(jax.random.key(2), (1, lt), 0, 16)
    noise = jax.random.normal(jax.random.key(3), (1, lt, 8))
    pm = jax.random.normal(jax.random.key(9), (1, lp, 8)) * 0.1
    keys = jax.vmap(jax.random.key)(jnp.asarray([0], jnp.uint32))
    rag = np.asarray(fmt_inference_ragged(
        model, params, ptok, jnp.array([lp]), ttok, jnp.array([lt]), pm,
        keys, num_steps=4, cfg_scale=1.0, compute_dtype="float32",
        noise=noise, solver="midpoint"))
    fixed = fmt_inference(
        model, params, jnp.concatenate([ptok, ttok], axis=1),
        jnp.asarray(pm), jax.random.key(0), num_steps=4, cfg_scale=1.0,
        compute_dtype="float32", noise=noise, solver="midpoint")
    np.testing.assert_allclose(rag, np.asarray(fixed), atol=2e-4)
    # and it is a genuinely different integrator than euler
    eul = fmt_inference(
        model, params, jnp.concatenate([ptok, ttok], axis=1),
        jnp.asarray(pm), jax.random.key(0), num_steps=4, cfg_scale=1.0,
        compute_dtype="float32", noise=noise, solver="euler")
    assert float(np.max(np.abs(np.asarray(eul) - np.asarray(fixed)))) > 1e-4


def test_fm_ragged_pad_and_batch_invariance(fm_setup):
    model, params = fm_setup
    lp_max, lt_max = 6, 9
    ptok = jax.random.randint(jax.random.key(4), (2, lp_max), 0, 16)
    ttok = jax.random.randint(jax.random.key(5), (2, lt_max), 0, 16)
    plen = jnp.array([4, 6], jnp.int32)
    tlen = jnp.array([9, 5], jnp.int32)
    pm = jax.random.normal(jax.random.key(9), (2, lp_max, 8)) * 0.1
    keys = jax.vmap(jax.random.key)(jnp.asarray([31, 32], jnp.uint32))
    batch = np.asarray(fmt_inference_ragged(
        model, params, ptok, plen, ttok, tlen, pm, keys, num_steps=4,
        cfg_scale=1.0, compute_dtype="float32"))
    for i in range(2):
        k = jax.vmap(jax.random.key)(
            jnp.asarray([31 + i], jnp.uint32))
        solo = np.asarray(fmt_inference_ragged(
            model, params, ptok[i:i + 1], plen[i:i + 1], ttok[i:i + 1],
            tlen[i:i + 1], pm[i:i + 1], k, num_steps=4, cfg_scale=1.0,
            compute_dtype="float32"))
        n = int(tlen[i])
        np.testing.assert_allclose(batch[i, :n], solo[0, :n], atol=2e-5)


def test_fmt_inference_int8_int4_close_to_bf16():
    """Weight-only int8/int4 FM decode (the Vevo RTF lever — the 32-step
    ODE is weight-HBM-bound like AR decode): same ODE trajectory within
    quantization tolerance, fixed/ragged paths both."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from amphion_tpu.models.vc.flow_matching_transformer import (
        FlowMatchingTransformer,
        FMTConfig,
        fmt_inference,
        fmt_inference_ragged,
    )

    cfg = FMTConfig(token_vocab=64, n_mel=8, hidden=32, num_layers=2,
                    num_heads=2, max_position=256)
    fm = FlowMatchingTransformer(cfg)
    r = jax.random.key(0)
    tok = jnp.zeros((1, 12), jnp.int32)
    mel = jnp.zeros((1, 12, 8))
    pmask = jnp.concatenate([jnp.ones((1, 4)), jnp.zeros((1, 8))], axis=1)
    params = fm.init(r, mel, tok, pmask, jnp.ones((1, 12)),
                     jax.random.key(1),
                     method=FlowMatchingTransformer.loss)["params"]
    pm = jnp.zeros((1, 4, 8))
    args = (fm, params, tok, pm, jax.random.key(2))
    out_bf = np.asarray(fmt_inference(*args, num_steps=4, cfg_scale=1.0,
                                      compute_dtype="bfloat16"), np.float32)
    for dtype, tol in [("int8", 0.15), ("int4", 1.0)]:
        out_q = np.asarray(fmt_inference(*args, num_steps=4, cfg_scale=1.0,
                                         compute_dtype=dtype), np.float32)
        assert out_q.shape == out_bf.shape
        dev = np.abs(out_q - out_bf).max()
        assert dev < tol, (dtype, dev)
        assert dev > 0  # actually quantized, not a silent bf16 fallthrough

    # ragged path compiles + runs under int8 with per-row lengths
    ptoks = jnp.zeros((2, 6), jnp.int32)
    plen = jnp.asarray([4, 6], jnp.int32)
    ttoks = jnp.zeros((2, 10), jnp.int32)
    tlen = jnp.asarray([8, 10], jnp.int32)
    pmel = jnp.zeros((2, 6, 8))
    keys = jax.vmap(jax.random.key)(jnp.asarray([3, 4], jnp.uint32))
    out = fmt_inference_ragged(fm, params, ptoks, plen, ttoks, tlen, pmel,
                               keys, num_steps=2, cfg_scale=1.0,
                               compute_dtype="int8")
    assert np.asarray(out).shape == (2, 10, 8)
    assert np.isfinite(np.asarray(out, np.float32)).all()
