"""Ragged batched MaskGCT sampling: faithfulness + batch-invariance.

The serving-path contract (ragged_sampling.py): a batch of requests with
per-sample lengths must produce, for every request, exactly what a
single-request run with the same key produces — and the per-step math must
match the fixed-shape sampler when shapes fit exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.models.tts.maskgct.maskgct import (
    MaskGCTS2A,
    MaskGCTT2S,
    S2AConfig,
    T2SConfig,
)
from amphion_tpu.models.tts.maskgct import ragged_sampling as rs

T2S_TINY = T2SConfig(hidden=32, num_layers=2, num_heads=4, codebook_size=24,
                     phone_vocab=16, max_position=128)
S2A_TINY = S2AConfig(hidden=32, num_layers=2, num_heads=4, codebook_size=16,
                     num_quantizers=3, cond_codebook_size=24, max_position=128)


@pytest.fixture(scope="module")
def t2s_setup():
    rng = np.random.default_rng(0)
    model = MaskGCTT2S(T2S_TINY)
    x0 = jnp.asarray(rng.integers(0, 24, (2, 12)))
    params = model.init(
        jax.random.key(0), x0, jnp.ones((2, 12)),
        jnp.asarray(rng.integers(0, 16, (2, 5))), jnp.ones((2, 5)),
        jax.random.key(1), method=MaskGCTT2S.compute_loss,
    )["params"]
    return model, params


@pytest.fixture(scope="module")
def s2a_setup():
    rng = np.random.default_rng(1)
    model = MaskGCTS2A(S2A_TINY)
    tokens = jnp.asarray(rng.integers(0, 16, (2, 3, 10)))
    sem_ids = jnp.asarray(rng.integers(0, 24, (2, 10)))
    params = model.init(
        jax.random.key(0), tokens, jnp.ones((2, 10)), sem_ids,
        jax.random.key(1), method=MaskGCTS2A.compute_loss,
    )["params"]
    return model, params


# ---------------------------------------------------------------------------
# pack / unpack
# ---------------------------------------------------------------------------


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(2)
    prefix = jnp.asarray(rng.standard_normal((2, 5, 3)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((2, 7, 3)).astype(np.float32))
    lp = jnp.asarray([3, 5])
    full = rs.pack_prefix_target(prefix, target, lp)
    assert full.shape == (2, 12, 3)
    # sample 0: [prefix0[:3] | target0 | ...]
    np.testing.assert_array_equal(full[0, :3], prefix[0, :3])
    np.testing.assert_array_equal(full[0, 3:10], target[0])
    # sample 1: full prefix then target
    np.testing.assert_array_equal(full[1, :5], prefix[1])
    np.testing.assert_array_equal(full[1, 5:12], target[1])
    # unpack recovers the target slice
    back = rs.unpack_target(full, lp, 7)
    np.testing.assert_array_equal(back[0], target[0])
    np.testing.assert_array_equal(back[1], target[1])
    # int arrays (no trailing feature dim) work too
    ids = jnp.asarray(rng.integers(0, 9, (2, 7)))
    pid = jnp.asarray(rng.integers(0, 9, (2, 5)))
    fi = rs.pack_prefix_target(pid, ids, lp)
    np.testing.assert_array_equal(fi[0, 3:10], ids[0])


def test_masked_std_matches_global_when_full():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 6, 4)).astype(np.float32))
    full = rs._masked_std(x, jnp.ones((1, 6), bool))
    np.testing.assert_allclose(float(full[0, 0, 0]), float(jnp.std(x)),
                               rtol=1e-5)
    # masked version ignores padding rows
    xp = jnp.concatenate([x, 100.0 * jnp.ones((1, 2, 4))], axis=1)
    m = jnp.asarray([[True] * 6 + [False] * 2])
    np.testing.assert_allclose(float(rs._masked_std(xp, m)[0, 0, 0]),
                               float(jnp.std(x)), rtol=1e-5)


# ---------------------------------------------------------------------------
# T2S
# ---------------------------------------------------------------------------


def test_t2s_step_ragged_matches_fixed_exact_fit(t2s_setup):
    """B=1, shapes exactly fit → identical logits to the fixed-shape step."""
    model, params = t2s_setup
    rng = np.random.default_rng(4)
    lp, tl, lph = 4, 9, 5
    seq = jnp.asarray(rng.integers(0, 24, (1, tl)))
    mask = jnp.asarray(rng.integers(0, 2, (1, tl)).astype(bool))
    prompt = jnp.asarray(rng.integers(0, 24, (1, lp)))
    phones = jnp.asarray(rng.integers(0, 16, (1, lph)))
    t = jnp.full((1,), 0.6)

    fixed = model.apply(
        {"params": params}, seq, mask, t, prompt, phones, 1.5, 0.75,
        method=MaskGCTT2S.sample_step,
    )
    ragged = model.apply(
        {"params": params}, seq, mask, jnp.asarray([tl]), t, prompt,
        jnp.asarray([lp]), phones, jnp.asarray([lph]), 1.5, 0.75,
        method=rs._t2s_step_ragged,
    )
    np.testing.assert_allclose(np.asarray(ragged), np.asarray(fixed),
                               atol=1e-5, rtol=1e-5)


def test_t2s_step_ragged_pad_invariance(t2s_setup):
    """Padding prompt/phone/target buffers must not change valid logits."""
    model, params = t2s_setup
    rng = np.random.default_rng(5)
    lp, tl, lph = 4, 9, 5
    seq = jnp.asarray(rng.integers(0, 24, (1, tl)))
    mask = jnp.asarray(rng.integers(0, 2, (1, tl)).astype(bool))
    prompt = jnp.asarray(rng.integers(0, 24, (1, lp)))
    phones = jnp.asarray(rng.integers(0, 16, (1, lph)))
    t = jnp.full((1,), 0.4)

    args = dict(cfg_scale=2.0, rescale_cfg=0.75)
    exact = model.apply(
        {"params": params}, seq, mask, jnp.asarray([tl]), t, prompt,
        jnp.asarray([lp]), phones, jnp.asarray([lph]), **args,
        method=rs._t2s_step_ragged,
    )
    pad = lambda a, n: jnp.pad(a, ((0, 0), (0, n)))
    padded = model.apply(
        {"params": params}, pad(seq, 6), pad(mask, 6), jnp.asarray([tl]), t,
        pad(prompt, 3), jnp.asarray([lp]), pad(phones, 4), jnp.asarray([lph]),
        **args, method=rs._t2s_step_ragged,
    )
    np.testing.assert_allclose(np.asarray(padded[:, :tl]), np.asarray(exact),
                               atol=2e-4, rtol=1e-3)


def test_t2s_ragged_batched_equals_single(t2s_setup):
    """B=3 mixed-length batch == three B=1 runs with the same keys."""
    model, params = t2s_setup
    rng = np.random.default_rng(6)
    lp_max, lph_max, t_max = 6, 8, 14
    prompt = jnp.asarray(rng.integers(0, 24, (3, lp_max)))
    phones = jnp.asarray(rng.integers(0, 16, (3, lph_max)))
    prompt_len = jnp.asarray([3, 6, 4])
    phone_len = jnp.asarray([5, 8, 2])
    target_len = jnp.asarray([14, 7, 10])
    keys = jax.vmap(jax.random.key)(jnp.asarray([11, 22, 33], jnp.uint32))

    batched = rs.t2s_sample_ragged(
        model, params, prompt, prompt_len, phones, phone_len, target_len,
        keys, t_max, n_steps=5, compute_dtype="float32",
    )
    for i in range(3):
        single = rs.t2s_sample_ragged(
            model, params, prompt[i : i + 1], prompt_len[i : i + 1],
            phones[i : i + 1], phone_len[i : i + 1], target_len[i : i + 1],
            keys[i : i + 1], t_max, n_steps=5, compute_dtype="float32",
        )
        tl = int(target_len[i])
        np.testing.assert_array_equal(
            np.asarray(batched[i, :tl]), np.asarray(single[0, :tl]),
            err_msg=f"sample {i} differs between batched and single runs",
        )
    # padding region is zeroed
    assert (np.asarray(batched[1, 7:]) == 0).all()
    assert (np.asarray(batched) >= 0).all() and (np.asarray(batched) < 24).all()


# ---------------------------------------------------------------------------
# S2A
# ---------------------------------------------------------------------------


def test_s2a_step_ragged_matches_fixed_exact_fit(s2a_setup):
    model, params = s2a_setup
    rng = np.random.default_rng(7)
    lp, tl, q = 4, 8, 3
    tokens = jnp.asarray(rng.integers(0, 16, (1, q, tl)))
    mask = jnp.asarray(rng.integers(0, 2, (1, tl)).astype(bool))
    prompt_all = jnp.asarray(rng.integers(0, 16, (1, q, lp)))
    sem = jnp.asarray(rng.integers(0, 24, (1, lp + tl)))
    layer = jnp.asarray([1])
    t = jnp.full((1,), 0.5)

    fixed = model.apply(
        {"params": params}, tokens, mask, layer, t, sem, prompt_all, 1.2,
        method=MaskGCTS2A.sample_layer_step,
    )
    ragged = model.apply(
        {"params": params}, tokens, mask, jnp.asarray([tl]), layer, t, sem,
        prompt_all, jnp.asarray([lp]), 1.2,
        method=rs._s2a_step_ragged,
    )
    np.testing.assert_allclose(np.asarray(ragged), np.asarray(fixed),
                               atol=1e-5, rtol=1e-5)


def test_s2a_step_ragged_pad_invariance(s2a_setup):
    model, params = s2a_setup
    rng = np.random.default_rng(9)
    lp, tl, q = 4, 8, 3
    tokens = jnp.asarray(rng.integers(0, 16, (1, q, tl)))
    mask = jnp.asarray(rng.integers(0, 2, (1, tl)).astype(bool))
    prompt_all = jnp.asarray(rng.integers(0, 16, (1, q, lp)))
    sem_p = jnp.asarray(rng.integers(0, 24, (1, lp)))
    sem_t = jnp.asarray(rng.integers(0, 24, (1, tl)))
    layer = jnp.asarray([0])
    t = jnp.full((1,), 0.7)

    exact = model.apply(
        {"params": params}, tokens, mask, jnp.asarray([tl]), layer, t,
        rs.pack_prefix_target(sem_p, sem_t, jnp.asarray([lp])), prompt_all,
        jnp.asarray([lp]), 1.2, method=rs._s2a_step_ragged,
    )
    pad2 = lambda a, n: jnp.pad(a, ((0, 0), (0, n)))
    pad3 = lambda a, n: jnp.pad(a, ((0, 0), (0, 0), (0, n)))
    padded = model.apply(
        {"params": params}, pad3(tokens, 5), pad2(mask, 5), jnp.asarray([tl]),
        layer, t,
        rs.pack_prefix_target(pad2(sem_p, 2), pad2(sem_t, 5), jnp.asarray([lp])),
        pad3(prompt_all, 2), jnp.asarray([lp]), 1.2,
        method=rs._s2a_step_ragged,
    )
    np.testing.assert_allclose(np.asarray(padded[:, :tl]), np.asarray(exact),
                               atol=2e-4, rtol=1e-3)


def test_s2a_ragged_batched_equals_single(s2a_setup):
    model, params = s2a_setup
    rng = np.random.default_rng(8)
    lp_max, t_max, q = 5, 12, 3
    prompt_all = jnp.asarray(rng.integers(0, 16, (2, q, lp_max)))
    prompt_len = jnp.asarray([3, 5])
    target_len = jnp.asarray([12, 6])
    sem_prompt = jnp.asarray(rng.integers(0, 24, (2, lp_max)))
    sem_target = jnp.asarray(rng.integers(0, 24, (2, t_max)))
    sem_packed = rs.pack_prefix_target(sem_prompt, sem_target, prompt_len)
    keys = jax.vmap(jax.random.key)(jnp.asarray([7, 9], jnp.uint32))

    batched = rs.s2a_sample_ragged(
        model, params, sem_packed, prompt_all, prompt_len, target_len, keys,
        t_max, first_layer_steps=4, compute_dtype="float32",
    )
    assert batched.shape == (2, q, t_max)
    for i in range(2):
        single = rs.s2a_sample_ragged(
            model, params, sem_packed[i : i + 1], prompt_all[i : i + 1],
            prompt_len[i : i + 1], target_len[i : i + 1], keys[i : i + 1],
            t_max, first_layer_steps=4, compute_dtype="float32",
        )
        tl = int(target_len[i])
        np.testing.assert_array_equal(
            np.asarray(batched[i, :, :tl]), np.asarray(single[0, :, :tl]),
            err_msg=f"sample {i} differs between batched and single runs",
        )
    assert (np.asarray(batched[1, :, 6:]) == 0).all()
