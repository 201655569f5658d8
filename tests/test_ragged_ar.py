"""Ragged batched AR decode (VALL-E): left-pad exactness + batch invariance.

The serving contract (`ar_generate_ragged`): right-aligned packing is
exact under RoPE (scores depend only on relative distance), pad slots are
attention-masked, and per-request keys make a batched run bit-identical
to serving each request alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.models.tts.valle.valle import (
    VALLE,
    VALLEConfig,
    ar_generate,
    ar_generate_ragged,
    nar_generate_ragged,
    valle_generate_ragged,
)
from amphion_tpu.ops.ragged import pack_segments_right, right_pack_valid

TINY = VALLEConfig(
    num_phones=20, audio_vocab=32, num_quantizers=4,
    hidden=32, num_layers=2, num_heads=4, max_position=128,
)


@pytest.fixture(scope="module")
def valle_setup():
    rng = np.random.default_rng(0)
    model = VALLE(TINY)
    b, lp, lt = 2, 5, 12
    params = model.init(
        jax.random.key(0),
        jnp.asarray(rng.integers(1, 20, (b, lp))), jnp.ones((b, lp)),
        jnp.asarray(rng.integers(0, 32, (b, TINY.num_quantizers, lt))),
        jnp.ones((b, lt)), jax.random.key(1),
        method=VALLE.train_loss,
    )["params"]
    return model, params


def test_pack_segments_right_layout():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 6, 3)).astype(np.float32))
    la = jnp.asarray([2, 4])
    lc = jnp.asarray([6, 3])
    full = pack_segments_right([a, c], [la, lc])
    assert full.shape == (2, 10, 3)
    # sample 0: pad 2, then a0[:2], then c0[:6], ending at the last slot
    np.testing.assert_array_equal(full[0, 2:4], a[0, :2])
    np.testing.assert_array_equal(full[0, 4:10], c[0, :6])
    # sample 1: pad 3, a1[:4], c1[:3]
    np.testing.assert_array_equal(full[1, 3:7], a[1, :4])
    np.testing.assert_array_equal(full[1, 7:10], c[1, :3])
    valid = right_pack_valid([la, lc], 10, 14)
    np.testing.assert_array_equal(
        np.asarray(valid[0]), np.r_[np.zeros(2), np.ones(12)].astype(bool))
    np.testing.assert_array_equal(
        np.asarray(valid[1]), np.r_[np.zeros(3), np.ones(11)].astype(bool))


def test_ragged_greedy_matches_fixed_exact_fit(valle_setup):
    """B=1, exact-fit buffers, greedy: ragged == the fixed-shape decoder."""
    model, params = valle_setup
    rng = np.random.default_rng(2)
    phones = jnp.asarray(rng.integers(1, 20, (1, 6)))
    prompt = jnp.asarray(rng.integers(0, 32, (1, 9)))
    toks_fixed, len_fixed = ar_generate(
        model, params, phones, prompt, jax.random.key(3), max_new=10,
        temperature=0.0, compute_dtype="float32",
    )
    keys = jax.vmap(jax.random.key)(jnp.asarray([3], jnp.uint32))
    toks_ragged, len_ragged = ar_generate_ragged(
        model, params, phones, jnp.asarray([6]), prompt, jnp.asarray([9]),
        keys, max_new=10, temperature=0.0, compute_dtype="float32",
    )
    np.testing.assert_array_equal(np.asarray(toks_ragged),
                                  np.asarray(toks_fixed))
    assert int(len_ragged[0]) == int(len_fixed[0])


def test_ragged_greedy_pad_invariance(valle_setup):
    """Left-padding must not change greedy decode (RoPE shift invariance)."""
    model, params = valle_setup
    rng = np.random.default_rng(4)
    phones = jnp.asarray(rng.integers(1, 20, (1, 6)))
    prompt = jnp.asarray(rng.integers(0, 32, (1, 9)))
    keys = jax.vmap(jax.random.key)(jnp.asarray([5], jnp.uint32))
    exact, _ = ar_generate_ragged(
        model, params, phones, jnp.asarray([6]), prompt, jnp.asarray([9]),
        keys, max_new=8, temperature=0.0, compute_dtype="float32",
    )
    pad = lambda a, n: jnp.pad(a, ((0, 0), (0, n)))
    padded, _ = ar_generate_ragged(
        model, params, pad(phones, 3), jnp.asarray([6]), pad(prompt, 5),
        jnp.asarray([9]), keys, max_new=8, temperature=0.0,
        compute_dtype="float32",
    )
    np.testing.assert_array_equal(np.asarray(padded), np.asarray(exact))


def test_ragged_sampled_batched_equals_single(valle_setup):
    """B=3 mixed lengths, top-k sampling with per-request keys: every row
    must equal the same request served alone."""
    model, params = valle_setup
    rng = np.random.default_rng(6)
    lp_max, lt_max = 7, 10
    phones = jnp.asarray(rng.integers(1, 20, (3, lp_max)))
    prompt = jnp.asarray(rng.integers(0, 32, (3, lt_max)))
    phone_len = jnp.asarray([4, 7, 5])
    prompt_len = jnp.asarray([10, 6, 8])
    keys = jax.vmap(jax.random.key)(jnp.asarray([11, 22, 33], jnp.uint32))
    toks_b, len_b = ar_generate_ragged(
        model, params, phones, phone_len, prompt, prompt_len, keys,
        max_new=9, temperature=1.0, top_k=8, compute_dtype="float32",
    )
    for i in range(3):
        toks_s, len_s = ar_generate_ragged(
            model, params, phones[i:i+1], phone_len[i:i+1], prompt[i:i+1],
            prompt_len[i:i+1], keys[i:i+1], max_new=9, temperature=1.0,
            top_k=8, compute_dtype="float32",
        )
        np.testing.assert_array_equal(
            np.asarray(toks_b[i]), np.asarray(toks_s[0]),
            err_msg=f"request {i} changed when batched",
        )
        assert int(len_b[i]) == int(len_s[0])
    assert toks_b.shape == (3, 9)
    assert np.isfinite(np.asarray(len_b)).all()


def test_nar_ragged_matches_fixed_exact_fit(valle_setup):
    """B=2 exact-fit buffers: ragged NAR == fixed nar_generate (greedy)."""
    model, params = valle_setup
    rng = np.random.default_rng(7)
    b, lph, lp, tl = 2, 5, 6, 8
    phones = jnp.asarray(rng.integers(1, 20, (b, lph)))
    tokens0 = jnp.asarray(rng.integers(0, 32, (b, tl)))
    prompt_all = jnp.asarray(
        rng.integers(0, 32, (b, TINY.num_quantizers, lp)))

    fixed = model.apply(
        {"params": params}, phones, jnp.ones((b, lph)), tokens0,
        jnp.ones((b, tl)), prompt_all, method=VALLE.nar_generate,
    )
    ragged = nar_generate_ragged(
        model, params, phones, jnp.full((b,), lph), tokens0,
        jnp.full((b,), tl), prompt_all, jnp.full((b,), lp),
        compute_dtype="float32",
    )
    np.testing.assert_array_equal(np.asarray(ragged), np.asarray(fixed))


def test_nar_ragged_batched_equals_single(valle_setup):
    model, params = valle_setup
    rng = np.random.default_rng(8)
    lph_max, lp_max, t_max = 6, 7, 9
    phones = jnp.asarray(rng.integers(1, 20, (2, lph_max)))
    tokens0 = jnp.asarray(rng.integers(0, 32, (2, t_max)))
    prompt_all = jnp.asarray(
        rng.integers(0, 32, (2, TINY.num_quantizers, lp_max)))
    phone_len = jnp.asarray([4, 6])
    prompt_len = jnp.asarray([7, 5])
    target_len = jnp.asarray([9, 6])

    batched = nar_generate_ragged(
        model, params, phones, phone_len, tokens0, target_len, prompt_all,
        prompt_len, compute_dtype="float32",
    )
    for i in range(2):
        single = nar_generate_ragged(
            model, params, phones[i:i+1], phone_len[i:i+1], tokens0[i:i+1],
            target_len[i:i+1], prompt_all[i:i+1], prompt_len[i:i+1],
            compute_dtype="float32",
        )
        tl = int(target_len[i])
        np.testing.assert_array_equal(
            np.asarray(batched[i, :, :tl]), np.asarray(single[0, :, :tl]),
            err_msg=f"sample {i} changed when batched",
        )
    assert (np.asarray(batched[1, :, 6:]) == 0).all()


def test_valle_generate_ragged_end_to_end(valle_setup):
    """Full AR+NAR ragged zero-shot: shapes, vocab range, pad zeroing."""
    model, params = valle_setup
    rng = np.random.default_rng(9)
    phones = jnp.asarray(rng.integers(1, 20, (2, 6)))
    prompt_all = jnp.asarray(rng.integers(0, 32, (2, TINY.num_quantizers, 7)))
    keys = jax.vmap(jax.random.key)(jnp.asarray([1, 2], jnp.uint32))
    codes, gen_len = valle_generate_ragged(
        model, params, phones, jnp.asarray([4, 6]), prompt_all,
        jnp.asarray([7, 5]), keys, max_new=8, temperature=1.0, top_k=8,
        compute_dtype="float32",
    )
    assert codes.shape == (2, TINY.num_quantizers, 8)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 32).all()
    for i in range(2):
        gl = int(gen_len[i])
        assert 0 <= gl <= 8
        assert (np.asarray(codes[i, :, gl:]) == 0).all()