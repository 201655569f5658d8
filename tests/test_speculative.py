"""Self-speculative greedy decode: token-IDENTICAL to plain greedy
decode regardless of draft quality (`models/vc/speculative.py` — the
verify pass re-derives every emitted token from the full model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.models.vc.ar_transformer import (
    ARTransformer,
    ARTransformerConfig,
    ar_transformer_generate,
)
from amphion_tpu.models.vc.speculative import (
    ar_transformer_generate_speculative,
)


@pytest.fixture(scope="module")
def tiny_ar():
    cfg = ARTransformerConfig(input_vocab=11, output_vocab=29, hidden=32,
                              intermediate=64, num_layers=4, num_heads=2,
                              max_position=256)
    model = ARTransformer(cfg)
    content = jnp.asarray(
        np.random.default_rng(0).integers(0, 11, (1, 7)), jnp.int32)
    params = model.init(
        jax.random.key(0), content, jnp.ones((1, 7)),
        jnp.zeros((1, 5), jnp.int32), jnp.ones((1, 5)),
        method=ARTransformer.loss)["params"]
    return model, params, content


@pytest.mark.parametrize("draft_layers,k", [(1, 2), (2, 3), (4, 4)])
def test_speculative_matches_plain_greedy(tiny_ar, draft_layers, k):
    model, params, content = tiny_ar
    ref_toks, ref_len = ar_transformer_generate(
        model, params, content, jax.random.key(1), max_new=12, top_k=1,
        compute_dtype="float32")
    toks, n = ar_transformer_generate_speculative(
        model, params, content, max_new=12, draft_layers=draft_layers,
        k=k, compute_dtype="float32")
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))
    assert int(n[0]) == int(ref_len[0])


def test_speculative_draft_equals_target_accepts_everything(tiny_ar):
    """draft_layers == num_layers → the draft IS the target model, so
    every draft is accepted and the loop emits k+1 tokens/iteration —
    still token-identical (sanity that acceptance bookkeeping is
    consistent at the happy-path extreme)."""
    model, params, content = tiny_ar
    ref_toks, _ = ar_transformer_generate(
        model, params, content, jax.random.key(1), max_new=10, top_k=1,
        compute_dtype="float32")
    toks, _ = ar_transformer_generate_speculative(
        model, params, content, max_new=10,
        draft_layers=model.cfg.num_layers, k=3, compute_dtype="float32")
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))


def test_speculative_quantized_path_compiles(tiny_ar):
    """int8 + int8-KV speculative decode runs (chunked verify through
    the per-query-causal scale-after-dot path) and emits valid ids."""
    model, params, content = tiny_ar
    toks, n = ar_transformer_generate_speculative(
        model, params, content, max_new=8, draft_layers=2, k=2,
        compute_dtype="int8")
    toks = np.asarray(toks)
    assert toks.shape == (1, 8)
    assert (toks >= 0).all() and (toks < model.cfg.total_vocab).all()
    assert 0 <= int(n[0]) <= 8


def test_valle_speculative_matches_plain_greedy():
    from amphion_tpu.models.tts.valle.valle import (
        VALLE,
        VALLEConfig,
        ar_generate,
    )
    from amphion_tpu.models.vc.speculative import (
        valle_ar_generate_speculative,
    )

    cfg = VALLEConfig(num_phones=17, audio_vocab=23, num_quantizers=2,
                      hidden=32, num_layers=3, num_heads=2,
                      max_position=256)
    model = VALLE(cfg)
    rng = np.random.default_rng(4)
    phones = jnp.asarray(rng.integers(1, 17, (1, 6)), jnp.int32)
    prompt = jnp.asarray(rng.integers(0, 23, (1, 5)), jnp.int32)
    params = model.init(
        jax.random.key(0), phones, jnp.ones((1, 6)),
        jnp.asarray(rng.integers(0, 23, (1, 2, 5))), jnp.ones((1, 5)),
        jax.random.key(1), method=VALLE.train_loss)["params"]

    ref_toks, ref_len = ar_generate(model, params, phones, prompt,
                                    jax.random.key(2), max_new=10,
                                    top_k=1, compute_dtype="float32")
    toks, n = valle_ar_generate_speculative(
        model, params, phones, prompt, max_new=10, draft_layers=2, k=3,
        compute_dtype="float32")
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))
    assert int(n[0]) == int(ref_len[0])


def test_speculative_sampling_matches_plain_distribution(tiny_ar):
    """Speculative SAMPLING (rejection scheme) must reproduce the plain
    sampler's distribution — compare empirical marginals of the first
    two emitted tokens over many seeds (deterministic seed list, total
    variation bound sized to the sampling noise)."""
    model, params, content = tiny_ar
    N = 3000
    V = model.cfg.total_vocab

    plain = jax.jit(lambda key: ar_transformer_generate(
        model, params, content, key, max_new=2, temperature=1.0,
        top_k=8, compute_dtype="float32")[0][0])
    spec = jax.jit(lambda key: ar_transformer_generate_speculative(
        model, params, content, rng=key, max_new=2, draft_layers=2, k=2,
        temperature=1.0, top_k=8, compute_dtype="float32")[0][0])

    counts = {"plain": np.zeros((2, V)), "spec": np.zeros((2, V))}
    for i in range(N):
        a = np.asarray(plain(jax.random.key(i)))
        b = np.asarray(spec(jax.random.key(100000 + i)))
        for t in range(2):
            counts["plain"][t, a[t]] += 1
            counts["spec"][t, b[t]] += 1
    for t in range(2):
        pa = counts["plain"][t] / N
        pb = counts["spec"][t] / N
        tv = 0.5 * np.abs(pa - pb).sum()
        # top_k=8 → ≤8 support points; TV noise ~ sqrt(8/N) ≈ 0.05
        assert tv < 0.08, (t, tv)
