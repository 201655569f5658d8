"""Round-3 advisor findings — regression tests for the fixes.

1. llama.py scale-after-dot fast path: per-query causal bound for chunked
   (t>1) quantized-KV decode.
2. mandarin.py: caller char_lexicon overrides the polyphone context rules.
3. llama.py: validate_quantized_tree gives a clear fused/unfused mismatch
   error; quantize_llama_params(cfg=...) derives fuse from the config.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quantized_kv_chunked_decode_is_causal(rng):
    """Multi-token chunked decode through the scale-after-dot int8-KV fast
    path (bias=None, t>1) must equal token-by-token decode — i.e. be
    causal WITHIN the chunk (advisor r3 #1)."""
    from amphion_tpu.modules.llama import LlamaAttention, LlamaConfig

    cfg = LlamaConfig(hidden_size=32, intermediate_size=64, num_layers=1,
                      num_heads=2, max_position=32, kv_quant=True)
    attn = LlamaAttention(cfg)
    x = jnp.asarray(rng.standard_normal((1, 6, 32)).astype(np.float32))

    def mkcache():
        return (jnp.zeros((1, 2, 16, 16), jnp.int8),
                jnp.zeros((1, 2, 16, 16), jnp.int8),
                jnp.zeros((1, 2, 16), jnp.float32),
                jnp.zeros((1, 2, 16), jnp.float32))

    params = attn.init(jax.random.key(0), x[:, :1], cache=mkcache(),
                       cache_index=0)["params"]

    # token-by-token (t==1 fast path — ground truth)
    cache = mkcache()
    outs = []
    for i in range(6):
        o, cache = attn.apply({"params": params}, x[:, i:i + 1],
                              cache=cache, cache_index=i)
        outs.append(o)
    ref = jnp.concatenate(outs, axis=1)

    # one 6-token chunk through the same path (bias=None, t=6)
    out, _ = attn.apply({"params": params}, x, cache=mkcache(),
                        cache_index=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
    # and a chunk appended mid-stream (cache_index > 0)
    cache = mkcache()
    _, cache = attn.apply({"params": params}, x[:, :2], cache=cache,
                          cache_index=0)
    out2, _ = attn.apply({"params": params}, x[:, 2:], cache=cache,
                         cache_index=2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref[:, 2:]),
                               atol=2e-2)


def test_char_lexicon_overrides_context_rules():
    """A caller-supplied char lexicon must win over the built-in polyphone
    context rules (advisor r3 #2)."""
    from amphion_tpu.text.multilingual.mandarin import chinese_to_pinyin
    from amphion_tpu.text.multilingual.polyphone import disambiguate

    # find a char the rules actually cover in this context
    assert disambiguate("长", "长大", 0, "", "") is not None
    base = chinese_to_pinyin("长")
    override = chinese_to_pinyin("长", char_lexicon={"长": "xx9"})
    assert override[0][0] == "xx9", (base, override)


def test_validate_quantized_tree_mismatch_errors(rng):
    from amphion_tpu.modules.llama import (
        LlamaConfig,
        LlamaDecoder,
        quantize_llama_params,
        validate_quantized_tree,
    )

    cfg = LlamaConfig(hidden_size=32, intermediate_size=64, num_layers=1,
                      num_heads=2, max_position=32)
    dec = LlamaDecoder(cfg)
    x = jnp.asarray(rng.standard_normal((1, 3, 32)).astype(np.float32))
    params = dec.init(jax.random.key(0), x)["params"]

    qcfg_fused = dataclasses.replace(cfg, decode_quant="int8",
                                     fused_quant_proj=True)
    qcfg_unfused = dataclasses.replace(cfg, decode_quant="int8",
                                       fused_quant_proj=False)

    fused_tree = quantize_llama_params(params, "int8", cfg=qcfg_fused)
    unfused_tree = quantize_llama_params(params, "int8", cfg=qcfg_unfused)

    # matched pairs pass
    validate_quantized_tree(fused_tree, qcfg_fused)
    validate_quantized_tree(unfused_tree, qcfg_unfused)
    validate_quantized_tree(params, cfg)  # unquantized config: no-op

    with pytest.raises(ValueError, match="UNFUSED"):
        validate_quantized_tree(unfused_tree, qcfg_fused)
    with pytest.raises(ValueError, match="FUSED"):
        validate_quantized_tree(fused_tree, qcfg_unfused)

    # cfg= derives fuse correctly (unfused config → separate q_proj)
    def has(tree, key):
        if not isinstance(tree, dict):
            return False
        return key in tree or any(has(v, key) for v in tree.values())

    assert has(fused_tree, "qkv_proj") and not has(unfused_tree, "qkv_proj")


def test_pesq_one_time_calibration_warning(rng):
    import warnings

    from amphion_tpu.evaluation.metrics import p862

    p862._WARNED = False
    x = rng.standard_normal(16000 * 2).astype(np.float64) * 0.1
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        p862.pesq_p862(x, x, sample_rate=16000)
        assert any("MNRU" in str(wi.message) for wi in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        p862.pesq_p862(x, x, sample_rate=16000)
        assert not any("MNRU" in str(wi.message) for wi in w)
