"""Conformer encoder (WeNet-extractor replacement) + weight conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.modules.conformer import ConformerConfig, ConformerEncoder


@pytest.fixture
def cfg():
    return ConformerConfig(input_dim=16, hidden=32, num_layers=2, num_heads=4,
                           ffn_hidden=48, conv_kernel=7)


def test_conformer_shapes_and_mask(rng, cfg):
    model = ConformerEncoder(cfg)
    x = jnp.asarray(rng.standard_normal((2, 37, 16)).astype(np.float32))
    mask = jnp.asarray((np.arange(37)[None] < np.array([[37], [20]])).astype(np.float32)).reshape(2, 37)
    params = model.init(jax.random.key(0), x, mask)["params"]
    h, sub_mask = model.apply({"params": params}, x, mask)
    assert h.shape[0] == 2 and h.shape[2] == 32
    assert sub_mask.shape == h.shape[:2]
    assert np.isfinite(np.asarray(h)).all()
    # padded frames must not change valid outputs (masked attention + the
    # conservative subsample mask excludes boundary-straddling frames)
    x2 = x.at[1, 20:].set(99.0)
    h2, _ = model.apply({"params": params}, x2, mask)
    valid = int(np.asarray(sub_mask)[1].sum())
    np.testing.assert_allclose(np.asarray(h)[1, :valid],
                               np.asarray(h2)[1, :valid], atol=1e-4)


def test_wenet_conversion_contract(rng, cfg):
    """A synthetic WeNet-named state dict converts into a pytree that the
    flax encoder consumes with identical structure."""
    from amphion_tpu.utils.convert import wenet_conformer_to_flax

    d, ffn, k = cfg.hidden, cfg.ffn_hidden, cfg.conv_kernel
    f = cfg.input_dim
    g = rng.standard_normal
    sd = {
        "encoder.embed.conv.0.weight": g((d, 1, 3, 3)),
        "encoder.embed.conv.0.bias": g(d),
        "encoder.embed.conv.2.weight": g((d, d, 3, 3)),
        "encoder.embed.conv.2.bias": g(d),
        # WeNet flattens (F//4 after two VALID stride-2 convs) * d
        "encoder.embed.out.0.weight": g((d, d * (((f - 1) // 2 - 1) // 2))),
        "encoder.embed.out.0.bias": g(d),
        "encoder.after_norm.weight": g(d),
        "encoder.after_norm.bias": g(d),
    }
    for i in range(cfg.num_layers):
        q = f"encoder.encoders.{i}"
        sd.update({
            f"{q}.norm_ff_macaron.weight": g(d), f"{q}.norm_ff_macaron.bias": g(d),
            f"{q}.feed_forward_macaron.w_1.weight": g((ffn, d)),
            f"{q}.feed_forward_macaron.w_1.bias": g(ffn),
            f"{q}.feed_forward_macaron.w_2.weight": g((d, ffn)),
            f"{q}.feed_forward_macaron.w_2.bias": g(d),
            f"{q}.norm_mha.weight": g(d), f"{q}.norm_mha.bias": g(d),
            f"{q}.self_attn.linear_q.weight": g((d, d)), f"{q}.self_attn.linear_q.bias": g(d),
            f"{q}.self_attn.linear_k.weight": g((d, d)), f"{q}.self_attn.linear_k.bias": g(d),
            f"{q}.self_attn.linear_v.weight": g((d, d)), f"{q}.self_attn.linear_v.bias": g(d),
            f"{q}.self_attn.linear_out.weight": g((d, d)), f"{q}.self_attn.linear_out.bias": g(d),
            f"{q}.self_attn.linear_pos.weight": g((d, d)),
            f"{q}.self_attn.pos_bias_u": g((cfg.num_heads, d // cfg.num_heads)),
            f"{q}.self_attn.pos_bias_v": g((cfg.num_heads, d // cfg.num_heads)),
            f"{q}.norm_conv.weight": g(d), f"{q}.norm_conv.bias": g(d),
            f"{q}.conv_module.pointwise_conv1.weight": g((2 * d, d, 1)),
            f"{q}.conv_module.pointwise_conv1.bias": g(2 * d),
            f"{q}.conv_module.depthwise_conv.weight": g((d, 1, k)),
            f"{q}.conv_module.depthwise_conv.bias": g(d),
            f"{q}.conv_module.norm.weight": g(d), f"{q}.conv_module.norm.bias": g(d),
            f"{q}.conv_module.pointwise_conv2.weight": g((d, d, 1)),
            f"{q}.conv_module.pointwise_conv2.bias": g(d),
            f"{q}.norm_ff.weight": g(d), f"{q}.norm_ff.bias": g(d),
            f"{q}.feed_forward.w_1.weight": g((ffn, d)),
            f"{q}.feed_forward.w_1.bias": g(ffn),
            f"{q}.feed_forward.w_2.weight": g((d, ffn)),
            f"{q}.feed_forward.w_2.bias": g(d),
            f"{q}.norm_final.weight": g(d), f"{q}.norm_final.bias": g(d),
        })
    sd = {k_: np.asarray(v, np.float32) for k_, v in sd.items()}
    converted = wenet_conformer_to_flax(sd, cfg.num_layers, cfg.hidden)

    model = ConformerEncoder(cfg)
    x = jnp.asarray(rng.standard_normal((1, 41, f)).astype(np.float32))
    ref_params = model.init(jax.random.key(0), x)["params"]
    ref_tree = jax.tree_util.tree_map(lambda a: a.shape, ref_params)
    conv_tree = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, converted)
    assert ref_tree == conv_tree, (ref_tree, conv_tree)
    h, _ = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, converted)}, x)
    assert np.isfinite(np.asarray(h)).all()
