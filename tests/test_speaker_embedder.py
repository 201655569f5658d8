"""Oracle tests for the native WavLM-SV speaker embedder: a tiny random
`transformers.WavLMForXVector` (local lib, no download) must match our
flax `WavLMForSpeakerVerification` through `hf_wavlm_sv_to_flax` — pins
the gated relative position bias, bucket function, TDNN head, and
Bessel-corrected statistic pooling (reference capability:
`evaluation/metrics/similarity/models/WavLMModel.py`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from amphion_tpu.models.speaker_embedder import (  # noqa: E402
    WavLMForSpeakerVerification,
    WavLMSVConfig,
    cosine_similarity,
)
from amphion_tpu.utils.convert import hf_wavlm_sv_to_flax  # noqa: E402


def _tiny_pair(seed=0):
    from transformers import WavLMConfig, WavLMForXVector

    torch.manual_seed(seed)
    hf_cfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16), conv_kernel=(10, 3),
        conv_stride=(5, 2), conv_bias=False, feat_extract_norm="group",
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=32, max_bucket_distance=50,
        tdnn_dim=(24, 24, 24, 24, 30), tdnn_kernel=(5, 3, 3, 1, 1),
        tdnn_dilation=(1, 2, 3, 1, 1), xvector_output_dim=20,
        use_weighted_layer_sum=True, num_labels=4,
        layerdrop=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0,
        do_stable_layer_norm=False, apply_spec_augment=False,
    )
    ref = WavLMForXVector(hf_cfg).eval()
    # break the symmetric init of layer_weights so the weighted sum is
    # actually exercised
    with torch.no_grad():
        ref.layer_weights.copy_(torch.randn_like(ref.layer_weights))
    cfg = WavLMSVConfig(
        hidden=32, num_layers=2, num_heads=4, ffn_hidden=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        conv_bias=False, feat_extract_norm="group",
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=32, max_distance=50,
        tdnn_dim=(24, 24, 24, 24, 30), tdnn_kernel=(5, 3, 3, 1, 1),
        tdnn_dilation=(1, 2, 3, 1, 1), xvector_dim=20,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = hf_wavlm_sv_to_flax(sd, num_layers=2, num_feat_layers=2)
    return ref, WavLMForSpeakerVerification(cfg), params


def test_embeddings_match_hf():
    ref, ours, params = _tiny_pair()
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 2000)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_emb = ref(torch.from_numpy(wav)).embeddings.numpy()
    import jax.numpy as jnp

    emb = np.asarray(ours.apply({"params": params}, jnp.asarray(wav)))
    assert emb.shape == ref_emb.shape
    np.testing.assert_allclose(emb, ref_emb, atol=2e-4)


def test_padded_batch_matches_unpadded():
    """Bucket padding + num_valid must reproduce each utterance's
    unpadded embedding (masked group-norm stats + masked stat pooling)."""
    import jax.numpy as jnp

    _, ours, params = _tiny_pair(seed=1)
    rng = np.random.default_rng(1)
    a = rng.standard_normal(1600).astype(np.float32) * 0.1
    b = rng.standard_normal(2200).astype(np.float32) * 0.1
    batch = np.zeros((2, 2200), np.float32)
    batch[0, :1600], batch[1] = a, b
    emb = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(batch),
        num_valid=jnp.asarray([1600, 2200])))
    solo_a = np.asarray(ours.apply({"params": params},
                                   jnp.asarray(a)[None]))[0]
    solo_b = np.asarray(ours.apply({"params": params},
                                   jnp.asarray(b)[None]))[0]
    np.testing.assert_allclose(emb[0], solo_a, atol=2e-4)
    np.testing.assert_allclose(emb[1], solo_b, atol=2e-4)


def test_cosine_similarity_separates_speakers():
    """Sanity: same-signal similarity 1.0; cosine in [-1, 1]."""
    import jax.numpy as jnp

    _, ours, params = _tiny_pair(seed=2)
    rng = np.random.default_rng(2)
    wav = rng.standard_normal((2, 2000)).astype(np.float32) * 0.1
    emb = ours.apply({"params": params}, jnp.asarray(wav))
    sim_self = float(cosine_similarity(emb[0], emb[0]))
    sim_cross = float(cosine_similarity(emb[0], emb[1]))
    assert abs(sim_self - 1.0) < 1e-5
    assert -1.0 <= sim_cross <= 1.0
