"""End-to-end tests of the TPU-native SSL content extractors
(`data/processors/content.py` *_native paths): a tiny random-init HF
checkpoint is saved to disk, loaded through our converter, and the
jitted flax extract (with bucket padding + frame masks) must match the
torch model run on the raw unpadded audio.

Reference behavior: `processors/content_extractor.py` (WhisperExtractor:267,
ContentvecExtractor:317, HubertExtractor:502) + MaskGCT semantic features
(`models/tts/maskgct/maskgct_utils.py:46-56`).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_hubert_dir(tmp_path_factory):
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(70)
    model = HubertModel(HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=48, num_feat_extract_layers=3,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, mask_time_prob=0.0)).eval()
    d = tmp_path_factory.mktemp("hubert_tiny")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


class TestNativeExtractors:
    def test_hubert_native_matches_torch(self, tiny_hubert_dir):
        from amphion_tpu.data.processors.content import hubert_native_extractor

        model, d = tiny_hubert_dir
        extract = hubert_native_extractor(d, layer=-1)
        rng = np.random.RandomState(0)
        wav = rng.randn(4000).astype(np.float32)
        ours = extract(wav, 16000)
        with torch.no_grad():
            ref = model(torch.from_numpy(wav)[None]).last_hidden_state[0]
        assert ours.shape == tuple(ref.shape)
        np.testing.assert_allclose(ours, ref.numpy(), atol=5e-4)

    def test_hubert_native_layer_tap(self, tiny_hubert_dir):
        from amphion_tpu.data.processors.content import hubert_native_extractor

        model, d = tiny_hubert_dir
        extract = hubert_native_extractor(d, layer=1)
        rng = np.random.RandomState(1)
        wav = rng.randn(3200).astype(np.float32)
        ours = extract(wav, 16000)
        with torch.no_grad():
            ref = model(torch.from_numpy(wav)[None],
                        output_hidden_states=True).hidden_states[1][0]
        np.testing.assert_allclose(ours, ref.numpy(), atol=5e-4)

    def test_w2v_bert_native_matches_torch(self, tmp_path):
        from transformers import (
            SeamlessM4TFeatureExtractor,
            Wav2Vec2BertConfig,
            Wav2Vec2BertModel,
        )

        from amphion_tpu.data.processors.content import (
            w2v_bert_native_extractor,
        )

        torch.manual_seed(71)
        model = Wav2Vec2BertModel(Wav2Vec2BertConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=48, feature_projection_input_dim=160,
            conv_depthwise_kernel_size=7,
            position_embeddings_type="relative_key",
            left_max_position_embeddings=8, right_max_position_embeddings=4,
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            feat_proj_dropout=0.0, conformer_conv_dropout=0.0, layerdrop=0.0,
            apply_spec_augment=False)).eval()
        model.save_pretrained(tmp_path, safe_serialization=True)
        extract = w2v_bert_native_extractor(str(tmp_path), layer=1)
        rng = np.random.RandomState(2)
        wav = rng.randn(8000).astype(np.float32)
        ours = extract(wav, 16000)
        fe = SeamlessM4TFeatureExtractor(feature_size=80)
        feats = fe(wav, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            ref = model(feats.input_features,
                        output_hidden_states=True).hidden_states[1][0]
        assert ours.shape == tuple(ref.shape)
        np.testing.assert_allclose(ours, ref.numpy(), atol=5e-4)

    def test_whisper_native_matches_torch(self, tmp_path):
        from transformers import (
            WhisperConfig,
            WhisperFeatureExtractor,
            WhisperModel,
        )

        from amphion_tpu.data.processors.content import (
            whisper_native_extractor,
        )

        torch.manual_seed(72)
        model = WhisperModel(WhisperConfig(
            d_model=32, encoder_layers=2, encoder_attention_heads=2,
            encoder_ffn_dim=48, num_mel_bins=80, max_source_positions=1500,
            decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=48,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)).eval()
        model.save_pretrained(tmp_path, safe_serialization=True)
        extract = whisper_native_extractor(str(tmp_path))
        rng = np.random.RandomState(3)
        wav = rng.randn(16000).astype(np.float32)
        ours = extract(wav, 16000)
        fe = WhisperFeatureExtractor(feature_size=80)
        mel = fe(wav, sampling_rate=16000, return_tensors="pt").input_features
        with torch.no_grad():
            ref = model.encoder(mel).last_hidden_state[0]
        # reference keeps len/16000*50 frames (`content_extractor.py` whisper
        # frame-rate contract)
        assert ours.shape == (50, 32)
        np.testing.assert_allclose(ours, ref.numpy()[:50], atol=5e-4)

    def test_hubert_native_batch_matches_single(self, tiny_hubert_dir):
        """Bucketed batch extraction must equal per-utterance extraction
        (mixed lengths in one device program)."""
        from amphion_tpu.data.processors.content import hubert_native_extractor

        _, d = tiny_hubert_dir
        extract = hubert_native_extractor(d, layer=-1)
        rng = np.random.RandomState(7)
        wavs = [rng.randn(n).astype(np.float32) for n in (3000, 4500, 7000)]
        batched = extract.batch(wavs, 16000)
        for wav, feats in zip(wavs, batched):
            single = extract(wav, 16000)
            assert feats.shape == single.shape
            np.testing.assert_allclose(feats, single, atol=1e-5)

    def test_extract_content_features_batched(self, tiny_hubert_dir, tmp_path):
        """Offline extraction CLI loop uses the batched device path and
        writes per-uid .npy (ref content_extractor.py:561)."""
        from types import SimpleNamespace

        from amphion_tpu.data.audio_io import save_wav
        from amphion_tpu.data.processors.content import (
            extract_content_features,
        )

        _, d = tiny_hubert_dir
        rng = np.random.RandomState(8)
        utts = []
        for i, n in enumerate((4000, 6000, 5000)):
            wav = (rng.randn(n) * 0.1).astype(np.float32)
            path = tmp_path / f"u{i}.wav"
            save_wav(str(path), wav, 16000)
            utts.append(SimpleNamespace(uid=f"u{i}", path=str(path)))
        out = extract_content_features(
            "hubert_native", utts, tmp_path / "feats", sample_rate=16000,
            batch_size=2, model_dir=d)
        for u in utts:
            f = np.load(out / f"{u.uid}.npy")
            assert f.ndim == 2 and f.shape[1] == 32


class TestFairseqContentVec:
    def _to_fairseq_sd(self, hf_sd):
        """Re-key an HF HubertModel state dict into the fairseq layout
        (inverse of the official HF conversion mapping) — serves as the
        oracle source for `fairseq_hubert_to_flax`."""
        out = {}
        for k, v in hf_sd.items():
            v = v.numpy() if hasattr(v, "numpy") else v
            if k.startswith("feature_extractor.conv_layers."):
                parts = k.split(".")
                i, sub = parts[2], ".".join(parts[3:])
                if sub.startswith("conv."):
                    out[f"feature_extractor.conv_layers.{i}.0."
                        f"{sub.split('.')[1]}"] = v
                else:  # layer_norm.* → GroupNorm at Sequential index 2
                    out[f"feature_extractor.conv_layers.{i}.2."
                        f"{sub.split('.')[1]}"] = v
            elif k.startswith("feature_projection.layer_norm."):
                out[k.replace("feature_projection.layer_norm.",
                              "layer_norm.")] = v
            elif k.startswith("feature_projection.projection."):
                out[k.replace("feature_projection.projection.",
                              "post_extract_proj.")] = v
            elif k.startswith("encoder.pos_conv_embed.conv."):
                out[k.replace("encoder.pos_conv_embed.conv.",
                              "encoder.pos_conv.0.")] = v
            elif ".feed_forward.intermediate_dense." in k:
                out[k.replace(".feed_forward.intermediate_dense.",
                              ".fc1.").replace(".attention.",
                                               ".self_attn.")] = v
            elif ".feed_forward.output_dense." in k:
                out[k.replace(".feed_forward.output_dense.", ".fc2.")] = v
            elif ".attention." in k:
                out[k.replace(".attention.", ".self_attn.")] = v
            elif ".layer_norm." in k and "encoder.layers." in k:
                out[k.replace(".layer_norm.", ".self_attn_layer_norm.")] = v
            else:
                out[k] = v
        return out

    def test_fairseq_layout_matches_hf(self, tiny_hubert_dir):
        import jax.numpy as jnp

        from amphion_tpu.models.ssl_encoders import (
            HubertConfig,
            HubertEncoder,
        )
        from amphion_tpu.utils.convert import fairseq_hubert_to_flax

        model, _ = tiny_hubert_dir
        fsd = self._to_fairseq_sd(dict(model.state_dict()))
        params = fairseq_hubert_to_flax(fsd, num_layers=2, num_feat_layers=3)
        cfg = HubertConfig(hidden=32, num_layers=2, num_heads=2,
                           ffn_hidden=48, conv_dim=(16, 16, 16),
                           conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
                           num_conv_pos_embeddings=16,
                           num_conv_pos_embedding_groups=4)
        rng = np.random.RandomState(13)
        wav = rng.randn(2, 400).astype(np.float32)
        last, _ = HubertEncoder(cfg).apply({"params": params},
                                           jnp.asarray(wav))
        with torch.no_grad():
            ref = model(torch.from_numpy(wav)).last_hidden_state.numpy()
        np.testing.assert_allclose(np.asarray(last), ref, atol=2e-5)

    def test_fairseq_ckpt_extractor(self, tiny_hubert_dir, tmp_path):
        """End-to-end: a fairseq-style .pt (with the reference's
        {'model': ...} nesting) loads through contentvec_fairseq_extractor."""
        from amphion_tpu.data.processors.content import (
            contentvec_fairseq_extractor,
        )

        model, _ = tiny_hubert_dir
        fsd = {k: torch.from_numpy(np.asarray(v)) for k, v in
               self._to_fairseq_sd(dict(model.state_dict())).items()}
        ckpt = tmp_path / "checkpoint_best_legacy_tiny.pt"
        torch.save({"model": fsd}, ckpt)
        extract = contentvec_fairseq_extractor(
            str(ckpt), num_layers=2, hidden=32, num_heads=2, ffn_hidden=48,
            conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3),
            conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4)
        rng = np.random.RandomState(14)
        wav = rng.randn(4000).astype(np.float32)
        with torch.no_grad():
            ref = model(torch.from_numpy(wav)[None]).last_hidden_state[0]
        ours = extract(wav, 16000)
        assert ours.shape == tuple(ref.shape)
        np.testing.assert_allclose(ours, ref.numpy(), atol=5e-4)


def test_w2vbert_scanned_apply_matches_unrolled():
    """scan-over-layers forward == the unrolled stack (same HF-layout
    params), at every tap — the compile-size lever for the 24-layer
    extraction program (bench.py ssl)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from amphion_tpu.models.ssl_encoders import (
        W2VBertConfig,
        W2VBertEncoder,
        w2vbert_apply_scanned,
    )

    cfg = W2VBertConfig(hidden=32, num_layers=4, num_heads=2,
                        ffn_hidden=64, conv_kernel=5)
    m = W2VBertEncoder(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((2, 12, cfg.input_dim)).astype(np.float32))
    mask = jnp.concatenate([jnp.ones((2, 9)), jnp.zeros((2, 3))], axis=1)
    params = m.init(jax.random.key(0), feats, mask)["params"]
    _, hidden = m.apply({"params": params}, feats, mask)
    for tap in (0, 1, 3, 4, None):
        got = w2vbert_apply_scanned(m, params, feats, mask, tap=tap)
        want = hidden[cfg.num_layers if tap is None else tap]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, err_msg=str(tap))
