"""Whisper ASR decoder oracle + greedy-decode tests
(`models/whisper_asr.py` vs HF torch Whisper; reference consumers:
`evaluation/metrics/intelligibility/`, `utils/whisper_transcription.py`,
Emilia ASR stage)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_whisper():
    from transformers import WhisperConfig, WhisperModel

    torch.manual_seed(80)
    cfg = WhisperConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=48, num_mel_bins=16, max_source_positions=20,
        decoder_layers=2, decoder_attention_heads=2, decoder_ffn_dim=48,
        vocab_size=100, max_target_positions=24,
        pad_token_id=0, bos_token_id=1, eos_token_id=99,
        decoder_start_token_id=1,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    ref = WhisperModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from amphion_tpu.models.ssl_encoders import (
        WhisperEncConfig,
        WhisperEncoder,
    )
    from amphion_tpu.models.whisper_asr import WhisperDecConfig, WhisperDecoder
    from amphion_tpu.utils.convert import (
        hf_whisper_decoder_to_flax,
        hf_whisper_encoder_to_flax,
    )

    enc = WhisperEncoder(WhisperEncConfig(
        hidden=32, num_layers=2, num_heads=2, ffn_hidden=48, n_mels=16,
        max_source_positions=20))
    dec = WhisperDecoder(WhisperDecConfig(
        hidden=32, num_layers=2, num_heads=2, ffn_hidden=48, vocab_size=100,
        max_target_positions=24))
    params = jax.tree_util.tree_map(jnp.asarray, {
        "encoder": hf_whisper_encoder_to_flax(sd, num_layers=2),
        "decoder": hf_whisper_decoder_to_flax(sd, num_layers=2),
    })
    return ref, sd, enc, dec, params


class TestWhisperDecoder:
    def test_teacher_forcing_parity(self, tiny_whisper):
        ref, sd, enc, dec, params = tiny_whisper
        torch.manual_seed(81)
        mel = torch.randn(2, 16, 40)
        toks = torch.randint(0, 100, (2, 7))
        with torch.no_grad():
            out = ref(mel, decoder_input_ids=toks).last_hidden_state.numpy()
        ref_logits = out @ sd["decoder.embed_tokens.weight"].T
        enc_j = enc.apply({"params": params["encoder"]},
                          jnp.asarray(mel.numpy().transpose(0, 2, 1)))
        logits = dec.apply({"params": params["decoder"]},
                           jnp.asarray(toks.numpy()), enc_j)
        np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4)

    def test_cache_matches_full_forward(self, tiny_whisper):
        """Incremental KV-cache decode must reproduce the full causal
        pass logits position by position."""
        from amphion_tpu.models.whisper_asr import WhisperDecoder

        _, _, enc, dec, params = tiny_whisper
        rng = np.random.RandomState(12)
        mel = jnp.asarray(rng.randn(1, 40, 16).astype(np.float32))
        toks = jnp.asarray(rng.randint(0, 100, (1, 9)))
        enc_j = enc.apply({"params": params["encoder"]}, mel)
        enc_kv = dec.apply({"params": params["decoder"]}, enc_j,
                           method=WhisperDecoder.encode_kv)
        full, _ = dec.apply({"params": params["decoder"]}, toks, enc_kv,
                            method=WhisperDecoder.forward)
        caches = dec.init_cache(1, 9)
        # prefill 4, then 5 single steps
        got = []
        logits, caches = dec.apply({"params": params["decoder"]},
                                   toks[:, :4], enc_kv, caches, 0,
                                   method=WhisperDecoder.forward)
        got.append(np.asarray(logits))
        for i in range(4, 9):
            logits, caches = dec.apply({"params": params["decoder"]},
                                       toks[:, i:i + 1], enc_kv, caches, i,
                                       method=WhisperDecoder.forward)
            got.append(np.asarray(logits))
        inc = np.concatenate(got, axis=1)
        np.testing.assert_allclose(inc, np.asarray(full), atol=1e-5)

    def test_greedy_decode_matches_torch(self, tiny_whisper):
        from amphion_tpu.models.whisper_asr import whisper_greedy_decode

        ref, sd, enc, dec, params = tiny_whisper
        torch.manual_seed(82)
        mel = torch.randn(2, 16, 40)
        prefix = [1, 2, 3]
        ids = whisper_greedy_decode(
            enc, dec, params, jnp.asarray(mel.numpy().transpose(0, 2, 1)),
            prefix, max_new=6, eot_id=99)
        cur = torch.tensor([prefix, prefix])
        outs = []
        with torch.no_grad():
            for _ in range(6):
                h = ref(mel, decoder_input_ids=cur).last_hidden_state
                nxt = (h[:, -1].numpy()
                       @ sd["decoder.embed_tokens.weight"].T).argmax(-1)
                outs.append(nxt)
                cur = torch.cat([cur, torch.tensor(nxt)[:, None]], dim=1)
        ref_ids = np.stack(outs, 1)
        for b in range(2):  # EOT latching, as in our decode
            stop = np.where(ref_ids[b] == 99)[0]
            if len(stop):
                ref_ids[b, stop[0]:] = 99
        np.testing.assert_array_equal(ids, ref_ids)
