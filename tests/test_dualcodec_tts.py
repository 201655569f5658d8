"""DualCodec TTS stack tests (`models/tts/dualcodec_tts.py`):
functional AR/NAR losses + jitted decode shapes, and a torch oracle
round trip against the reference ValleNAR
(`models/codec/dualcodec/dualcodec/model_tts/valle_nar/valle_nar_model.py`)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REFERENCE = Path("/root/reference/models/codec/dualcodec")

from amphion_tpu.models.tts.dualcodec_tts import (  # noqa: E402
    DualARConfig,
    DualCodecValleAR,
    DualCodecValleNAR,
    DualNARConfig,
    dual_ar_generate,
    dual_nar_generate,
)

AR_TINY = DualARConfig(text_vocab=30, speech_vocab=40, initial_offset=10,
                       sep_token=3, eos_id=2, hidden=32, intermediate=64,
                       num_layers=2, num_heads=2, max_position=256)
NAR_TINY = DualNARConfig(phone_vocab=20, first_layer_vocab=24,
                         target_vocab=16, hidden=32, intermediate=64,
                         num_layers=2, num_heads=2, num_quantizers=4,
                         max_position=256)


class TestDualCodecValleAR:
    def test_loss_and_generate(self):
        rng = np.random.RandomState(20)
        model = DualCodecValleAR(AR_TINY)
        text = jnp.asarray(rng.randint(0, 30, (2, 6)))
        tmask = jnp.ones((2, 6), jnp.float32)
        speech = jnp.asarray(rng.randint(0, 40, (2, 10)))
        smask = jnp.asarray(
            np.stack([np.ones(10), np.r_[np.ones(7), np.zeros(3)]])
        ).astype(jnp.float32)
        params = model.init(jax.random.key(0), text, tmask, speech, smask,
                            method=DualCodecValleAR.loss)["params"]
        loss, aux = model.apply({"params": params}, text, tmask, speech,
                                smask, method=DualCodecValleAR.loss)
        assert np.isfinite(float(loss))
        # random init → CE within a couple nats of log(total vocab)
        assert abs(float(loss) - np.log(AR_TINY.total_vocab)) < 2.0

        toks, lens = dual_ar_generate(
            model, params, text[:1], speech[:1, :4], jax.random.key(1),
            max_new=8, top_k=5, repeat_penalty=1.2)
        assert toks.shape == (1, 8)
        assert 0 <= int(lens[0]) <= 8

    def test_repetition_penalty_math(self):
        from amphion_tpu.models.tts.dualcodec_tts import (
            _apply_repetition_penalty,
        )

        logits = jnp.asarray([[2.0, -2.0, 1.0]])
        seen = jnp.asarray([[True, True, False]])
        out = np.asarray(_apply_repetition_penalty(logits, seen, 2.0))
        np.testing.assert_allclose(out, [[1.0, -4.0, 1.0]])


class TestDualCodecValleNAR:
    def test_loss_and_generate(self):
        rng = np.random.RandomState(21)
        model = DualCodecValleNAR(NAR_TINY)
        phones = jnp.asarray(rng.randint(0, 20, (2, 5)))
        pmask = jnp.ones((2, 5), jnp.float32)
        codes = jnp.asarray(np.concatenate(
            [rng.randint(0, 24, (1, 2, 12)),
             rng.randint(0, 16, (3, 2, 12))]))
        fmask = jnp.ones((2, 12), jnp.float32)
        params = model.init(jax.random.key(0), phones, pmask, codes, fmask,
                            jax.random.key(1),
                            method=DualCodecValleNAR.loss)["params"]
        loss, aux = model.apply({"params": params}, phones, pmask, codes,
                                fmask, jax.random.key(2),
                                method=DualCodecValleNAR.loss)
        assert np.isfinite(float(loss))
        assert 1 <= int(aux["nar_layer"]) <= 3
        # token dropout path stays finite and in-vocab
        loss2, _ = model.apply({"params": params}, phones, pmask, codes,
                               fmask, jax.random.key(3), 0.5,
                               method=DualCodecValleNAR.loss)
        assert np.isfinite(float(loss2))

        out = dual_nar_generate(model, params, phones,
                                codes[:, :, :4], codes[0, :, 4:])
        assert out.shape == (4, 2, 8)
        assert int(out[1:].max()) < NAR_TINY.target_vocab
        # layer 0 of the output is the provided semantic stream
        np.testing.assert_array_equal(np.asarray(out[0]),
                                      np.asarray(codes[0, :, 4:]))


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference unavailable")
class TestDualCodecNARRoundTrip:
    def _load_ref(self):
        sys.path.insert(0, str(REFERENCE))
        import importlib.machinery

        def stub(name):
            if name in sys.modules:
                return
            m = types.ModuleType(name)
            m.__path__ = []
            m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None,
                                                        is_package=True)

            def g(attr):
                if attr.startswith("__"):
                    raise AttributeError(attr)
                return object

            m.__getattr__ = g
            sys.modules[name] = m

        # easydict must actually work (forward returns edict(...))
        if "easydict" not in sys.modules:
            ed = types.ModuleType("easydict")

            class EasyDict(dict):
                def __getattr__(self, k):
                    try:
                        return self[k]
                    except KeyError as e:
                        raise AttributeError(k) from e

                def __setattr__(self, k, v):
                    self[k] = v

            ed.EasyDict = EasyDict
            sys.modules["easydict"] = ed
        for n in ("cached_path", "torchaudio", "torchaudio.functional",
                  "torchaudio.transforms", "librosa", "librosa.filters",
                  "audiotools", "audiotools.ml", "audiotools.core",
                  "descript_audio_codec", "einx", "wandb"):
            stub(n)
        # the codec oracle tests (test_weight_conversion) need a REAL
        # BaseModel on audiotools.ml — keep the shared stub compatible
        sys.modules["audiotools.ml"].BaseModel = torch.nn.Module
        sys.modules["audiotools"].AudioSignal = object
        from dualcodec.model_tts.valle_nar import valle_nar_model
        return valle_nar_model

    def test_nar_forward_parity(self):
        V = self._load_ref()
        torch.manual_seed(90)
        ref = V.ValleNAR(
            phone_vocab_size=20, first_layer_vocab_size=24,
            target_vocab_size=16, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            pad_token_id=35, bos_target_id=36, eos_target_id=37,
            bos_prompt_id=38, eos_prompt_id=39, bos_phone_id=40,
            eos_phone_id=41).eval()
        rng = np.random.RandomState(22)
        phones = rng.randint(0, 20, (2, 5))
        codes = np.concatenate([rng.randint(0, 24, (1, 2, 12)),
                                rng.randint(0, 16, (7, 2, 12))])
        layer, plen = 2, 3
        with torch.no_grad():
            out = ref(
                torch.from_numpy(phones), torch.ones(2, 5, dtype=torch.long),
                torch.from_numpy(codes), torch.ones(2, 12, dtype=torch.long),
                target_quantization_layer=layer, prompt_len=plen)
        # out.logits is the full [phones, prompt, target] sequence; the
        # target region is the last T-plen frames (ref slices a local var)
        ref_logits = out.logits.numpy()[:, -(12 - plen):]

        from amphion_tpu.utils.convert import dualcodec_valle_nar_to_flax

        params = jax.tree_util.tree_map(
            jnp.asarray,
            dualcodec_valle_nar_to_flax(
                {k: v.numpy() for k, v in ref.state_dict().items()},
                num_layers=2, num_quantizers=8))
        ours = DualCodecValleNAR(DualNARConfig(
            phone_vocab=20, first_layer_vocab=24, target_vocab=16,
            hidden=32, intermediate=64, num_layers=2, num_heads=2,
            num_quantizers=8))
        prompt_mask = (np.arange(12)[None, :] < plen).astype(np.float32)
        logits = ours.apply(
            {"params": params}, jnp.asarray(phones), jnp.ones((2, 5)),
            jnp.asarray(codes), jnp.ones((2, 12)), jnp.asarray(layer),
            jnp.asarray(prompt_mask), method=DualCodecValleNAR.forward)
        got = np.asarray(logits)[:, plen:]
        assert got.shape == ref_logits.shape
        np.testing.assert_allclose(got, ref_logits, atol=2e-4)


class TestDualCodecVoicebox:
    def test_cond_scale_factor_inference(self):
        """DualCodec-VoiceBox = FlowMatchingTransformer with
        cond_scale_factor: 12.5 Hz codes upsampled (nearest) to the mel
        rate (ref voicebox_models.py:310-312)."""
        from amphion_tpu.models.vc.flow_matching_transformer import (
            FlowMatchingTransformer,
            FMTConfig,
            fmt_inference,
        )

        rng = np.random.RandomState(23)
        model = FlowMatchingTransformer(FMTConfig(
            token_vocab=16, n_mel=8, hidden=32, num_layers=2, num_heads=2,
            cond_scale_factor=2))
        lp, lt = 4, 8  # mel frames; tokens at half rate = 6
        tokens = jnp.asarray(rng.randint(0, 16, (1, (lp + lt) // 2)))
        mel = jnp.asarray(
            rng.standard_normal((1, lp + lt, 8)).astype(np.float32))
        pmask = jnp.concatenate([jnp.ones((1, lp)), jnp.zeros((1, lt))], 1)
        xmask = jnp.ones((1, lp + lt), jnp.float32)
        params = model.init(jax.random.key(0), mel, tokens, pmask, xmask,
                            jax.random.key(1),
                            method=FlowMatchingTransformer.loss)["params"]
        loss, _ = model.apply({"params": params}, mel, tokens, pmask, xmask,
                              jax.random.key(2),
                              method=FlowMatchingTransformer.loss)
        assert np.isfinite(float(loss))
        out = fmt_inference(model, params, tokens, mel[:, :lp],
                            jax.random.key(3), num_steps=2, cfg_scale=1.0)
        assert out.shape == (1, (lp + lt) // 2 * 2 - lp, 8)
