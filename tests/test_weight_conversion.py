"""Round-trip weight-conversion tests against the REFERENCE torch models.

The reference tree (read-only, torch CPU) is used purely as a numeric
oracle: instantiate its actual modules with random weights, convert the
state dict with amphion_tpu.utils.convert, and require our Flax modules
to reproduce the torch forward outputs. This proves the converters AND
the architectural parity of our re-implementations (padding formulas,
weight-norm semantics, MRF structure) in one shot.
"""

import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not available")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module", autouse=True)
def _ref_on_path():
    sys.path.insert(0, str(REFERENCE))
    # the reference package imports optional deps at module scope; stub
    # the ones absent here so the oracle models stay importable
    import types

    stubs = {}

    import importlib.machinery

    def _stub(name):
        if name in sys.modules:
            return
        mod = types.ModuleType(name)
        mod.__path__ = []  # acts as a package for submodule imports

        def _getattr(attr):  # non-dunder attributes resolve to a dummy
            if attr.startswith("__"):
                raise AttributeError(attr)
            return object

        mod.__getattr__ = _getattr
        # transformers probes optional deps via importlib.util.find_spec
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None,
                                                      is_package=True)
        sys.modules[name] = mod
        stubs[name] = mod

    for name in ("lhotse", "lhotse.dataset", "lhotse.dataset.collation",
                 "lhotse.dataset.input_strategies", "lhotse.utils",
                 "torchaudio", "torchaudio.functional",
                 "torchaudio.functional.functional",
                 "torchaudio.models", "parselmouth", "torchcrepe",
                 "torchaudio.transforms", "librosa", "librosa.filters",
                 "librosa.util", "ruamel", "ruamel.yaml", "pyworld",
                 "soundfile", "omegaconf", "omegaconf.listconfig"):
        _stub(name)
    if "numba" not in sys.modules:
        nb = types.ModuleType("numba")
        nb.jit = lambda *a, **k: (lambda f: f)  # passthrough decorator
        nb.__spec__ = importlib.machinery.ModuleSpec("numba", loader=None)
        sys.modules["numba"] = nb
        stubs["numba"] = nb
    yield
    sys.path.remove(str(REFERENCE))
    for name in stubs:
        sys.modules.pop(name, None)


def _shim_old_hf_attention(llama_model, n_outputs=3):
    """Adapt old-HF attention calls (position_ids in, 3-tuple out) to the
    installed transformers LlamaAttention API. ``n_outputs=2`` matches the
    modern LlamaDecoderLayer caller (unpacks ``h, attn_w``) when only the
    rotary wiring needs shimming (position_ids → position_embeddings)."""
    from transformers.models.llama.modeling_llama import LlamaRotaryEmbedding

    rot = LlamaRotaryEmbedding(config=llama_model.layers[0].self_attn.config)

    def _shim(attn):
        orig = attn.forward

        def fwd(hidden_states, attention_mask=None, position_ids=None,
                past_key_value=None, output_attentions=False,
                use_cache=False, **kw):
            if position_ids is None:
                position_ids = torch.arange(hidden_states.shape[1])[None]
            pos_emb = kw.pop("position_embeddings", None)
            if pos_emb is None:
                pos_emb = rot(hidden_states, position_ids)
            kw.pop("past_key_values", None)
            kw.pop("cache_position", None)
            out = orig(hidden_states=hidden_states,
                       attention_mask=attention_mask,
                       position_embeddings=pos_emb,
                       past_key_value=past_key_value, **kw)
            h, w = out[0], out[1] if len(out) > 1 else None
            return (h, w) if n_outputs == 2 else (h, w, None)

        attn.forward = fwd

    for layer in llama_model.layers:
        layer.self_attn.config._attn_implementation = "eager"
        _shim(layer.self_attn)


def _shim_layer_tuple_output(llama_model):
    """Modern LlamaDecoderLayer returns a raw tensor; the reference's
    vendored forward loops index `layer_outputs[0]` (old tuple API). Wrap
    each layer to return a 1-tuple again."""
    for layer in llama_model.layers:
        orig = layer.forward

        def fwd(*a, _orig=orig, **kw):
            out = _orig(*a, **kw)
            return out if isinstance(out, tuple) else (out,)

        layer.forward = fwd


def _hifigan_cfg_torch(resblock="1"):
    hifigan = SimpleNamespace(
        resblock=resblock,
        upsample_rates=[2, 2],
        upsample_kernel_sizes=[4, 4],
        upsample_initial_channel=16,
        resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]] if resblock == "1"
        else [[1, 3], [1, 3]],
    )
    return SimpleNamespace(model=SimpleNamespace(hifigan=hifigan),
                           preprocess=SimpleNamespace(n_mel=8))


class TestWeightNormPrimitives:
    def test_conv1d(self):
        from torch.nn.utils import weight_norm

        import flax.linen as fnn
        import jax
        import jax.numpy as jnp

        from amphion_tpu.utils.convert import torch_weight_norm_to_flax

        torch.manual_seed(0)
        tc = weight_norm(torch.nn.Conv1d(8, 16, 7, padding=3))
        x = torch.randn(1, 8, 20)
        with torch.no_grad():
            ref = tc(x).numpy()
        sd = {k: v.detach().numpy() for k, v in tc.state_dict().items()}
        p = torch_weight_norm_to_flax(sd["weight_g"], sd["weight_v"],
                                      "conv1d", sd["bias"])

        class WN(fnn.Module):
            @fnn.compact
            def __call__(self, x):
                return fnn.WeightNorm(fnn.Conv(16, (7,), padding="SAME"))(x)

        params = {
            "Conv_0": {"kernel": jnp.asarray(p["layer"]["kernel"]),
                       "bias": jnp.asarray(p["layer"]["bias"])},
            "WeightNorm_0": {"Conv_0/kernel/scale": jnp.asarray(p["scale"])},
        }
        out = np.asarray(
            WN().apply({"params": params},
                       jnp.asarray(x.numpy().transpose(0, 2, 1)))
        ).transpose(0, 2, 1)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_convtranspose1d(self):
        from torch.nn.utils import weight_norm

        import flax.linen as fnn
        import jax.numpy as jnp

        from amphion_tpu.utils.convert import torch_weight_norm_to_flax

        torch.manual_seed(1)
        k, s, pad = 4, 2, 1
        tt = weight_norm(torch.nn.ConvTranspose1d(8, 16, k, s, padding=pad))
        x = torch.randn(1, 8, 20)
        with torch.no_grad():
            ref = tt(x).numpy()
        sd = {key: v.detach().numpy() for key, v in tt.state_dict().items()}
        p = torch_weight_norm_to_flax(sd["weight_g"], sd["weight_v"],
                                      "convtranspose1d", sd["bias"])

        class WNT(fnn.Module):
            @fnn.compact
            def __call__(self, x):
                return fnn.WeightNorm(fnn.ConvTranspose(
                    16, (k,), strides=(s,),
                    padding=((k - 1 - pad, k - 1 - (k - s - pad)),)))(x)

        params = {
            "ConvTranspose_0": {"kernel": jnp.asarray(p["layer"]["kernel"]),
                                "bias": jnp.asarray(p["layer"]["bias"])},
            "WeightNorm_0": {
                "ConvTranspose_0/kernel/scale": jnp.asarray(p["scale"])},
        }
        out = np.asarray(
            WNT().apply({"params": params},
                        jnp.asarray(x.numpy().transpose(0, 2, 1)))
        ).transpose(0, 2, 1)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-5)


class TestHiFiGANRoundTrip:
    @pytest.mark.parametrize("resblock", ["1", "2"])
    def test_reference_forward_parity(self, resblock):
        import jax.numpy as jnp

        from amphion_tpu.models.vocoders.hifigan import (HiFiGANConfig,
                                                         HiFiGANGenerator)
        from amphion_tpu.utils.convert import torch_hifigan_to_flax
        from models.vocoders.gan.generator.hifigan import HiFiGAN  # reference

        torch.manual_seed(42)
        tcfg = _hifigan_cfg_torch(resblock)
        ref_model = HiFiGAN(tcfg).eval()
        mel = torch.randn(2, 8, 12)  # (B, n_mel, N)
        with torch.no_grad():
            ref_wav = ref_model(mel).numpy()  # (B, 1, N*4)

        h = tcfg.model.hifigan
        params = torch_hifigan_to_flax(
            {k: v.detach().numpy() for k, v in ref_model.state_dict().items()},
            num_upsamples=len(h.upsample_rates),
            num_kernels=len(h.resblock_kernel_sizes),
            resblock=resblock,
            dilations_per_block=len(h.resblock_dilation_sizes[0]),
        )
        ours = HiFiGANGenerator(HiFiGANConfig(
            resblock=resblock,
            upsample_rates=tuple(h.upsample_rates),
            upsample_kernel_sizes=tuple(h.upsample_kernel_sizes),
            upsample_initial_channel=h.upsample_initial_channel,
            resblock_kernel_sizes=tuple(h.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in h.resblock_dilation_sizes),
            n_mel=8,
        ))
        wav = np.asarray(ours.apply(
            {"params": params}, jnp.asarray(mel.numpy().transpose(0, 2, 1))))
        assert wav.shape == (2, ref_wav.shape[-1])
        np.testing.assert_allclose(wav, ref_wav[:, 0], atol=5e-5)


class TestHFLlamaRoundTrip:
    """hf_llama_to_flax vs transformers LlamaModel (CPU oracle) — proves
    the MaskGCT/Vevo backbone (modules/llama.py) matches HF Llama
    numerics: RoPE convention, GQA, SwiGLU, RMSNorm placement."""

    @pytest.mark.parametrize("kv_heads", [4, 2])  # MHA and GQA
    def test_decoder_hidden_state_parity(self, kv_heads):
        transformers = pytest.importorskip("transformers")
        import jax.numpy as jnp

        from amphion_tpu.modules.llama import LlamaConfig, LlamaDecoder
        from amphion_tpu.utils.convert import hf_llama_to_flax

        hf_cfg = transformers.LlamaConfig(
            vocab_size=50, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=kv_heads, max_position_embeddings=64,
            rms_norm_eps=1e-6, rope_theta=10000.0,
            attn_implementation="eager",
        )
        torch.manual_seed(7)
        hf = transformers.LlamaModel(hf_cfg).eval()
        ids = torch.randint(0, 50, (2, 9))
        with torch.no_grad():
            ref = hf(ids).last_hidden_state.numpy()
            emb = hf.embed_tokens(ids).numpy()

        sd = {f"model.{k}": v.detach().numpy()
              for k, v in hf.state_dict().items()}
        params = hf_llama_to_flax(sd, num_layers=2)["decoder"]
        ours = LlamaDecoder(LlamaConfig(
            hidden_size=32, num_layers=2, num_heads=4,
            num_kv_heads=kv_heads, intermediate_size=64,
            rope_theta=10000.0, max_position=64,
        ))
        out = np.asarray(ours.apply({"params": params}, jnp.asarray(emb)))
        np.testing.assert_allclose(out, ref, atol=3e-5)

    def test_kv_cache_decode_matches_full_forward(self):
        transformers = pytest.importorskip("transformers")
        import jax
        import jax.numpy as jnp

        from amphion_tpu.modules.llama import LlamaConfig, LlamaDecoder
        from amphion_tpu.utils.convert import hf_llama_to_flax

        hf_cfg = transformers.LlamaConfig(
            vocab_size=50, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=64,
            rms_norm_eps=1e-6, attn_implementation="eager",
        )
        torch.manual_seed(8)
        hf = transformers.LlamaModel(hf_cfg).eval()
        ids = torch.randint(0, 50, (1, 7))
        with torch.no_grad():
            ref = hf(ids).last_hidden_state.numpy()
            emb = jnp.asarray(hf.embed_tokens(ids).numpy())

        sd = {f"model.{k}": v.detach().numpy()
              for k, v in hf.state_dict().items()}
        params = hf_llama_to_flax(sd, num_layers=2)["decoder"]
        cfg = LlamaConfig(hidden_size=32, num_layers=2, num_heads=4,
                          intermediate_size=64, max_position=64)
        model = LlamaDecoder(cfg)
        # prefill 4 tokens, then decode 3 one at a time through the cache
        caches = model.init_cache(1, 16)
        h, caches = model.apply({"params": params}, emb[:, :4],
                                caches=caches, cache_index=0)
        outs = [np.asarray(h)]
        for i in range(4, 7):
            h, caches = model.apply({"params": params}, emb[:, i:i + 1],
                                    caches=caches, cache_index=i)
            outs.append(np.asarray(h))
        stitched = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(stitched, ref, atol=3e-5)


class TestBigVGANRoundTrip:
    """Reference BigVGAN (AMP blocks + Snake/SnakeBeta + anti-aliased
    resampling) vs ours through converted weights — also validates the
    Kaiser up/down filters and snake parameterizations numerically."""

    @pytest.mark.parametrize("activation", ["snakebeta", "snake"])
    def test_reference_forward_parity(self, activation):
        import jax.numpy as jnp

        from amphion_tpu.models.vocoders.bigvgan import (BigVGANConfig,
                                                         BigVGANGenerator)
        from amphion_tpu.utils.convert import torch_bigvgan_to_flax
        from models.vocoders.gan.generator.bigvgan import \
            BigVGAN as RefBigVGAN

        bigvgan = SimpleNamespace(
            resblock="1",
            upsample_rates=[2, 2],
            upsample_kernel_sizes=[4, 4],
            upsample_initial_channel=16,
            resblock_kernel_sizes=[3, 5],
            resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
            activation=activation,
            snake_logscale=True,
        )
        tcfg = SimpleNamespace(model=SimpleNamespace(bigvgan=bigvgan),
                               preprocess=SimpleNamespace(n_mel=8))
        torch.manual_seed(3)
        ref_model = RefBigVGAN(tcfg).eval()
        # random snake params so the test is not trivially at-init
        with torch.no_grad():
            for n, p in ref_model.named_parameters():
                if n.endswith(("alpha", "beta")):
                    p.copy_(torch.randn_like(p) * 0.3)
        mel = torch.randn(2, 8, 12)
        with torch.no_grad():
            ref_wav = ref_model(mel).numpy()

        params = torch_bigvgan_to_flax(
            {k: v.detach().numpy() for k, v in ref_model.state_dict().items()},
            num_upsamples=2, num_kernels=2,
            resblock_kernel_sizes=(3, 5), dilations_per_block=3,
            snakebeta=(activation == "snakebeta"),
        )
        ours = BigVGANGenerator(BigVGANConfig(
            n_mel=8, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
            upsample_initial_channel=16, resblock_kernel_sizes=(3, 5),
            resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
            activation=activation, snake_logscale=True,
        ))
        wav = np.asarray(ours.apply(
            {"params": params}, jnp.asarray(mel.numpy().transpose(0, 2, 1))))
        assert wav.shape == (2, ref_wav.shape[-1])
        np.testing.assert_allclose(wav, ref_wav[:, 0], atol=2e-4)


class TestAmphionCodecRoundTrip:
    """Reference AmphionCodec encoder/decoder conv stacks vs ours through
    converted weights (the MaskGCT acoustic codec; quantizer excluded —
    compared at the latent boundary). Also exercises the asymmetric
    odd-stride transposed-conv padding (stride 5)."""

    def test_encoder_parity(self):
        import jax.numpy as jnp

        from amphion_tpu.models.codec.amphion_codec import (CodecConfig,
                                                            CodecEncoder)
        from amphion_tpu.utils.convert import torch_codec_encoder_to_flax
        from models.codec.amphion_codec.codec import \
            CodecEncoder as RefEncoder

        torch.manual_seed(5)
        ref = RefEncoder(d_model=4, up_ratios=[2, 5], out_channels=8).eval()
        with torch.no_grad():
            for n, p in ref.named_parameters():
                if n.endswith("alpha"):
                    p.copy_(torch.rand_like(p) + 0.5)
        x = torch.randn(2, 1, 40)
        with torch.no_grad():
            ref_z = ref(x).numpy()  # (B, out, T/10)

        params = torch_codec_encoder_to_flax(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()},
            strides=(2, 5))
        ours = CodecEncoder(CodecConfig(
            sample_rate=8000, encoder_dim=4, latent_dim=8, decoder_dim=4,
            strides=(2, 5), num_quantizers=2, codebook_size=16,
            codebook_dim=4))
        z = np.asarray(ours.apply({"params": params},
                                  jnp.asarray(x.numpy()[:, 0])))
        # ours is NLC
        assert z.shape == (2, ref_z.shape[2], 8)
        np.testing.assert_allclose(z.transpose(0, 2, 1), ref_z, atol=1e-4)

    def test_decoder_parity(self):
        import jax.numpy as jnp

        from amphion_tpu.models.codec.amphion_codec import (CodecConfig,
                                                            CodecDecoder)
        from amphion_tpu.utils.convert import torch_codec_decoder_to_flax
        from models.codec.amphion_codec.codec import \
            CodecDecoder as RefDecoder

        torch.manual_seed(6)
        ref = RefDecoder(in_channels=8, upsample_initial_channel=16,
                         up_ratios=[5, 2], num_quantizers=2,
                         codebook_size=16, codebook_dim=4,
                         quantizer_type="fvq").eval()
        with torch.no_grad():
            for n, p in ref.named_parameters():
                if n.endswith("alpha") and "quantizer" not in n:
                    p.copy_(torch.rand_like(p) + 0.5)
        z = torch.randn(2, 8, 4)
        with torch.no_grad():
            ref_wav = ref(z, vq=False).numpy()

        params = torch_codec_decoder_to_flax(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()},
            up_ratios=(5, 2))
        ours = CodecDecoder(CodecConfig(
            sample_rate=8000, encoder_dim=4, latent_dim=8, decoder_dim=4,
            strides=(2, 5), num_quantizers=2, codebook_size=16,
            codebook_dim=4))
        wav = np.asarray(ours.apply(
            {"params": params}, jnp.asarray(z.numpy().transpose(0, 2, 1))))
        assert wav.shape == (2, ref_wav.shape[-1])
        np.testing.assert_allclose(wav, ref_wav[:, 0], atol=1e-4)


class TestDiffLlamaRoundTrip:
    """Reference MaskGCT DiffLlama (adaptive-RMSNorm NAR Llama) vs our
    adaptive LlamaEncoder through converted weights — the flagship
    MaskGCT T2S/S2A backbone. Covers the adaLN parameterization
    (scale-only Linear on the diffusion-step embedding), the cond-add
    input path, and the bidirectional mask."""

    def test_reference_forward_parity(self):
        import jax.numpy as jnp

        from amphion_tpu.modules.llama import LlamaConfig, LlamaEncoder
        from amphion_tpu.utils.convert import diff_llama_to_flax
        from models.tts.maskgct.llama_nar import DiffLlama

        torch.manual_seed(11)
        hidden, heads, layers = 32, 4, 2
        ref = DiffLlama(hidden_size=hidden, num_heads=heads,
                        num_layers=layers).eval()
        # the vendored layer targets the old HF attention API
        # (position_ids in, 3-tuple out); shim it onto the installed
        # transformers: compute rotary embeddings and pad the return
        from transformers.models.llama.modeling_llama import \
            LlamaRotaryEmbedding

        rot = LlamaRotaryEmbedding(config=ref.layers[0].self_attn.config)

        def _shim(attn):
            orig = attn.forward

            def fwd(hidden_states, attention_mask=None, position_ids=None,
                    past_key_value=None, output_attentions=False,
                    use_cache=False, **kw):
                pos_emb = rot(hidden_states, position_ids)
                out = orig(hidden_states=hidden_states,
                           attention_mask=attention_mask,
                           position_embeddings=pos_emb,
                           past_key_value=past_key_value, **kw)
                h, w = out[0], out[1] if len(out) > 1 else None
                return h, w, None

            attn.forward = fwd

        for layer in ref.layers:
            layer.self_attn.config._attn_implementation = "eager"
            _shim(layer.self_attn)
        # randomize the adaLN projections away from identity-at-init
        with torch.no_grad():
            for n, p in ref.named_parameters():
                if "to_weight" in n:
                    p.copy_(torch.randn_like(p) * 0.2)
        b, t = 2, 6
        x = torch.randn(b, t, hidden)
        cond = torch.randn(b, t, hidden)
        step = torch.tensor([3.0, 7.0])
        mask = torch.ones(b, t)
        with torch.no_grad():
            ref_out = ref(x, step, cond, mask).numpy()
            cond_emb = ref.cond_mlp(cond)
            dstep = ref.diff_step_mlp(
                ref.diff_step_embedding(step)).numpy()
            x_in = (x + cond_emb).numpy()

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = diff_llama_to_flax(sd, num_layers=layers)
        cfg = LlamaConfig(
            hidden_size=hidden, num_layers=layers, num_heads=heads,
            intermediate_size=4 * hidden, adaptive=True, max_position=64,
        )
        # 1) bare encoder fed the precomputed cond/diff-step embeddings
        enc = LlamaEncoder(cfg)
        out = np.asarray(enc.apply(
            {"params": params["encoder"]}, jnp.asarray(x_in),
            cond=jnp.asarray(dstep), mask=jnp.ones((b, t), bool)))
        np.testing.assert_allclose(out, ref_out, atol=5e-5)
        # 2) full DiffLlamaEncoder wrapper: raw (x, t, cond) in
        from amphion_tpu.modules.llama import DiffLlamaEncoder

        wrapper = DiffLlamaEncoder(cfg)
        out2 = np.asarray(wrapper.apply(
            {"params": params}, jnp.asarray(x.numpy()),
            jnp.asarray(step.numpy()), jnp.asarray(cond.numpy()),
            mask=jnp.ones((b, t), bool)))
        np.testing.assert_allclose(out2, ref_out, atol=5e-5)


class TestVocosRoundTrip:
    """Reference Vocos (ConvNeXt backbone + ISTFT head, the Vevo vocoder)
    vs ours through converted weights — covers the 'same'-padding ISTFT
    and the exp/clip magnitude head."""

    def test_reference_forward_parity(self):
        import jax.numpy as jnp

        from amphion_tpu.models.vocoders.vocos import (VocosConfig,
                                                       VocosGenerator)
        from amphion_tpu.utils.convert import torch_vocos_to_flax
        from models.codec.amphion_codec.vocos import Vocos as RefVocos

        torch.manual_seed(9)
        ref = RefVocos(input_channels=8, dim=16, intermediate_dim=32,
                       num_layers=2, n_fft=16, hop_size=4,
                       padding="same").eval()
        mel = torch.randn(2, 8, 12)
        with torch.no_grad():
            ref_wav = ref(mel).numpy()  # (B, 1, T)

        params = torch_vocos_to_flax(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()},
            num_layers=2)
        ours = VocosGenerator(VocosConfig(
            n_mel=8, dim=16, intermediate_dim=32, num_layers=2,
            n_fft=16, hop_size=4))
        wav = np.asarray(ours.apply(
            {"params": params}, jnp.asarray(mel.numpy().transpose(0, 2, 1))))
        assert wav.shape == (2, ref_wav.shape[-1])
        np.testing.assert_allclose(wav, ref_wav[:, 0], atol=1e-4)


class TestQuantizerRoundTrip:
    """Reference FactorizedVectorQuantize / ResidualVQ vs ours through
    converted weights — indices AND reconstructed latents must match
    (l2-normalized lookup with raw codebook values, the MaskGCT acoustic
    codec configuration)."""

    def test_fvq_indices_and_values(self):
        import jax.numpy as jnp

        from amphion_tpu.modules.quantize import FactorizedVectorQuantize
        from amphion_tpu.utils.convert import torch_fvq_to_flax
        from models.codec.amphion_codec.quantize import \
            FactorizedVectorQuantize as RefFVQ

        torch.manual_seed(13)
        ref = RefFVQ(input_dim=16, codebook_size=32, codebook_dim=8,
                     commitment=0.25, codebook_loss_weight=1.0,
                     use_l2_normlize=True).eval()
        z = torch.randn(2, 16, 10)
        with torch.no_grad():
            zq_ref, _, _, idx_ref, _ = ref(z)

        params = torch_fvq_to_flax(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()})
        ours = FactorizedVectorQuantize(
            codebook_size=32, codebook_dim=8, input_dim=16,
            use_l2_normlize=True)
        out, idx, _ = ours.apply(
            {"params": params}, jnp.asarray(z.numpy().transpose(0, 2, 1)))
        np.testing.assert_array_equal(np.asarray(idx), idx_ref.numpy())
        np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1),
                                   zq_ref.numpy(), atol=2e-5)

    def test_rvq_decode_from_codes(self):
        import jax.numpy as jnp

        from amphion_tpu.modules.quantize import ResidualVQ
        from amphion_tpu.utils.convert import torch_residual_vq_to_flax
        from models.codec.amphion_codec.quantize import \
            ResidualVQ as RefRVQ

        torch.manual_seed(14)
        ref = RefRVQ(input_dim=16, num_quantizers=3, codebook_size=32,
                     codebook_dim=8, quantizer_type="fvq",
                     quantizer_dropout=0.0, use_l2_normlize=True).eval()
        codes = torch.randint(0, 32, (3, 2, 10))
        with torch.no_grad():
            emb_ref = ref.vq2emb(codes).numpy()  # (B, D, T)

        params = torch_residual_vq_to_flax(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()},
            num_quantizers=3, prefix="")
        ours = ResidualVQ(num_quantizers=3, codebook_size=32,
                          codebook_dim=8, input_dim=16,
                          quantizer_type="fvq")
        emb = ours.apply({"params": params}, jnp.asarray(codes.numpy()),
                         method=ResidualVQ.decode)
        np.testing.assert_allclose(np.asarray(emb).transpose(0, 2, 1),
                                   emb_ref, atol=2e-5)


class TestMaskGCTModelsRoundTrip:
    """Full MaskGCT T2S / S2A model conversion: reference models with
    random weights, deterministic masked-forward comparison (embeddings +
    backbone + heads; the samplers differ only in RNG plumbing)."""

    def test_t2s_masked_forward_parity(self):
        import flax.linen as fnn
        import jax.numpy as jnp

        from amphion_tpu.models.tts.maskgct.maskgct import (MaskGCTT2S,
                                                            T2SConfig)
        from amphion_tpu.utils.convert import maskgct_t2s_to_flax
        from models.tts.maskgct.maskgct_t2s import MaskGCT_T2S

        torch.manual_seed(21)
        hidden, heads, layers, vocab = 32, 4, 2, 24
        ref = MaskGCT_T2S(hidden_size=hidden, num_heads=heads,
                          num_layers=layers, cond_codebook_size=vocab).eval()
        _shim_old_hf_attention(ref.diff_estimator)
        with torch.no_grad():
            for n, p in ref.named_parameters():
                if "to_weight" in n:
                    p.copy_(torch.randn_like(p) * 0.2)

        b, t_len, lp = 2, 6, 3
        seq = torch.randint(0, vocab, (b, t_len))
        mask = torch.zeros(b, t_len, dtype=torch.bool)
        mask[:, 2:] = True
        phone_id = torch.randint(0, 100, (b, 4))
        tvec = torch.tensor([0.3, 0.7])
        with torch.no_grad():
            # reference composition (mirrors its reverse_diffusion inner step)
            xt = torch.where(mask[..., None], ref.mask_emb.weight[0],
                             ref.cond_emb(seq))
            phone_embedding = ref.phone_emb(phone_id)
            embeds = ref.diff_estimator(
                xt, tvec, torch.ones(b, t_len),
                phone_embedding=phone_embedding,
                phone_mask=torch.ones(b, 4))
            ref_logits = ref.to_logit(embeds).numpy()

        params = maskgct_t2s_to_flax(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()},
            num_layers=layers)
        ours = MaskGCTT2S(T2SConfig(
            hidden=hidden, num_layers=layers, num_heads=heads,
            codebook_size=vocab, phone_vocab=1024, max_position=64))

        def fwd(mdl):
            x_emb = jnp.where(jnp.asarray(mask.numpy())[..., None],
                              mdl.mask_emb[None, None, :],
                              mdl.cond_emb(jnp.asarray(seq.numpy())))
            phone_emb = mdl.phone_emb(jnp.asarray(phone_id.numpy()))
            h = mdl.estimate(x_emb, jnp.asarray(tvec.numpy()),
                             jnp.ones((b, t_len)), phone_emb,
                             jnp.ones((b, 4)))
            return mdl.to_logit(h)

        logits = np.asarray(fnn.apply(fwd, ours)({"params": params}))
        np.testing.assert_allclose(logits, ref_logits, atol=1e-4)

    def test_s2a_masked_forward_parity(self):
        import flax.linen as fnn
        import jax.numpy as jnp

        from amphion_tpu.models.tts.maskgct.maskgct import (MaskGCTS2A,
                                                            S2AConfig)
        from amphion_tpu.utils.convert import maskgct_s2a_to_flax
        from models.tts.maskgct.maskgct_s2a import MaskGCT_S2A

        torch.manual_seed(22)
        hidden, heads, layers, q_n, vocab, sem_vocab = 32, 4, 2, 3, 16, 20
        ref = MaskGCT_S2A(num_quantizer=q_n, hidden_size=hidden,
                          num_layers=layers, num_heads=heads,
                          codebook_size=vocab,
                          cond_codebook_size=sem_vocab).eval()
        _shim_old_hf_attention(ref.diff_estimator)
        with torch.no_grad():
            for n, p in ref.named_parameters():
                if "to_weight" in n:
                    p.copy_(torch.randn_like(p) * 0.2)

        b, t_len = 2, 6
        layer = 1  # target RVQ layer
        tokens = torch.randint(0, vocab, (b, t_len, q_n))
        mask = torch.zeros(b, t_len, dtype=torch.bool)
        mask[:, 3:] = True
        is_prompt = torch.zeros(b, t_len, dtype=torch.bool)
        is_prompt[:, :2] = True
        sem_ids = torch.randint(0, sem_vocab, (b, t_len))
        tvec = torch.tensor([0.4, 0.6])
        with torch.no_grad():
            mask_tok = ref.mask_emb.weight[0]
            xt = torch.zeros(b, t_len, hidden)
            for q in range(q_n):
                emb_q = ref.token_emb[q](tokens[:, :, q])
                if q < layer:
                    xt = xt + emb_q
                elif q == layer:
                    xt = xt + torch.where(mask[..., None], mask_tok, emb_q)
                else:
                    xt = xt + torch.where(is_prompt[..., None], emb_q,
                                          mask_tok.expand_as(emb_q))
            cond = ref.cond_emb(sem_ids) + ref.layer_emb(
                torch.tensor([layer]))[None, 0]
            embeds = ref.diff_estimator(xt, tvec, cond, torch.ones(b, t_len))
            ref_logits = ref.to_logits[layer](embeds).numpy()

        params = maskgct_s2a_to_flax(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()},
            num_layers=layers, num_quantizers=q_n)
        ours = MaskGCTS2A(S2AConfig(
            hidden=hidden, num_layers=layers, num_heads=heads,
            codebook_size=vocab, num_quantizers=q_n,
            cond_codebook_size=sem_vocab, max_position=64))

        tokens_all = jnp.asarray(tokens.numpy().transpose(0, 2, 1))  # (B,Q,T)
        layer_b = jnp.full((b,), layer, jnp.int32)

        def fwd(mdl):
            x_emb = mdl._xt(tokens_all, layer_b, jnp.asarray(mask.numpy()),
                            jnp.asarray(is_prompt.numpy()))
            cond = mdl._cond_of(jnp.asarray(sem_ids.numpy())) \
                + mdl.layer_emb(layer_b)[:, None, :]
            h = mdl.backbone(x_emb, jnp.asarray(tvec.numpy()), cond,
                             mask=jnp.ones((b, t_len)))
            return mdl._layer_logits(h, layer_b)

        logits = np.asarray(fnn.apply(fwd, ours)({"params": params}))
        np.testing.assert_allclose(logits, ref_logits, atol=1e-4)


class TestRepCodecRoundTrip:
    """Reference RepCodec (MaskGCT semantic codec: Vocos backbones + RVQ)
    vs our style='vocos' RepCodec through converted weights — tokens exact,
    reconstruction to 1e-4. Completes the MaskGCT checkpoint chain."""

    def test_forward_and_tokens(self):
        import jax.numpy as jnp

        from amphion_tpu.models.codec.repcodec import (RepCodec,
                                                       RepCodecConfig)
        from amphion_tpu.utils.convert import repcodec_to_flax
        from models.codec.kmeans.repcodec_model import RepCodec as RefRepCodec

        torch.manual_seed(31)
        ref = RefRepCodec(codebook_size=32, hidden_size=24, codebook_dim=8,
                          vocos_dim=16, vocos_intermediate_dim=32,
                          vocos_num_layers=2, num_quantizers=1).eval()
        x = torch.randn(2, 10, 24)
        with torch.no_grad():
            x_rec, _, idx_ref = ref(x)
            vq_id, emb_ref = ref.quantize(x)

        params = repcodec_to_flax(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()},
            num_layers=2, num_quantizers=1)
        ours = RepCodec(RepCodecConfig(
            feature_dim=24, hidden=16, codebook_size=32, codebook_dim=8,
            num_blocks=2, style="vocos", vocos_intermediate_dim=32,
            num_quantizers=1))
        recon, tokens, _ = ours.apply({"params": params},
                                      jnp.asarray(x.numpy()))
        np.testing.assert_array_equal(np.asarray(tokens), vq_id.numpy())
        np.testing.assert_allclose(np.asarray(recon), x_rec.numpy(),
                                   atol=1e-4)
        # decode_tokens matches the quantized embedding path
        lat = ours.apply({"params": params}, jnp.asarray(tokens),
                         method=RepCodec.decode_tokens)
        # ref quantize() returns (B, T, D) — same layout as ours
        np.testing.assert_allclose(np.asarray(lat), emb_ref.numpy(),
                                   atol=2e-5)


class TestVITSRoundTrip:
    """Full SynthesizerTrn oracle round trips (ref models/tts/vits/vits.py:155):
    text encoder with padded batches, deterministic zero-noise infer through
    SDP-reverse → flow-reverse → HiFiGAN_vits, and voice conversion."""

    def _ref_model(self, n_speakers=0, gin=0, use_sdp=True, seed=7):
        from models.tts.vits.vits import SynthesizerTrn

        torch.manual_seed(seed)
        m = SynthesizerTrn(
            n_vocab=40, spec_channels=33, segment_size=16, inter_channels=16,
            hidden_channels=16, filter_channels=32, n_heads=2, n_layers=2,
            kernel_size=3, p_dropout=0.0, resblock="1",
            resblock_kernel_sizes=[3, 5],
            resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
            upsample_rates=[2, 2], upsample_initial_channel=16,
            upsample_kernel_sizes=[4, 4], n_speakers=n_speakers,
            gin_channels=gin, use_sdp=use_sdp)
        m.eval()
        return m

    def _our_model_and_params(self, ref, n_speakers=0, gin=0, use_sdp=True):
        from amphion_tpu.models.tts.vits.vits import VITS, VITSConfig
        from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig
        from amphion_tpu.utils.convert import torch_vits_to_flax

        cfg = VITSConfig(
            num_phones=40, spec_channels=33, inter_channels=16,
            hidden_channels=16, filter_channels=32, n_heads=2, n_layers=2,
            kernel_size=3, n_speakers=n_speakers, gin_channels=gin,
            use_sdp=use_sdp, segment_size=16,
            decoder=HiFiGANConfig(
                resblock="1", upsample_rates=(2, 2),
                upsample_kernel_sizes=(4, 4), upsample_initial_channel=16,
                resblock_kernel_sizes=(3, 5),
                resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)), n_mel=16))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = torch_vits_to_flax(
            sd, n_layers=2, posterior_wn_layers=16, n_flows=4,
            flow_wn_layers=4, num_upsamples=2, num_kernels=2,
            resblock="1", use_sdp=use_sdp, n_speakers=n_speakers)
        return VITS(cfg), params

    def test_text_encoder_padded_parity(self):
        import jax.numpy as jnp

        from amphion_tpu.models.tts.vits.vits import VITS

        ref = self._ref_model()
        model, params = self._our_model_and_params(ref)
        torch.manual_seed(1)
        phones = torch.randint(0, 40, (2, 12))
        lengths = torch.tensor([12, 8])
        phones[1, 8:] = 0
        with torch.no_grad():
            x_t, m_t, logs_t, mask_t = ref.enc_p(phones, lengths)

        mask = jnp.asarray((torch.arange(12)[None] < lengths[:, None]).float().numpy())
        x_j, m_j, logs_j = model.apply(
            {"params": params}, jnp.asarray(phones.numpy()), mask,
            method=lambda mdl, p, msk: mdl.text_encoder(p, msk))
        # torch returns NCT; ours NLC. Compare only valid positions
        mask_np = np.asarray(mask)[..., None]
        np.testing.assert_allclose(
            np.asarray(x_j) * mask_np,
            x_t.transpose(1, 2).numpy() * mask_np, atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(m_j) * mask_np,
            m_t.transpose(1, 2).numpy() * mask_np, atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(logs_j) * mask_np,
            logs_t.transpose(1, 2).numpy() * mask_np, atol=3e-5)

    def test_infer_parity_sdp(self):
        """Zero-noise end-to-end infer: text → SDP reverse durations →
        length regulation → flow reverse → waveform."""
        import jax
        import jax.numpy as jnp

        from amphion_tpu.models.tts.vits.vits import VITS

        ref = self._ref_model(use_sdp=True)
        model, params = self._our_model_and_params(ref, use_sdp=True)
        torch.manual_seed(2)
        phones = torch.randint(0, 40, (1, 11))
        with torch.no_grad():
            out = ref.infer(phones, torch.tensor([11]),
                            noise_scale=0.0, noise_scale_w=0.0)
        y_len = int(out["mask"].sum())

        mask = jnp.ones((1, 11))
        wav, frame_mask, w_ceil = model.apply(
            {"params": params}, jnp.asarray(phones.numpy()), mask,
            jax.random.key(0), method=VITS.infer,
            noise_scale=0.0, noise_scale_w=0.0, max_frames=y_len)
        assert int(jnp.sum(frame_mask)) == y_len
        np.testing.assert_allclose(
            np.asarray(wav), out["y_hat"][:, 0].numpy(), atol=2e-4)

    def test_voice_conversion_parity(self):
        """Posterior (mean) → flow fwd (src) → flow reverse (tgt) → decode,
        with speaker conditioning through every WN cond layer."""
        import jax.numpy as jnp

        from amphion_tpu.models.tts.vits.vits import VITS

        ref = self._ref_model(n_speakers=4, gin=8, use_sdp=False, seed=9)
        model, params = self._our_model_and_params(
            ref, n_speakers=4, gin=8, use_sdp=False)
        torch.manual_seed(3)
        spec = torch.randn(1, 33, 10)
        orig_randn = torch.randn_like
        torch.randn_like = lambda t, **kw: torch.zeros_like(t)
        try:
            with torch.no_grad():
                o_t, _, _ = ref.voice_conversion(
                    spec, torch.tensor([10]),
                    torch.tensor([1]), torch.tensor([2]))
        finally:
            torch.randn_like = orig_randn

        wav = model.apply(
            {"params": params}, jnp.asarray(spec.transpose(1, 2).numpy()),
            jnp.ones((1, 10)), jnp.asarray([1]), jnp.asarray([2]),
            method=VITS.voice_conversion)
        np.testing.assert_allclose(
            np.asarray(wav), o_t[:, 0].numpy(), atol=2e-4)

    def test_flow_forward_padded_parity(self):
        """Residual-coupling flow forward under padding (mask semantics of
        the WN stack), with speaker conditioning."""
        import jax.numpy as jnp

        from amphion_tpu.models.tts.vits.vits import VITS

        ref = self._ref_model(n_speakers=4, gin=8, use_sdp=False, seed=11)
        model, params = self._our_model_and_params(
            ref, n_speakers=4, gin=8, use_sdp=False)
        torch.manual_seed(4)
        z = torch.randn(2, 16, 9)
        lengths = torch.tensor([9, 6])
        mask_t = (torch.arange(9)[None] < lengths[:, None]).float()
        z = z * mask_t[:, None]
        g = ref.emb_g(torch.tensor([1, 3])).unsqueeze(-1)
        with torch.no_grad():
            zp_t = ref.flow(z, mask_t.unsqueeze(1), g=g)

        zp_j = model.apply(
            {"params": params}, jnp.asarray(z.transpose(1, 2).numpy()),
            jnp.asarray(mask_t.numpy()), jnp.asarray([1, 3]),
            method=lambda mdl, zz, msk, sid: mdl.flow(
                zz, msk, g=mdl._speaker(sid))[0])
        np.testing.assert_allclose(
            np.asarray(zp_j), zp_t.transpose(1, 2).numpy(), atol=3e-5)


class TestVevoARRoundTrip:
    """Vevo AutoregressiveTransformer oracle round trips
    (ref models/vc/autoregressive_transformer/ar_model.py:14): unified-vocab
    packing protocol, teacher-forced logits + HF shifted-CE loss, and the
    global style encoder."""

    def _ref(self, use_global=False, seed=5):
        from models.vc.autoregressive_transformer.ar_model import (
            AutoregressiveTransformer,
        )

        torch.manual_seed(seed)
        cfg = SimpleNamespace(
            input_vocab_size=8, output_vocab_size=16, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
            use_global_style_encoder=use_global,
            global_style_encoder=SimpleNamespace(
                input_dim=8, hidden_size=16, num_attention_heads=2,
                num_hidden_layers=2))
        m = AutoregressiveTransformer(cfg=cfg)
        m.eval()
        return m

    def _ours(self, ref, use_global=False):
        from amphion_tpu.models.vc.ar_transformer import (
            ARTransformer,
            ARTransformerConfig,
        )
        from amphion_tpu.utils.convert import vevo_ar_to_flax

        cfg = ARTransformerConfig(
            input_vocab=8, output_vocab=16, hidden=32, intermediate=64,
            num_layers=2, num_heads=4, use_global_timbre=use_global,
            timbre_input_dim=8, timbre_hidden=16, timbre_heads=2,
            timbre_layers=2)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = vevo_ar_to_flax(sd, num_layers=2,
                                 timbre_layers=2 if use_global else 0)
        return ARTransformer(cfg), params

    def test_forward_and_loss_parity(self):
        import jax.numpy as jnp

        from amphion_tpu.models.vc.ar_transformer import ARTransformer

        ref = self._ref(use_global=False)
        model, params = self._ours(ref, use_global=False)
        torch.manual_seed(6)
        inp = torch.randint(0, 8, (2, 5))
        out = torch.randint(0, 16, (2, 7))
        im = torch.ones(2, 5, dtype=torch.long)
        om = torch.ones(2, 7, dtype=torch.long)
        im[1, 3:] = 0
        om[1, 5:] = 0
        inp = inp * im
        out = out * om
        with torch.no_grad():
            ref_out = ref(inp, im, out, om)

        logits, out_ids, out_m = model.apply(
            {"params": params}, jnp.asarray(inp.numpy()),
            jnp.asarray(im.numpy()).astype(jnp.float32),
            jnp.asarray(out.numpy()),
            jnp.asarray(om.numpy()).astype(jnp.float32),
            method=ARTransformer.forward)
        ref_logits = ref_out.logits.numpy()
        assert logits.shape == ref_logits.shape
        # compare the positions that carry loss labels (the output block)
        lo = out_ids.shape[1]
        np.testing.assert_allclose(
            np.asarray(logits)[:, -lo - 1:-1] * np.asarray(out_m)[..., None],
            ref_logits[:, -lo - 1:-1] * np.asarray(out_m)[..., None],
            atol=3e-4)

        loss, aux = model.apply(
            {"params": params}, jnp.asarray(inp.numpy()),
            jnp.asarray(im.numpy()).astype(jnp.float32),
            jnp.asarray(out.numpy()),
            jnp.asarray(om.numpy()).astype(jnp.float32),
            method=ARTransformer.loss)
        np.testing.assert_allclose(float(loss), float(ref_out.loss), atol=2e-5)

    def test_global_style_encoder_parity(self):
        import jax.numpy as jnp

        ref = self._ref(use_global=True, seed=8)
        model, params = self._ours(ref, use_global=True)
        _shim_old_hf_attention(ref.global_encoder, n_outputs=2)
        _shim_layer_tuple_output(ref.global_encoder)
        torch.manual_seed(9)
        mels = torch.randn(2, 12, 8)
        mmask = torch.ones(2, 12)
        with torch.no_grad():
            style_t = ref.global_encoder(mels, mmask, shuffle_for_x=False,
                                         use_cache=False)

        style_j = model.apply(
            {"params": params}, jnp.asarray(mels.numpy()),
            jnp.asarray(mmask.numpy()),
            method=lambda mdl, m, msk: mdl.timbre_encoder(m, msk))
        np.testing.assert_allclose(np.asarray(style_j), style_t.numpy(),
                                   atol=3e-5)

    def test_full_forward_with_style_parity(self):
        import jax.numpy as jnp

        from amphion_tpu.models.vc.ar_transformer import ARTransformer

        ref = self._ref(use_global=True, seed=10)
        model, params = self._ours(ref, use_global=True)
        _shim_old_hf_attention(ref.global_encoder, n_outputs=2)
        _shim_layer_tuple_output(ref.global_encoder)
        # bypass the training-time shuffle for a deterministic oracle
        orig_fwd = ref.global_encoder.forward
        ref.global_encoder.forward = (
            lambda x, x_mask, **kw: orig_fwd(x, x_mask, shuffle_for_x=False,
                                             use_cache=False))
        torch.manual_seed(11)
        inp = torch.randint(0, 8, (2, 4))
        out = torch.randint(0, 16, (2, 6))
        im = torch.ones(2, 4, dtype=torch.long)
        om = torch.ones(2, 6, dtype=torch.long)
        mels = torch.randn(2, 10, 8)
        mmask = torch.ones(2, 10)
        with torch.no_grad():
            ref_out = ref(inp, im, out, om, mels=mels, mels_mask=mmask)

        loss, aux = model.apply(
            {"params": params}, jnp.asarray(inp.numpy()),
            jnp.asarray(im.numpy()).astype(jnp.float32),
            jnp.asarray(out.numpy()),
            jnp.asarray(om.numpy()).astype(jnp.float32),
            jnp.asarray(mels.numpy()), jnp.asarray(mmask.numpy()),
            method=ARTransformer.loss)
        np.testing.assert_allclose(float(loss), float(ref_out.loss), atol=3e-5)

    def test_greedy_decode_protocol_parity(self):
        """Greedy KV-cache decode matches HF `generate(do_sample=False)`
        through the reference prompt protocol ([IN_BOS, inputs, IN_EOS,
        OUT_BOS, prompt outputs])."""
        import jax
        import jax.numpy as jnp

        from amphion_tpu.models.vc.ar_transformer import (
            ARTransformer,
            ar_transformer_generate,
        )

        ref = self._ref(use_global=False, seed=12)
        model, params = self._ours(ref, use_global=False)
        torch.manual_seed(13)
        inp = torch.randint(0, 8, (1, 5))
        prompt_out = torch.randint(0, 16, (1, 3))
        c = model.cfg
        ids = torch.cat([
            torch.tensor([[c.input_bos_id]]), inp + c.output_vocab,
            torch.tensor([[c.input_eos_id]]),
            torch.tensor([[c.bos_id]]), prompt_out,
        ], dim=1)
        max_new = 6
        with torch.no_grad():
            gen = ref.model.generate(
                ids, do_sample=False, max_new_tokens=max_new,
                min_new_tokens=max_new, pad_token_id=c.pad_id,
                eos_token_id=None)
        ref_tokens = gen[0, ids.shape[1]:].numpy()

        toks, lens = ar_transformer_generate(
            model, params, jnp.asarray(inp.numpy()), jax.random.key(0),
            max_new=max_new, temperature=0.0,
            prompt_output_tokens=jnp.asarray(prompt_out.numpy()),
            compute_dtype="float32")
        np.testing.assert_array_equal(np.asarray(toks)[0], ref_tokens)


class TestVevoSingARRoundTrip:
    """Vevo1.5/VevoSing AutoregressiveTransformer oracle round trips (ref
    models/svc/autoregressive_transformer/ar_model.py:20): the three-stream
    unified vocab (content ids +style+content_style, style ids
    +content_style, six special tokens) and the
    [content][style][content-style] packing protocol."""

    def _pair(self, seed=21):
        from models.svc.autoregressive_transformer.ar_model import (
            AutoregressiveTransformer as RefAR,
        )

        from amphion_tpu.models.vc.ar_transformer import (
            ARTransformer,
            ARTransformerConfig,
        )
        from amphion_tpu.utils.convert import vevo_ar_to_flax

        torch.manual_seed(seed)
        ref = RefAR(content_vocab_size=8, style_vocab_size=6,
                    content_style_vocab_size=16, hidden_size=32,
                    intermediate_size=64, num_hidden_layers=2,
                    num_attention_heads=4)
        ref.eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = vevo_ar_to_flax(sd, num_layers=2)
        ours = ARTransformer(ARTransformerConfig(
            input_vocab=8, output_vocab=16, style_vocab=6, hidden=32,
            intermediate=64, num_layers=2, num_heads=4))
        # special-token layout must agree exactly with the reference
        c = ours.cfg
        assert c.pad_id == ref.pad_token_id
        assert c.input_bos_id == ref.content_bos_token_id
        assert c.input_eos_id == ref.content_eos_token_id
        assert c.style_bos_id == ref.style_bos_token_id
        assert c.style_eos_id == ref.style_eos_token_id
        assert c.bos_id == ref.content_style_bos_token_id
        assert c.eos_id == ref.content_style_eos_token_id
        assert c.total_vocab == ref.config.vocab_size
        return ref, ours, params

    def test_forward_and_loss_parity_with_style(self):
        import jax.numpy as jnp

        from amphion_tpu.models.vc.ar_transformer import ARTransformer

        ref, ours, params = self._pair()
        torch.manual_seed(22)
        inp = torch.randint(0, 8, (2, 5))
        sty = torch.randint(0, 6, (2, 4))
        out = torch.randint(0, 16, (2, 7))
        im = torch.ones(2, 5, dtype=torch.long)
        sm = torch.ones(2, 4, dtype=torch.long)
        om = torch.ones(2, 7, dtype=torch.long)
        im[1, 3:] = 0
        sm[1, 2:] = 0
        om[1, 5:] = 0
        inp, sty, out = inp * im, sty * sm, out * om
        with torch.no_grad():
            ref_out = ref(inp, im, sty, sm, out, om)

        loss, aux = ours.apply(
            {"params": params}, jnp.asarray(inp.numpy()),
            jnp.asarray(im.numpy()).astype(jnp.float32),
            jnp.asarray(out.numpy()),
            jnp.asarray(om.numpy()).astype(jnp.float32),
            None, None, jnp.asarray(sty.numpy()),
            jnp.asarray(sm.numpy()).astype(jnp.float32),
            method=ARTransformer.loss)
        np.testing.assert_allclose(float(loss), float(ref_out.loss),
                                   atol=3e-5)

    def test_forward_no_style_matches_reference(self):
        import jax.numpy as jnp

        from amphion_tpu.models.vc.ar_transformer import ARTransformer

        ref, ours, params = self._pair(seed=23)
        torch.manual_seed(24)
        inp = torch.randint(0, 8, (2, 5))
        out = torch.randint(0, 16, (2, 6))
        im = torch.ones(2, 5, dtype=torch.long)
        om = torch.ones(2, 6, dtype=torch.long)
        with torch.no_grad():
            ref_out = ref(inp, im, None, None, out, om)
        loss, _ = ours.apply(
            {"params": params}, jnp.asarray(inp.numpy()),
            jnp.asarray(im.numpy()).astype(jnp.float32),
            jnp.asarray(out.numpy()),
            jnp.asarray(om.numpy()).astype(jnp.float32),
            method=ARTransformer.loss)
        np.testing.assert_allclose(float(loss), float(ref_out.loss),
                                   atol=3e-5)

    def test_greedy_decode_with_style_parity(self):
        """Greedy KV-cache decode through the three-block prompt protocol
        matches HF `generate(do_sample=False)`."""
        import jax
        import jax.numpy as jnp

        from amphion_tpu.models.vc.ar_transformer import (
            ar_transformer_generate,
        )

        ref, ours, params = self._pair(seed=25)
        torch.manual_seed(26)
        inp = torch.randint(0, 8, (1, 5))
        sty = torch.randint(0, 6, (1, 4))
        prompt_out = torch.randint(0, 16, (1, 3))
        c = ours.cfg
        ids = torch.cat([
            torch.tensor([[c.input_bos_id]]), inp + c.input_shift,
            torch.tensor([[c.input_eos_id]]),
            torch.tensor([[c.style_bos_id]]), sty + c.output_vocab,
            torch.tensor([[c.style_eos_id]]),
            torch.tensor([[c.bos_id]]), prompt_out,
        ], dim=1)
        max_new = 6
        with torch.no_grad():
            gen = ref.model.generate(
                ids, do_sample=False, max_new_tokens=max_new,
                min_new_tokens=max_new, pad_token_id=c.pad_id,
                eos_token_id=None)
        ref_tokens = gen[0, ids.shape[1]:].numpy()

        toks, lens = ar_transformer_generate(
            ours, params, jnp.asarray(inp.numpy()), jax.random.key(0),
            max_new=max_new, temperature=0.0,
            prompt_output_tokens=jnp.asarray(prompt_out.numpy()),
            style_tokens=jnp.asarray(sty.numpy()),
            compute_dtype="float32")
        np.testing.assert_array_equal(np.asarray(toks)[0], ref_tokens)


class TestVevoFMTRoundTrip:
    """Vevo FlowMatchingTransformer oracle round trips (ref
    models/vc/flow_matching_transformer/fmt_model.py:13 + llama_nar DiffLlama
    with built-in mel in/out MLPs)."""

    def _pair(self, seed=14):
        from models.vc.flow_matching_transformer.fmt_model import (
            FlowMatchingTransformer as RefFMT,
        )

        from amphion_tpu.models.vc.flow_matching_transformer import (
            FlowMatchingTransformer,
            FMTConfig,
        )
        from amphion_tpu.utils.convert import vevo_fmt_to_flax

        torch.manual_seed(seed)
        ref = RefFMT(mel_dim=8, hidden_size=16, num_layers=2, num_heads=2,
                     cond_codebook_size=16, sigma=1e-5)
        ref.eval()
        _shim_old_hf_attention(ref.diff_estimator)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = vevo_fmt_to_flax(sd, num_layers=2)
        ours = FlowMatchingTransformer(FMTConfig(
            token_vocab=16, n_mel=8, hidden=16, num_layers=2, num_heads=2,
            sigma_min=1e-5))
        return ref, ours, params

    def test_estimator_parity(self):
        import jax.numpy as jnp

        ref, ours, params = self._pair()
        torch.manual_seed(15)
        x = torch.randn(2, 12, 8)
        t = torch.rand(2)
        cond = torch.randn(2, 12, 16)
        mask = torch.ones(2, 12)
        with torch.no_grad():
            out_t = ref.diff_estimator(x, t, cond, mask)

        out_j = ours.apply(
            {"params": params}, jnp.asarray(x.numpy()),
            jnp.asarray(t.numpy()), jnp.asarray(cond.numpy()),
            jnp.asarray(mask.numpy()),
            method=lambda mdl, xx, tt, cc, mm: mdl.diff_estimator(
                xx, tt, cc, mask=mm))
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=3e-5)

    def test_reverse_diffusion_parity(self):
        """Full Euler CFG loop from deterministic (zero) initial noise:
        verifies cond_emb, the prompt-prefix protocol, the uncond
        target-only pass, and the CFG std-rescale combine."""
        import jax.numpy as jnp

        from amphion_tpu.models.vc.flow_matching_transformer import (
            FlowMatchingTransformer,
        )

        ref, ours, params = self._pair(seed=16)
        torch.manual_seed(17)
        lp, lt = 4, 6
        prompt = torch.randn(1, lp, 8)
        codes = torch.randint(0, 16, (1, lp + lt))
        orig_randn = torch.randn
        torch.randn = lambda *a, **kw: torch.zeros(*a, **{
            k: v for k, v in kw.items() if k in ("dtype", "device")})
        try:
            with torch.no_grad():
                out_t = ref.reverse_diffusion(
                    cond=ref.cond_emb(codes), prompt=prompt, n_timesteps=4,
                    cfg=1.0, rescale_cfg=0.75)
        finally:
            torch.randn = orig_randn

        xt = jnp.zeros((1, lt, 8))
        h = 1.0 / 4
        for i in range(4):
            t = jnp.full((1,), (i + 0.5) * h)
            flow = ours.apply(
                {"params": params}, xt, t, jnp.asarray(codes.numpy()),
                jnp.asarray(prompt.numpy()), 1.0, 0.75,
                method=FlowMatchingTransformer.flow_eval)
            xt = xt + h * flow
        np.testing.assert_allclose(np.asarray(xt), out_t.numpy(), atol=1e-4)


class TestFACodecRoundTrip:
    """FACodec (NS3) oracle round trips (ref models/codec/ns3_codec/
    facodec.py): encoder conv stack, decoder quantize (factorized RVQ
    branches + timbre transformer), inference decode, vq2emb, redecoder."""

    def _ref_modules(self, seed=21):
        from models.codec.ns3_codec.facodec import (
            FACodecDecoder,
            FACodecEncoder,
        )

        torch.manual_seed(seed)
        enc = FACodecEncoder(ngf=4, up_ratios=(2, 5), out_channels=256).eval()
        dec = FACodecDecoder(
            in_channels=256, upsample_initial_channel=64, up_ratios=(5, 2),
            vq_num_q_c=2, vq_num_q_p=1, vq_num_q_r=3, vq_dim=256,
            codebook_dim=4, codebook_size_prosody=4, codebook_size_content=4,
            codebook_size_residual=4).eval()
        return enc, dec

    def _our_cfg(self):
        from amphion_tpu.models.codec.amphion_codec import CodecConfig

        from amphion_tpu.models.codec.facodec import FACodecConfig

        return FACodecConfig(
            codec=CodecConfig(encoder_dim=4, latent_dim=256, decoder_dim=16,
                              strides=(2, 5)),
            prosody_layers=1, content_layers=2, detail_layers=3,
            codebook_size=16, codebook_dim=4)

    def test_encoder_parity(self):
        import jax.numpy as jnp

        from amphion_tpu.models.codec.facodec import FACodecEncoder
        from amphion_tpu.utils.convert import facodec_encoder_to_flax

        ref, _ = self._ref_modules()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = facodec_encoder_to_flax(sd, up_ratios=(2, 5))
        torch.manual_seed(22)
        x = torch.randn(2, 1, 80) * 0.3
        with torch.no_grad():
            z_t = ref(x)  # (B, D, N)

        ours = FACodecEncoder(ngf=4, up_ratios=(2, 5), out_channels=256)
        z_j = ours.apply({"params": params}, jnp.asarray(x[:, 0].numpy()))
        np.testing.assert_allclose(
            np.asarray(z_j), z_t.transpose(1, 2).numpy(), atol=2e-4)

    def test_decoder_quantize_inference_vq2emb_parity(self):
        import jax.numpy as jnp

        from amphion_tpu.models.codec.facodec import FACodecDecoder
        from amphion_tpu.utils.convert import facodec_decoder_to_flax

        _, ref = self._ref_modules(seed=23)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = facodec_decoder_to_flax(sd, up_ratios=(5, 2))
        torch.manual_seed(24)
        z = torch.randn(2, 256, 8) * 0.5
        with torch.no_grad():
            outs_t, qs_t, _, bufs_t, spk_t = ref(z, vq=True, eval_vq=False)
            audio_t = ref.inference(outs_t, spk_t)
            emb_t = ref.vq2emb(qs_t)

        ours = FACodecDecoder(self._our_cfg())
        zj = jnp.asarray(z.transpose(1, 2).numpy())
        outs_j, codes_j, _, bufs_j, spk_j = ours.apply(
            {"params": params}, zj, method=FACodecDecoder.quantize)
        np.testing.assert_array_equal(np.asarray(codes_j), qs_t.numpy())
        np.testing.assert_allclose(
            np.asarray(outs_j), outs_t.transpose(1, 2).numpy(), atol=3e-5)
        np.testing.assert_allclose(np.asarray(spk_j), spk_t.numpy(), atol=3e-5)

        audio_j = ours.apply({"params": params}, outs_j, spk_j,
                             method=FACodecDecoder.inference)
        np.testing.assert_allclose(
            np.asarray(audio_j), audio_t[:, 0].numpy(), atol=3e-4)

        emb_j = ours.apply({"params": params}, codes_j,
                           method=FACodecDecoder.vq2emb)
        np.testing.assert_allclose(
            np.asarray(emb_j), emb_t.transpose(1, 2).numpy(), atol=3e-5)

    def test_redecoder_parity(self):
        import jax.numpy as jnp

        from models.codec.ns3_codec.facodec import FACodecRedecoder

        from amphion_tpu.models.codec.facodec import (
            FACodecRedecoder as OursRedecoder,
        )
        from amphion_tpu.utils.convert import facodec_redecoder_to_flax

        torch.manual_seed(25)
        ref = FACodecRedecoder(
            in_channels=256, upsample_initial_channel=64, up_ratios=(5, 2),
            vq_num_q_c=2, vq_num_q_p=1, vq_num_q_r=3, vq_dim=256,
            codebook_size_prosody=4, codebook_size_content=4,
            codebook_size_residual=4).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = facodec_redecoder_to_flax(sd, up_ratios=(5, 2))
        torch.manual_seed(26)
        vq = torch.randint(0, 16, (6, 2, 8))
        spk = torch.randn(2, 256)
        # NOTE: the reference Redecoder.forward transposes BEFORE its
        # timbre_norm (facodec.py:755-759), so it LayerNorms the TIME axis
        # and crashes for T != in_channels — a reference bug. Its vq2emb +
        # inference pair is the working path; the oracle covers that
        # composition (which includes the SALN prosody encoder).
        with torch.no_grad():
            emb_t = ref.vq2emb(vq, spk, use_residual=True)  # (B, d, T)
            audio_t = ref.inference(emb_t, spk)

        ours = OursRedecoder(self._our_cfg())
        emb_j = ours.apply(
            {"params": params}, jnp.asarray(vq.numpy()),
            jnp.asarray(spk.numpy()), True,
            method=OursRedecoder.vq2emb)
        np.testing.assert_allclose(
            np.asarray(emb_j), emb_t.transpose(1, 2).numpy(), atol=3e-5)
        audio_j = ours.apply(
            {"params": params}, emb_j, jnp.asarray(spk.numpy()),
            method=OursRedecoder.inference)
        np.testing.assert_allclose(
            np.asarray(audio_j), audio_t[:, 0].numpy(), atol=3e-4)


class TestDiscriminatorRoundTrip:
    """GAN discriminator oracle round trips (ref models/vocoders/gan/
    discriminator/{mpd,msd,mrd}.py): logits + every feature map."""

    def test_mpd_parity(self):
        import jax.numpy as jnp

        from models.vocoders.gan.discriminator.mpd import (
            MultiPeriodDiscriminator as RefMPD,
        )

        from amphion_tpu.models.vocoders.discriminators import (
            MultiPeriodDiscriminator,
        )
        from amphion_tpu.utils.convert import torch_mpd_to_flax

        torch.manual_seed(30)
        cfg = SimpleNamespace(model=SimpleNamespace(mpd=SimpleNamespace(
            mpd_reshapes=[2, 3], discriminator_channel_mult_factor=0.125,
            use_spectral_norm=False)))
        ref = RefMPD(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = torch_mpd_to_flax(sd, num_periods=2)
        torch.manual_seed(31)
        y = torch.randn(2, 1, 300) * 0.3
        with torch.no_grad():
            lr, _, fr, _ = ref(y, y)

        ours = MultiPeriodDiscriminator(periods=(2, 3), channel_mult=0.125)
        lj, fj = ours.apply({"params": params}, jnp.asarray(y[:, 0].numpy()))
        for i in range(2):
            np.testing.assert_allclose(np.asarray(lj[i]), lr[i].numpy(),
                                       atol=3e-5)
            for a, b in zip(fj[i], fr[i]):
                # torch fmaps are NCHW (B, C, T/p, p); ours NHWC
                np.testing.assert_allclose(
                    np.asarray(a), b.permute(0, 2, 3, 1).numpy(), atol=3e-5)

    def test_msd_parity(self):
        import jax.numpy as jnp

        from models.vocoders.gan.discriminator.msd import (
            MultiScaleDiscriminator as RefMSD,
        )

        from amphion_tpu.models.vocoders.discriminators import (
            MultiScaleDiscriminator,
        )
        from amphion_tpu.utils.convert import torch_msd_to_flax

        torch.manual_seed(32)
        ref = RefMSD(SimpleNamespace())
        torch.manual_seed(33)
        y = torch.randn(1, 1, 256) * 0.3
        # settle the spectral-norm power iteration: with freshly-initialized
        # u/v, sigma can be ~1e-4 and 1/sigma amplifies float noise ~1e4x
        ref.train()
        with torch.no_grad():
            for _ in range(20):
                ref(y, y)
        ref.eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = torch_msd_to_flax(sd, num_scales=3)
        with torch.no_grad():
            lr, _, fr, _ = ref(y, y)

        ours = MultiScaleDiscriminator(num_scales=3, channel_mult=1.0)
        lj, fj = ours.apply({"params": params}, jnp.asarray(y[:, 0].numpy()))
        for i in range(3):
            np.testing.assert_allclose(np.asarray(lj[i]), lr[i].numpy(),
                                       atol=2e-4)
            for a, b in zip(fj[i], fr[i]):
                np.testing.assert_allclose(
                    np.asarray(a), b.permute(0, 2, 1).numpy(), atol=2e-4)

    def test_mrd_parity(self):
        import jax.numpy as jnp

        from models.vocoders.gan.discriminator.mrd import (
            MultiResolutionDiscriminator as RefMRD,
        )

        from amphion_tpu.models.vocoders.discriminators import (
            MultiResolutionDiscriminator,
        )
        from amphion_tpu.utils.convert import torch_mrd_to_flax

        torch.manual_seed(34)
        res = [[128, 32, 64], [256, 64, 128], [64, 16, 32]]
        cfg = SimpleNamespace(model=SimpleNamespace(mrd=SimpleNamespace(
            resolutions=res, use_spectral_norm=False, mrd_override=False,
            discriminator_channel_mult_factor=0.25)))
        ref = RefMRD(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = torch_mrd_to_flax(sd, num_resolutions=3)
        torch.manual_seed(35)
        y = torch.randn(1, 1, 512) * 0.3
        with torch.no_grad():
            lr, _, fr, _ = ref(y, y)

        ours = MultiResolutionDiscriminator(
            resolutions=tuple(tuple(r) for r in res), channel_mult=0.25)
        lj, fj = ours.apply({"params": params}, jnp.asarray(y[:, 0].numpy()))
        for i in range(3):
            np.testing.assert_allclose(np.asarray(lj[i]), lr[i].numpy(),
                                       atol=2e-4)
            for a, b in zip(fj[i], fr[i]):
                np.testing.assert_allclose(
                    np.asarray(a), b.permute(0, 2, 3, 1).numpy(), atol=2e-4)


class TestNSFSourceRoundTrip:
    """SineGen + SourceModuleHnNSF oracle (ref modules/neural_source_filter/
    sine_excitation.py:18, nsfhifigan.py:162) on the deterministic path
    (zero initial phase / no noise / all-voiced)."""

    def test_source_module_parity(self):
        import jax
        import jax.numpy as jnp

        from models.vocoders.gan.generator.nsfhifigan import SourceModuleHnNSF

        from amphion_tpu.modules.nsf import (
            SourceModuleHnNSF as OursSource,
            upsample_f0,
        )
        from amphion_tpu.utils.convert import linear_to_dense

        torch.manual_seed(40)
        ref = SourceModuleHnNSF(fs=2400, harmonic_num=3).eval()
        torch.manual_seed(41)
        f0 = torch.rand(2, 24) * 200.0 + 80.0  # all voiced
        upp = 8
        orig_rand, orig_randn_like = torch.rand, torch.randn_like
        torch.rand = lambda *a, **kw: torch.zeros(*a, **{
            k: v for k, v in kw.items() if k in ("dtype", "device")})
        torch.randn_like = lambda t, **kw: torch.zeros_like(t)
        try:
            with torch.no_grad():
                exc_t = ref(f0, upp)  # (B, T*upp, 1)
        finally:
            torch.rand, torch.randn_like = orig_rand, orig_randn_like

        params = {"merge": linear_to_dense(
            ref.l_linear.weight.detach().numpy(),
            ref.l_linear.bias.detach().numpy())}
        ours = OursSource(sample_rate=2400, num_harmonics=3)
        f0_up = upsample_f0(jnp.asarray(f0.numpy()), upp)
        exc_j, uv = ours.apply({"params": {"source": params}["source"]},
                               f0_up, None)
        np.testing.assert_allclose(np.asarray(exc_j), exc_t.numpy(),
                                   atol=2e-4)
        assert np.all(np.asarray(uv) == 1.0)


class TestMelGANRoundTrip:
    def test_forward_parity(self):
        import jax.numpy as jnp

        from models.vocoders.gan.generator.melgan import MelGAN as RefMelGAN

        from amphion_tpu.models.vocoders.melgan import (
            MelGANConfig,
            MelGANGenerator,
        )
        from amphion_tpu.utils.convert import torch_melgan_to_flax

        torch.manual_seed(44)
        cfg = SimpleNamespace(
            model=SimpleNamespace(melgan=SimpleNamespace(
                ratios=[2, 5], ngf=4, n_residual_layers=2)),
            preprocess=SimpleNamespace(n_mel=8))
        ref = RefMelGAN(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = torch_melgan_to_flax(sd, upsample_rates=(2, 5),
                                      n_residual_layers=2)
        torch.manual_seed(45)
        mel = torch.randn(2, 8, 12)
        with torch.no_grad():
            wav_t = ref(mel)

        ours = MelGANGenerator(MelGANConfig(
            n_mel=8, upsample_rates=(2, 5), ngf=4, n_residual_layers=2))
        wav_j = ours.apply({"params": params},
                           jnp.asarray(mel.transpose(1, 2).numpy()))
        np.testing.assert_allclose(np.asarray(wav_j), wav_t[:, 0].numpy(),
                                   atol=2e-4)


class TestWeNetConformerRoundTrip:
    """WeNet conformer-encoder oracle (ref modules/wenet_extractor/
    transformer/encoder.py ConformerEncoder, rel-pos attention WITHOUT the
    Transformer-XL shift, macaron FFNs, layer-norm conv module)."""

    def test_encoder_parity(self):
        import jax.numpy as jnp

        from modules.wenet_extractor.transformer.encoder import (
            ConformerEncoder as RefConformer,
        )

        from amphion_tpu.modules.conformer import (
            ConformerConfig,
            ConformerEncoder,
        )
        from amphion_tpu.utils.convert import wenet_conformer_to_flax

        torch.manual_seed(50)
        ref = RefConformer(
            input_size=16, output_size=32, attention_heads=4,
            linear_units=48, num_blocks=2, dropout_rate=0.0,
            positional_dropout_rate=0.0, attention_dropout_rate=0.0,
            cnn_module_kernel=7, cnn_module_norm="layer_norm",
            input_layer="conv2d", pos_enc_layer_type="rel_pos",
            normalize_before=True, macaron_style=True,
            use_cnn_module=True).eval()
        torch.manual_seed(51)
        x = torch.randn(1, 37, 16)
        with torch.no_grad():
            out_t, mask_t = ref(x, torch.tensor([37]))

        sd = {f"encoder.{k}": v.detach().numpy()
              for k, v in ref.state_dict().items()}
        params = wenet_conformer_to_flax(sd, num_layers=2, hidden=32)
        ours = ConformerEncoder(ConformerConfig(
            input_dim=16, hidden=32, num_layers=2, num_heads=4,
            ffn_hidden=48, conv_kernel=7))
        out_j, sub_mask = ours.apply(
            {"params": params}, jnp.asarray(x.numpy()), jnp.ones((1, 37)))
        assert out_j.shape == tuple(out_t.shape)
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                                   atol=2e-4)


class TestNS2RoundTrip:
    """NaturalSpeech2 oracle round trips (ref models/tts/naturalspeech2/):
    prior encoder (SALN transformer + cross-attn predictors + length
    regulation + pitch bins), WaveNet denoiser, diffusion dxt."""

    def _prior_cfg(self):
        enc = SimpleNamespace(encoder_layer=2, encoder_hidden=16,
                              encoder_head=2, conv_filter_size=32,
                              conv_kernel_size=5, encoder_dropout=0.0,
                              use_cln=True)
        pred = SimpleNamespace(input_size=16, filter_size=16, kernel_size=3,
                               conv_layers=4, cross_attn_per_layer=2,
                               attn_head=2, drop_out=0.0)
        return SimpleNamespace(vocab_size=20, encoder=enc,
                               duration_predictor=pred, pitch_predictor=pred,
                               pitch_min=50.0, pitch_max=1100.0,
                               pitch_bins_num=16)

    def test_prior_encoder_parity(self):
        import jax.numpy as jnp

        from models.tts.naturalspeech2.prior_encoder import (
            PriorEncoder as RefPrior,
        )

        from amphion_tpu.models.tts.naturalspeech2.ns2 import (
            NS2Config,
            PriorEncoder,
        )
        from amphion_tpu.utils.convert import ns2_prior_encoder_to_flax

        torch.manual_seed(60)
        ref = RefPrior(self._prior_cfg()).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = ns2_prior_encoder_to_flax(sd, enc_layers=2,
                                           predictor_layers=4,
                                           cattn_every=2)
        torch.manual_seed(61)
        b, n, tq = 2, 5, 7
        phone_id = torch.randint(0, 20, (b, n))
        duration = torch.randint(1, 4, (b, n))
        t_len = int(duration.sum(1).max())
        pitch = torch.rand(b, t_len) * 300 + 60
        phone_mask = torch.ones(b, n)
        mask = torch.ones(b, t_len)
        ref_emb = torch.randn(b, 16, tq)  # (B, d, T')
        ref_mask = torch.ones(b, tq)
        with torch.no_grad():
            out_t = ref(phone_id, duration=duration, pitch=pitch,
                        phone_mask=phone_mask, mask=mask, ref_emb=ref_emb,
                        ref_mask=ref_mask, is_inference=False)

        cfg = NS2Config(num_phones=20, hidden=16, n_layers=2, n_heads=2,
                        ffn_filter=32, predictor_filter=16,
                        predictor_layers=4, predictor_cattn_every=2,
                        predictor_heads=2, pitch_bins_num=16)
        ours = PriorEncoder(cfg)
        out_j = ours.apply(
            {"params": params}, jnp.asarray(phone_id.numpy()),
            duration=jnp.asarray(duration.numpy()),
            pitch=jnp.asarray(pitch.numpy()),
            phone_mask=jnp.asarray(phone_mask.numpy()),
            mask=jnp.asarray(mask.numpy()),
            ref_emb=jnp.asarray(ref_emb.transpose(1, 2).numpy()),
            ref_mask=jnp.asarray(ref_mask.numpy()), max_frames=t_len)
        np.testing.assert_allclose(np.asarray(out_j["dur_pred_log"]),
                                   out_t["dur_pred_log"].numpy(), atol=3e-5)
        np.testing.assert_allclose(np.asarray(out_j["pitch_pred_log"]),
                                   out_t["pitch_pred_log"].numpy(), atol=3e-5)
        np.testing.assert_array_equal(np.asarray(out_j["pitch_token"]),
                                      out_t["pitch_token"].numpy())
        np.testing.assert_allclose(np.asarray(out_j["prior_out"]),
                                   out_t["prior_out"].numpy(), atol=3e-5)

    def test_wavenet_and_diffusion_parity(self):
        import jax.numpy as jnp

        from models.tts.naturalspeech2.diffusion import Diffusion as RefDiff

        from amphion_tpu.models.tts.naturalspeech2.ns2 import (
            Diffusion,
            NS2Config,
        )
        from amphion_tpu.utils.convert import ns2_wavenet_to_flax

        wn = SimpleNamespace(input_size=8, hidden_size=16, out_size=8,
                             num_layers=4, cross_attn_per_layer=2,
                             dilation_cycle=2, attn_head=2, drop_out=0.0)
        dcfg = SimpleNamespace(wavenet=wn, beta_min=0.05, beta_max=20.0,
                               sigma=1.0, noise_factor=1.0)
        torch.manual_seed(62)
        ref = RefDiff(dcfg).eval()
        sd = {k[len("diff_estimator."):]: v.detach().numpy()
              for k, v in ref.state_dict().items()
              if k.startswith("diff_estimator.")}
        params = {"diff_estimator": ns2_wavenet_to_flax(
            sd, num_layers=4, cattn_every=2)}
        torch.manual_seed(63)
        b, t = 2, 10
        xt = torch.randn(b, 8, t)
        mask = torch.ones(b, t)
        cond = torch.randn(b, t, 16)
        step = torch.rand(b)
        spk_q = torch.randn(b, 3, 16)
        with torch.no_grad():
            x0_t = ref.diff_estimator(xt, mask, cond, step, spk_q)
            dxt_t = ref.cal_dxt(xt, mask, cond, spk_q, step, h=0.1)

        cfg = NS2Config(latent_dim=8, hidden=16, wavenet_layers=4,
                        wavenet_cattn_every=2, wavenet_dilation_cycle=2,
                        wavenet_heads=2, beta_min=0.05, beta_max=20.0,
                        sigma=1.0, noise_factor=1.0)
        ours = Diffusion(cfg)
        xt_j = jnp.asarray(xt.transpose(1, 2).numpy())
        x0_j = ours.apply(
            {"params": params}, xt_j, jnp.asarray(mask.numpy()),
            jnp.asarray(cond.numpy()), jnp.asarray(step.numpy()),
            jnp.asarray(spk_q.numpy()),
            method=lambda m, *a: m.diff_estimator(*a))
        np.testing.assert_allclose(np.asarray(x0_j),
                                   x0_t.transpose(1, 2).numpy(), atol=3e-5)
        dxt_j = ours.apply(
            {"params": params}, xt_j, jnp.asarray(mask.numpy()),
            jnp.asarray(cond.numpy()), jnp.asarray(spk_q.numpy()),
            jnp.asarray(step.numpy()), 0.1, method=Diffusion.cal_dxt)
        np.testing.assert_allclose(np.asarray(dxt_j),
                                   dxt_t.transpose(1, 2).numpy(), atol=2e-4)


class TestAPNetRoundTrip:
    def test_forward_parity(self):
        import jax.numpy as jnp

        from models.vocoders.gan.generator.apnet import APNet as RefAPNet

        from amphion_tpu.models.vocoders.apnet import (
            APNetConfig,
            APNetGenerator,
        )
        from amphion_tpu.utils.convert import torch_apnet_to_flax

        torch.manual_seed(70)
        cfg = SimpleNamespace(
            model=SimpleNamespace(apnet=SimpleNamespace(
                ASP_channel=16, PSP_channel=16,
                ASP_resblock_kernel_sizes=[3, 5],
                ASP_resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
                PSP_resblock_kernel_sizes=[3, 5],
                PSP_resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
                ASP_input_conv_kernel_size=7, ASP_output_conv_kernel_size=7,
                PSP_input_conv_kernel_size=7,
                PSP_output_R_conv_kernel_size=7,
                PSP_output_I_conv_kernel_size=7)),
            preprocess=SimpleNamespace(n_mel=8, n_fft=64, hop_size=16,
                                       win_size=64))
        ref = RefAPNet(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = torch_apnet_to_flax(sd, resblock_kernel_sizes=(3, 5))
        torch.manual_seed(71)
        mel = torch.randn(2, 8, 12)
        with torch.no_grad():
            logamp_t, pha_t, rea_t, imag_t, audio_t = ref(mel)

        ours = APNetGenerator(APNetConfig(
            n_mel=8, channels=16, resblock_kernel_sizes=(3, 5),
            resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
            n_fft=64, hop_size=16, win_size=64))
        audio_j, (logamp_j, pha_j, rea_j, imag_j) = ours.apply(
            {"params": params}, jnp.asarray(mel.transpose(1, 2).numpy()),
            True)
        np.testing.assert_allclose(
            np.asarray(logamp_j), logamp_t.transpose(1, 2).numpy(), atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(pha_j), pha_t.transpose(1, 2).numpy(), atol=3e-4)
        np.testing.assert_allclose(np.asarray(audio_j),
                                   audio_t[:, 0].numpy(), atol=3e-4)


class TestDiffWaveRoundTrip:
    def test_forward_parity(self):
        import jax.numpy as jnp

        from models.vocoders.diffusion.diffwave.diffwave import (
            DiffWave as RefDiffWave,
        )

        from amphion_tpu.models.vocoders.diffwave import (
            DiffWave,
            DiffWaveConfig,
        )
        from amphion_tpu.utils.convert import torch_diffwave_to_flax

        torch.manual_seed(75)
        cfg = SimpleNamespace(
            model=SimpleNamespace(diffwave=SimpleNamespace(
                noise_schedule_factors=[1e-4, 0.05, 10],
                residual_channels=8, residual_layers=4,
                dilation_cycle_length=2, upsample_factors=[4, 4])),
            preprocess=SimpleNamespace(n_mel=8))
        ref = RefDiffWave(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = torch_diffwave_to_flax(sd, num_layers=4)
        torch.manual_seed(76)
        n = 6
        audio = torch.randn(2, n * 16)
        mel = torch.randn(2, 8, n)
        step = torch.tensor([3, 7])
        with torch.no_grad():
            eps_t = ref(audio, step, mel)

        ours = DiffWave(DiffWaveConfig(
            n_mel=8, hop_size=16, upsample_factors=(4, 4),
            residual_channels=8, num_layers=4, dilation_cycle=2,
            num_train_steps=10))
        eps_j = ours.apply(
            {"params": params}, jnp.asarray(audio.numpy()),
            jnp.asarray(step.numpy()), jnp.asarray(mel.transpose(1, 2).numpy()))
        np.testing.assert_allclose(np.asarray(eps_j), eps_t[:, 0].numpy(),
                                   atol=3e-5)


class _AttrDict(dict):
    __getattr__ = dict.__getitem__


def _fs2_ref_cfg(tmpdir):
    import json
    import os

    stats = {"ds_ds": {"voiced_positions": {"mean": 0.0, "std": 1.0},
                       "total_positions": {"min": -4.0, "max": 4.0}}}
    for d in ("pitch", "energy"):
        os.makedirs(os.path.join(tmpdir, "ds", d), exist_ok=True)
        with open(os.path.join(tmpdir, "ds", d, "statistics.json"), "w") as f:
            json.dump(stats, f)
    transformer = _AttrDict(
        encoder_hidden=16, encoder_layer=2, encoder_head=2,
        decoder_hidden=16, decoder_layer=2, decoder_head=2,
        conv_filter_size=32, conv_kernel_size=[9, 1],
        encoder_dropout=0.0, decoder_dropout=0.0)
    model = _AttrDict(
        max_seq_len=100, transformer=transformer,
        variance_predictor=_AttrDict(filter_size=16, kernel_size=3,
                                     dropout=0.0),
        variance_embedding=_AttrDict(pitch_quantization="linear",
                                     energy_quantization="linear",
                                     n_bins=16))
    return SimpleNamespace(
        model=model, dataset=["ds"],
        preprocess=SimpleNamespace(
            processed_dir=tmpdir, use_frame_pitch=True, pitch_dir="pitch",
            use_frame_energy=True, energy_dir="energy", n_mel=8),
        train=SimpleNamespace(multi_speaker_training=False))


class TestFastSpeech2RoundTrip:
    def test_forward_parity(self, tmp_path):
        import sys as _sys
        import types as _types

        if "unidecode" not in _sys.modules:
            mod = _types.ModuleType("unidecode")
            mod.unidecode = lambda s: s
            _sys.modules["unidecode"] = mod
        if "inflect" not in _sys.modules:
            mod = _types.ModuleType("inflect")
            mod.engine = lambda: SimpleNamespace(
                number_to_words=lambda *a, **k: "")
            _sys.modules["inflect"] = mod
        import jax.numpy as jnp

        from models.tts.fastspeech2.fs2 import FastSpeech2 as RefFS2
        from text.symbols import symbols

        from amphion_tpu.models.tts.fastspeech2.fs2 import (
            FastSpeech2,
            FastSpeech2Config,
        )
        from amphion_tpu.utils.convert import torch_fastspeech2_to_flax

        torch.manual_seed(80)
        cfg = _fs2_ref_cfg(str(tmp_path))
        ref = RefFS2(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = torch_fastspeech2_to_flax(sd, enc_layers=2, dec_layers=2)
        torch.manual_seed(81)
        b, n = 2, 6
        texts = torch.randint(1, 30, (b, n))
        # equal row sums: the reference zero-pads expanded frames beyond a
        # row's total while our gather clips to the last phone — masked
        # positions differ, so compare with none present
        durs = torch.full((b, n), 2, dtype=torch.long)
        t_len = int(durs.sum(1).max())
        pitch = torch.randn(b, t_len)
        energy = torch.randn(b, t_len)
        data = {
            "spk_id": torch.zeros(b, dtype=torch.long),
            "texts": texts, "text_len": torch.tensor([n, n]),
            "target_len": torch.tensor([t_len, t_len]),
            "pitch": pitch, "energy": energy, "durations": durs,
        }
        with torch.no_grad():
            out_t = ref(data)

        ours = FastSpeech2(FastSpeech2Config(
            num_phones=len(symbols) + 1, hidden=16, n_enc_layers=2,
            n_dec_layers=2, n_heads=2, ffn_hidden=32, kernel_size=9,
            n_mel=8, max_frames=t_len, pitch_bins=16, energy_bins=16,
            variance_hidden=16))
        out_j = ours.apply(
            {"params": params}, jnp.asarray(texts.numpy()),
            jnp.ones((b, n)), durations=jnp.asarray(durs.numpy()),
            pitch=jnp.asarray(pitch.numpy()),
            energy=jnp.asarray(energy.numpy()))
        np.testing.assert_allclose(np.asarray(out_j["log_duration_pred"]),
                                   out_t["log_d_predictions"].numpy(),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(out_j["pitch_pred"]),
                                   out_t["p_predictions"].numpy(), atol=3e-5)
        np.testing.assert_allclose(np.asarray(out_j["mel"]),
                                   out_t["output"].numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_j["mel_postnet"]),
                                   out_t["postnet_output"].numpy(), atol=3e-4)


class TestAudioLDMRoundTrip:
    def test_unet_forward_parity(self):
        import jax.numpy as jnp

        from models.tta.ldm.audioldm import AudioLDM as RefAudioLDM

        from amphion_tpu.models.tta.audioldm import AudioLDM, AudioLDMConfig
        from amphion_tpu.utils.convert import audioldm_unet_to_flax

        torch.manual_seed(85)
        cfg = SimpleNamespace(
            image_size=8, in_channels=4, out_channels=4, model_channels=32,
            attention_resolutions=[2, 1], num_res_blocks=1,
            channel_mult=[1, 2], num_heads=2, use_spatial_transformer=True,
            transformer_depth=1, context_dim=16, use_checkpoint=False,
            legacy=False)
        ref = RefAudioLDM(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = audioldm_unet_to_flax(
            sd, channel_mults=(1, 2), num_res_blocks=1,
            attention_resolutions=(2, 1), transformer_depth=1)
        torch.manual_seed(86)
        x = torch.randn(2, 4, 8, 8)
        t = torch.tensor([3, 7])
        ctx = torch.randn(2, 5, 16)
        with torch.no_grad():
            out_t = ref(x, timesteps=t, context=ctx)

        ours = AudioLDM(AudioLDMConfig(
            latent_channels=4, base_channels=32, channel_mults=(1, 2),
            num_res_blocks=1, attention_resolutions=(2, 1), num_heads=2,
            transformer_depth=1, text_dim=16))
        out_j = ours.apply(
            {"params": params},
            jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
            jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()))
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(), atol=3e-5)


class TestAutoencoderKLRoundTrip:
    def test_encode_decode_parity(self):
        import jax.numpy as jnp

        from models.tta.autoencoder.autoencoder import (
            AutoencoderKL as RefVAE,
        )

        from amphion_tpu.models.tta.autoencoder_kl import (
            AutoencoderKL,
            AutoencoderKLConfig,
        )
        from amphion_tpu.utils.convert import autoencoder_kl_to_flax

        torch.manual_seed(90)
        # torch GroupNorm(32, ch) needs ch % 32 == 0
        cfg = SimpleNamespace(ch=32, ch_mult=[1, 2], num_res_blocks=1,
                              in_channels=1, z_channels=4, out_ch=1,
                              double_z=True)
        ref = RefVAE(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = autoencoder_kl_to_flax(sd, channel_mults=(1, 2),
                                        num_res_blocks=1)
        torch.manual_seed(91)
        x = torch.randn(2, 1, 16, 8)
        with torch.no_grad():
            post = ref.encode(x)
            mu_t = post.mean
            rec_t = ref.decode(post.mode())

        ours = AutoencoderKL(AutoencoderKLConfig(
            in_channels=1, base_channels=32, channel_mults=(1, 2),
            num_res_blocks=1, latent_channels=4))
        z_j, mu_j, _ = ours.apply(
            {"params": params}, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
            method=AutoencoderKL.encode)
        np.testing.assert_allclose(
            np.asarray(mu_j), mu_t.permute(0, 2, 3, 1).numpy(), atol=3e-5)
        rec_j = ours.apply({"params": params}, mu_j,
                           method=AutoencoderKL.decode)
        np.testing.assert_allclose(
            np.asarray(rec_j), rec_t.permute(0, 2, 3, 1).numpy(), atol=1e-4)


class TestDiffSVCDenoiserRoundTrip:
    def test_wrapper_forward_parity(self):
        import jax.numpy as jnp

        from models.svc.diffusion.diffusion_wrapper import DiffusionWrapper

        from amphion_tpu.modules.wavenet_denoiser import (
            WaveNetDenoiser,
            WaveNetDenoiserConfig,
        )
        from amphion_tpu.utils.convert import svc_diffusion_wrapper_to_flax

        torch.manual_seed(95)
        cfg = SimpleNamespace(
            model=SimpleNamespace(diffusion=SimpleNamespace(
                model_type="bidilconv",
                step_encoder=SimpleNamespace(
                    dim_raw_embedding=32, dim_hidden_layer=64,
                    activation="SiLU", num_layer=2, max_period=10000),
                bidilconv=_AttrDict(
                    base_channel=16, n_res_block=4, conv_kernel_size=3,
                    dilation_cycle_length=2, conditioner_size=24))),
            preprocess=SimpleNamespace(n_mel=8))
        ref = DiffusionWrapper(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = svc_diffusion_wrapper_to_flax(sd, num_layers=4,
                                               t_mlp_layers=2)
        torch.manual_seed(96)
        x = torch.randn(2, 12, 8)
        t = torch.tensor([3, 7])
        c = torch.randn(2, 12, 24)
        with torch.no_grad():
            out_t = ref(x, t, c)

        ours = WaveNetDenoiser(WaveNetDenoiserConfig(
            in_dim=8, hidden=16, num_layers=4, dilation_cycle=2,
            cond_dim=24, kernel_size=3, t_raw_dim=32, t_mlp_hidden=64,
            t_mlp_layers=2))
        out_j = ours.apply({"params": params}, jnp.asarray(x.numpy()),
                           jnp.asarray(t.numpy()), jnp.asarray(c.numpy()))
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                                   atol=3e-5)


class TestSpeechTokenizerRoundTrip:
    def test_forward_encode_decode_parity(self):
        import jax.numpy as jnp

        from models.codec.speechtokenizer.model import (
            SpeechTokenizer as RefST,
        )

        from amphion_tpu.models.codec.amphion_codec import CodecConfig
        from amphion_tpu.models.codec.speechtokenizer import (
            SpeechTokenizer,
            SpeechTokenizerConfig,
        )
        from amphion_tpu.utils.convert import speechtokenizer_to_flax

        torch.manual_seed(100)
        cfg = {
            "n_filters": 4, "dimension": 8, "strides": [2, 5],
            "lstm_layers": 2, "bidirectional": True, "dilation_base": 2,
            "residual_kernel_size": 3, "n_residual_layers": 1,
            "activation": "ELU", "sample_rate": 16000, "n_q": 3,
            "codebook_size": 16, "semantic_dimension": 12,
        }
        ref = RefST(cfg).eval()
        # the EMA codebooks are zero until the first kmeans training batch;
        # randomize them for a meaningful quantization oracle
        with torch.no_grad():
            for layer in ref.quantizer.vq.layers:
                layer._codebook.embed.normal_()
                layer._codebook.inited.fill_(1)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = speechtokenizer_to_flax(
            sd, strides=(2, 5), n_residual_layers=1, lstm_layers=2,
            bidirectional=True, n_q=3, activation="ELU")
        torch.manual_seed(101)
        x = torch.randn(2, 1, 100) * 0.3
        with torch.no_grad():
            o_t, commit_t, feat_t = ref(x, n_q=3)
            codes_t = ref.encode(x, n_q=3)

        ours = SpeechTokenizer(SpeechTokenizerConfig(
            codec=CodecConfig(encoder_dim=4, latent_dim=8, strides=(2, 5)),
            n_q=3, codebook_size=16, semantic_dimension=12, lstm_layers=2,
            bidirectional=True))
        recon_j, codes_j, sem_j, _ = ours.apply(
            {"params": params}, jnp.asarray(x[:, 0].numpy()))
        np.testing.assert_array_equal(np.asarray(codes_j), codes_t.numpy())
        np.testing.assert_allclose(np.asarray(sem_j), feat_t.numpy(),
                                   atol=3e-4)
        np.testing.assert_allclose(np.asarray(recon_j), o_t[:, 0].numpy(),
                                   atol=3e-4)
        # decode path
        wav_j = ours.apply({"params": params}, codes_j,
                           method=SpeechTokenizer.decode)
        with torch.no_grad():
            wav_t = ref.decode(torch.as_tensor(np.asarray(codes_j)))
        np.testing.assert_allclose(np.asarray(wav_j), wav_t[:, 0].numpy(),
                                   atol=3e-4)


class TestCocoRoundTrip:
    def test_contentstyle_forward_parity(self):
        import jax.numpy as jnp

        from models.codec.coco.rep_coco_model import CocoContentStyle

        from amphion_tpu.models.codec.coco import CocoCodec, CocoConfig
        from amphion_tpu.utils.convert import coco_to_flax

        torch.manual_seed(110)
        cfg = SimpleNamespace(
            codebook_size=32, hidden_size=16, codebook_dim=4,
            num_quantizers=1, quantizer_type="fvq", whisper_dim=24,
            chromagram_dim=12, downsample_rate=2,
            encoder=SimpleNamespace(vocos_dim=16, vocos_intermediate_dim=32,
                                    vocos_num_layers=2),
            decoder=SimpleNamespace(vocos_dim=16, vocos_intermediate_dim=32,
                                    vocos_num_layers=2))
        ref = CocoContentStyle(cfg=cfg).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = coco_to_flax(sd, mode="contentstyle", downsample=2,
                              num_blocks=2, num_quantizers=1)
        torch.manual_seed(111)
        wh = torch.randn(2, 12, 24)
        ch = torch.randn(2, 12, 12)
        with torch.no_grad():
            wh_rec, ch_rec, _, idx = ref(wh, ch)

        ours = CocoCodec(CocoConfig(
            mode="contentstyle", feature_dim=24, chromagram_dim=12,
            hidden=16, codebook_size=32, codebook_dim=4, downsample=2,
            vocos_dim=16, vocos_intermediate_dim=32, num_blocks=2))
        recon, tokens, _ = ours.apply(
            {"params": params}, jnp.asarray(wh.numpy()),
            style_feats=jnp.asarray(ch.numpy()))
        np.testing.assert_array_equal(np.asarray(tokens), idx.numpy()[0])
        np.testing.assert_allclose(np.asarray(recon), wh_rec.numpy(),
                                   atol=3e-4)


class TestNoroRoundTrip:
    def test_vcmodel_forward_parity(self):
        import jax.numpy as jnp

        from models.vc.Noro.noro_model import Noro_VCmodel

        from amphion_tpu.models.vc.noro import Noro, NoroConfig
        from amphion_tpu.utils.convert import noro_to_flax

        torch.manual_seed(120)
        # query_attn heads = encoder_hidden // 64 → hidden must be ≥ 64
        cfg = SimpleNamespace(
            reference_encoder=SimpleNamespace(
                encoder_layer=2, encoder_hidden=64, encoder_head=2,
                conv_filter_size=128, conv_kernel_size=5,
                encoder_dropout=0.0, use_skip_connection=False,
                use_new_ffn=True, ref_in_dim=8, ref_out_dim=64,
                use_query_emb=True, num_query_emb=4),
            diffusion=SimpleNamespace(
                diff_model_type="WaveNet", beta_min=0.05, beta_max=20.0,
                sigma=1.0, noise_factor=1.0,
                diff_wavenet=SimpleNamespace(
                    input_size=8, hidden_size=64, out_size=8, num_layers=4,
                    cross_attn_per_layer=2, dilation_cycle=2, attn_head=2,
                    drop_out=0.0)),
            vc_feature=SimpleNamespace(content_feature_dim=6, hidden_dim=64))
        ref = Noro_VCmodel(cfg, use_ref_noise=False).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = noro_to_flax(sd, ref_layers=2, wavenet_layers=4,
                              cattn_every=2)
        torch.manual_seed(121)
        b, t, tr = 2, 10, 7
        mel = torch.randn(b, t, 8)
        content = torch.randn(b, t, 6)
        pitch = torch.rand(b, t) * 200 + 60
        x_ref = torch.randn(b, tr, 8)
        mask = torch.ones(b, t)
        ref_mask = torch.ones(b, tr)
        # deterministic diffusion step + noise
        orig_rand, orig_randn = torch.rand, torch.randn
        torch.rand = lambda *a, **kw: torch.full(a, 0.5, **{
            k: v for k, v in kw.items() if k in ("dtype", "device")})
        torch.randn = lambda *a, **kw: torch.zeros(*a, **{
            k: v for k, v in kw.items() if k in ("dtype", "device")})
        try:
            with torch.no_grad():
                diff_out, (ref_emb, _), (cond_emb, _) = ref(
                    x=mel, content_feature=content, pitch=pitch, x_ref=x_ref,
                    x_mask=mask, x_ref_mask=ref_mask)
        finally:
            torch.rand, torch.randn = orig_rand, orig_randn

        ours = Noro(NoroConfig(
            n_mel=8, content_dim=6, hidden=64, ref_in_dim=8, ref_layers=2,
            ref_heads=2, ref_filter=128, ref_kernel=5, num_query_emb=4,
            wavenet_layers=4, wavenet_cattn_every=2, wavenet_heads=2))
        spk_j, _ = ours.apply(
            {"params": params}, jnp.asarray(x_ref.numpy()),
            jnp.asarray(ref_mask.numpy()),
            method=lambda m, r, rm: m.reference_encoder(r, rm))
        np.testing.assert_allclose(np.asarray(spk_j), ref_emb.numpy(),
                                   atol=3e-5)
        cond_j = ours.apply(
            {"params": params}, jnp.asarray(content.numpy()),
            jnp.asarray(pitch.numpy()),
            method=lambda m, c_, f_: m._condition(c_, f_))
        np.testing.assert_allclose(np.asarray(cond_j), cond_emb.numpy(),
                                   atol=3e-5)
        # diffusion loss terms at fixed t=0.5, z=0
        tt = jnp.full((b,), 0.5)
        z = jnp.zeros((b, t, 8))
        diff_j = ours.apply(
            {"params": params}, jnp.asarray(mel.numpy()),
            jnp.asarray(mask.numpy()), cond_j, spk_j, tt, z,
            method=lambda m, *a: m.diffusion.loss_terms(*a))
        np.testing.assert_allclose(
            np.asarray(diff_j["x0_pred"]),
            diff_out["x0_pred"].numpy(), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(diff_j["noise_pred"]),
            diff_out["noise_pred"].numpy(), atol=2e-3)


class TestVevoRepCodecRoundTrip:
    def test_forward_encode_parity(self):
        import jax.numpy as jnp

        from models.codec.vevo.vevo_repcodec import VevoRepCodec as RefVRC

        from amphion_tpu.models.codec.vevo_repcodec import (
            VevoRepCodec,
            VevoRepCodecConfig,
        )
        from amphion_tpu.utils.convert import vevo_repcodec_to_flax

        torch.manual_seed(130)
        ref = RefVRC(
            input_channels=12, output_channels=12, encode_channels=16,
            decode_channels=16, code_dim=8, codebook_num=1,
            codebook_size=32, enc_ratios=(1, 1), dec_ratios=(1, 1),
            enc_strides=(1, 2), dec_strides=(2, 1)).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = vevo_repcodec_to_flax(sd, enc_strides=(1, 2),
                                       dec_strides=(2, 1))
        torch.manual_seed(131)
        x = torch.randn(2, 12, 10)  # (B, C, T)
        with torch.no_grad():
            y_t, zq_t, _, _, _ = ref(x)
            z_enc = ref.projector(ref.encoder(x))
            _, idx_t = ref.quantizer.inference(z_enc)

        ours = VevoRepCodec(VevoRepCodecConfig(
            input_channels=12, output_channels=12, encode_channels=16,
            decode_channels=16, code_dim=8, codebook_num=1,
            codebook_size=32, enc_ratios=(1.0, 1.0), dec_ratios=(1.0, 1.0),
            enc_strides=(1, 2), dec_strides=(2, 1)))
        recon, idxs, _ = ours.apply(
            {"params": params}, jnp.asarray(x.transpose(1, 2).numpy()))
        np.testing.assert_array_equal(np.asarray(idxs)[0], idx_t[0].numpy())
        np.testing.assert_allclose(
            np.asarray(recon), y_t.transpose(1, 2).numpy(), atol=3e-4)


class TestJetsAlignmentRoundTrip:
    """JETS alignment learning vs the reference
    (models/tts/jets/alignments.py + ForwardSumLoss jets_loss.py:181)."""

    ADIM, ODIM, B, L, T = 12, 9, 2, 6, 11

    def _oracle(self):
        import torch.nn.functional as F

        from models.tts.jets.alignments import (
            AlignmentModule as RefAlign,
            average_by_duration as ref_avg,
            make_pad_mask,
            viterbi_decode as ref_viterbi,
        )

        torch.manual_seed(7)
        tm = RefAlign(self.ADIM, self.ODIM).eval()
        text = torch.randn(self.B, self.L, self.ADIM)
        feats = torch.randn(self.B, self.T, self.ODIM)
        ilens = torch.tensor([self.L, 4])
        olens = torch.tensor([self.T, 8])
        with torch.no_grad():
            log_p_ref = tm(text, feats, ilens, olens,
                           make_pad_mask(ilens))
            ds_ref, bin_ref = ref_viterbi(log_p_ref, ilens, olens)
        return (tm, text, feats, ilens, olens, log_p_ref, ds_ref, bin_ref,
                ref_avg, F)

    def _ours(self, tm, text, feats, ilens, olens):
        import jax
        import jax.numpy as jnp

        from amphion_tpu.models.tts.jets.alignments import AlignmentModule
        from amphion_tpu.utils.convert import jets_alignment_to_flax

        model = AlignmentModule(adim=self.ADIM, odim=self.ODIM)
        params = jax.tree.map(
            jnp.asarray, jets_alignment_to_flax(tm.state_dict()))
        tmask = (jnp.arange(self.L)[None] < jnp.asarray(ilens.numpy())[:, None]
                 ).astype(jnp.float32)
        fmask = (jnp.arange(self.T)[None] < jnp.asarray(olens.numpy())[:, None]
                 ).astype(jnp.float32)
        log_p = model.apply({"params": params}, jnp.asarray(text.numpy()),
                            jnp.asarray(feats.numpy()), tmask, fmask)
        return log_p, tmask, fmask

    def test_log_p_attn_and_viterbi(self):
        (tm, text, feats, ilens, olens, log_p_ref, ds_ref, bin_ref,
         _, _) = self._oracle()
        from amphion_tpu.models.tts.jets.alignments import viterbi_decode

        log_p, tmask, fmask = self._ours(tm, text, feats, ilens, olens)
        ref = log_p_ref.numpy()
        ours = np.asarray(log_p)
        for b in range(self.B):
            tb, nb = int(olens[b]), int(ilens[b])
            np.testing.assert_allclose(
                ours[b, :tb, :nb], ref[b, :tb, :nb], atol=2e-4, rtol=1e-4)
        ds, bin_loss = viterbi_decode(log_p, tmask, fmask)
        for b in range(self.B):
            nb = int(ilens[b])
            np.testing.assert_array_equal(
                np.asarray(ds)[b, :nb], ds_ref[b, :nb].numpy())
        np.testing.assert_allclose(
            float(bin_loss), float(bin_ref), atol=1e-4, rtol=1e-4)

    def test_forward_sum_and_average(self):
        (tm, text, feats, ilens, olens, log_p_ref, ds_ref, _,
         ref_avg, F) = self._oracle()
        import jax.numpy as jnp

        from amphion_tpu.models.tts.jets.alignments import (
            average_by_duration,
            forward_sum_loss,
        )

        log_p, tmask, fmask = self._ours(tm, text, feats, ilens, olens)
        # torch-side replica of jets_loss.py:181 ForwardSumLoss.forward
        pd = F.pad(log_p_ref, (1, 0, 0, 0, 0, 0), value=float(np.log(np.e**-1)))
        loss_t = 0.0
        for b in range(self.B):
            tgt = torch.arange(1, int(ilens[b]) + 1).unsqueeze(0)
            cur = pd[b, : olens[b], : ilens[b] + 1].unsqueeze(1)
            cur = F.log_softmax(cur, dim=-1)
            loss_t = loss_t + F.ctc_loss(
                cur, tgt, olens[b: b + 1], ilens[b: b + 1],
                zero_infinity=True)
        loss_t = float(loss_t) / self.B
        loss_j = float(forward_sum_loss(log_p, tmask, fmask))
        np.testing.assert_allclose(loss_j, loss_t, atol=2e-4, rtol=1e-4)

        xs = torch.randn(self.B, self.T)
        avg_ref = ref_avg(ds_ref, xs, ilens, olens).numpy()
        avg_ours = np.asarray(average_by_duration(
            jnp.asarray(ds_ref.numpy()).astype(jnp.int32),
            jnp.asarray(xs.numpy()), tmask, fmask))
        for b in range(self.B):
            nb = int(ilens[b])
            np.testing.assert_allclose(
                avg_ours[b, :nb], avg_ref[b, :nb], atol=1e-5, rtol=1e-5)


class TestConditionEncoderRoundTrip:
    """SVC ConditionEncoder vs the reference
    (modules/encoder/condition_encoder.py:147)."""

    D = 16  # shared stream output dim

    def _cfg(self, merge_mode):
        class _Cfg(SimpleNamespace):
            def __contains__(self, k):
                return hasattr(self, k)

        return _Cfg(
            merge_mode=merge_mode,
            use_whisper=True, whisper_dim=12, content_encoder_dim=self.D,
            use_contentvec=True, contentvec_dim=10,
            use_mert=False, use_wenet=False,
            use_f0=True, use_uv=True,
            input_melody_dim=1, output_melody_dim=self.D, n_bins_melody=256,
            f0_min=50, f0_max=1100,
            use_energy=True, input_loudness_dim=1, output_loudness_dim=self.D,
            n_bins_loudness=256,
            use_spkid=True, singer_table_size=8, output_singer_dim=self.D,
            use_conformer_for_content_features=False,
        )

    @pytest.mark.parametrize("merge_mode", ["add", "concat"])
    def test_round_trip(self, merge_mode):
        import jax
        import jax.numpy as jnp

        from modules.encoder.condition_encoder import (
            ConditionEncoder as RefCond,
        )

        from amphion_tpu.modules.condition_encoder import (
            ConditionEncoder,
            ConditionEncoderConfig,
        )
        from amphion_tpu.utils.convert import condition_encoder_to_flax

        torch.manual_seed(3)
        rng = np.random.default_rng(3)
        tm = RefCond(self._cfg(merge_mode)).eval()

        B, T = 2, 13
        f0 = rng.uniform(0, 600, (B, T)).astype(np.float32)
        f0[:, :3] = 0.0  # unvoiced head
        uv = (f0 > 0).astype(np.int64)
        loud = rng.uniform(0, 1.5, (B, T)).astype(np.float32)
        whisper = rng.standard_normal((B, T, 12)).astype(np.float32)
        cvec = rng.standard_normal((B, T, 10)).astype(np.float32)
        spk = np.array([[1], [5]], np.int64)

        with torch.no_grad():
            ref = tm({
                "frame_pitch": torch.from_numpy(f0),
                "frame_uv": torch.from_numpy(uv),
                "frame_energy": torch.from_numpy(loud),
                "whisper_feat": torch.from_numpy(whisper),
                "contentvec_feat": torch.from_numpy(cvec),
                "spk_id": torch.from_numpy(spk),
                "target_len": torch.tensor([T, T]),
            }).numpy()

        cfg = ConditionEncoderConfig(
            output_dim=self.D, merge_mode=merge_mode,
            use_whisper=True, whisper_dim=12,
            use_contentvec=True, contentvec_dim=10,
            use_f0=True, pitch_bin=256, f0_min=50.0, f0_max=1100.0,
            use_uv=True, use_loudness=True, loudness_bins=256,
            use_singer=True, num_singers=8)
        model = ConditionEncoder(cfg)
        params = jax.tree.map(
            jnp.asarray, condition_encoder_to_flax(tm.state_dict()))
        ours = np.asarray(model.apply({"params": params}, {
            "f0": jnp.asarray(f0), "uv": jnp.asarray(uv),
            "loudness": jnp.asarray(loud),
            "whisper": jnp.asarray(whisper),
            "contentvec": jnp.asarray(cvec),
            "singer": jnp.asarray(spk[:, 0]),
        }))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


class TestDualCodecRoundTrip:
    """DualCodec (DAC + semantic ConvNeXt/FVQ streams) vs the reference
    (models/codec/dualcodec/dualcodec/model_codec/dualcodec_model.py:30)."""

    STRIDES = (2, 4)
    N_CB = 3  # acoustic codebooks
    CN_LAYERS = 2
    ENC_DIM = 4  # latent = 4 * 2^2 = 16
    SEM_DIM = 16  # == latent_dim (reference tie)
    CN_DIM = 12

    def _load_ref_pkg(self):
        import importlib.util
        import types as _types

        if "dc_model_codec" in sys.modules:
            return sys.modules["dc_model_codec.dualcodec_model"]
        # audiotools / easydict stubs (only what the model files touch)
        at = _types.ModuleType("audiotools")
        at.__path__ = []
        at.AudioSignal = object
        atml = _types.ModuleType("audiotools.ml")
        atml.BaseModel = torch.nn.Module
        ed = _types.ModuleType("easydict")

        class _EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

        ed.EasyDict = _EasyDict
        sys.modules.setdefault("audiotools", at)
        sys.modules.setdefault("audiotools.ml", atml)
        sys.modules.setdefault("easydict", ed)

        base = str(REFERENCE / "models/codec/dualcodec/dualcodec/model_codec")
        pkg = _types.ModuleType("dc_model_codec")
        pkg.__path__ = [base]
        sys.modules["dc_model_codec"] = pkg
        for mod in ("cnn", "dac_layers", "dac_quantize", "dac_model",
                    "dualcodec_model"):
            spec = importlib.util.spec_from_file_location(
                f"dc_model_codec.{mod}", f"{base}/{mod}.py")
            m = importlib.util.module_from_spec(spec)
            sys.modules[f"dc_model_codec.{mod}"] = m
            spec.loader.exec_module(m)
        return sys.modules["dc_model_codec.dualcodec_model"]

    def _models(self):
        import jax
        import jax.numpy as jnp

        from amphion_tpu.models.codec.amphion_codec import CodecConfig
        from amphion_tpu.models.codec.dualcodec import DualCodec, DualCodecConfig
        from amphion_tpu.utils.convert import dualcodec_to_flax

        ref_mod = self._load_ref_pkg()
        torch.manual_seed(11)
        tm = ref_mod.DualCodec(
            encoder_dim=self.ENC_DIM, encoder_rates=list(self.STRIDES),
            decoder_dim=self.ENC_DIM * 2 ** len(self.STRIDES),
            decoder_rates=list(reversed(self.STRIDES)),
            n_codebooks=self.N_CB, codebook_size=32,
            semantic_codebook_size=64, codebook_dim=4,
            semantic_codebook_dim=4, sample_rate=24000,
            convnext_dim=self.CN_DIM, convnext_layers=self.CN_LAYERS,
        ).eval()
        # reference hardcodes the semantic feature dim to 1024 in the
        # convnext pre/post 1x1 convs — shrink them to SEM_DIM for the test
        dac_layers = sys.modules["dc_model_codec.dac_layers"]
        tm.convnext_encoder[0] = dac_layers.WNConv1d(
            self.SEM_DIM, self.CN_DIM, kernel_size=1)
        tm.convnext_decoder[self.CN_LAYERS] = dac_layers.WNConv1d(
            self.CN_DIM, self.SEM_DIM, kernel_size=1)
        tm = tm.eval()
        cfg = DualCodecConfig(
            codec=CodecConfig(
                sample_rate=24000, encoder_dim=self.ENC_DIM,
                latent_dim=self.ENC_DIM * 2 ** len(self.STRIDES),
                decoder_dim=self.ENC_DIM, strides=self.STRIDES,
                num_quantizers=self.N_CB, codebook_size=32, codebook_dim=4),
            semantic_dim=self.SEM_DIM, semantic_codebook_size=64,
            semantic_codebook_dim=4, convnext_dim=self.CN_DIM,
            convnext_layers=self.CN_LAYERS)
        model = DualCodec(cfg)
        params = jax.tree.map(jnp.asarray, dualcodec_to_flax(
            tm.state_dict(), strides=self.STRIDES, n_codebooks=self.N_CB,
            convnext_layers=self.CN_LAYERS))
        return tm, model, params

    def test_round_trip(self):
        import jax.numpy as jnp

        tm, model, params = self._models()
        rng = np.random.default_rng(11)
        B, N = 2, 12
        hop = int(np.prod(self.STRIDES))
        audio = (rng.standard_normal((B, N * hop)) * 0.2).astype(np.float32)
        sem = rng.standard_normal((B, N, self.SEM_DIM)).astype(np.float32)

        with torch.no_grad():
            sem_codes_t, ac_codes_t = tm.encode(
                torch.from_numpy(audio)[:, None, :], sample_rate=24000,
                semantic_repr=torch.from_numpy(sem).transpose(1, 2))
            wav_t = tm.decode_from_codes(sem_codes_t, ac_codes_t).numpy()

        sem_codes, ac_codes = model.apply(
            {"params": params}, jnp.asarray(audio), jnp.asarray(sem),
            method=type(model).encode)
        np.testing.assert_array_equal(
            np.asarray(sem_codes), sem_codes_t.numpy()[:, 0, :])
        # torch codes are (B, Q, N); ours (Q, B, N)
        np.testing.assert_array_equal(
            np.asarray(ac_codes).transpose(1, 0, 2), ac_codes_t.numpy())
        wav = np.asarray(model.apply(
            {"params": params}, jnp.asarray(np.asarray(sem_codes)),
            jnp.asarray(np.asarray(ac_codes)),
            method=type(model).decode_tokens))
        np.testing.assert_allclose(wav, wav_t[:, 0, :], atol=3e-4, rtol=1e-3)


class TestTransformerSVCRoundTrip:
    """TransformerSVC acoustic mapper vs the reference
    (models/svc/transformer/transformer.py:12 + condition encoder)."""

    D = 16

    def test_round_trip(self):
        import jax
        import jax.numpy as jnp

        from models.svc.transformer.transformer import Transformer as RefT
        from modules.encoder.condition_encoder import (
            ConditionEncoder as RefCond,
        )

        from amphion_tpu.models.svc.transformer_svc import (
            TransformerSVC,
            TransformerSVCConfig,
        )
        from amphion_tpu.modules.condition_encoder import ConditionEncoderConfig
        from amphion_tpu.utils.convert import transformer_svc_to_flax

        torch.manual_seed(5)
        rng = np.random.default_rng(5)
        cond_cfg = TestConditionEncoderRoundTrip()._cfg("add")
        tc = RefCond(cond_cfg).eval()
        tm = RefT(SimpleNamespace(
            dropout=0.0, n_heads=4, n_layers=2, input_dim=self.D,
            output_dim=10)).eval()

        B, T = 2, 9
        f0 = rng.uniform(0, 600, (B, T)).astype(np.float32)
        uv = (f0 > 0).astype(np.int64)
        loud = rng.uniform(0, 1.5, (B, T)).astype(np.float32)
        whisper = rng.standard_normal((B, T, 12)).astype(np.float32)
        cvec = rng.standard_normal((B, T, 10)).astype(np.float32)
        spk = np.array([[2], [6]], np.int64)
        with torch.no_grad():
            cond_t = tc({
                "frame_pitch": torch.from_numpy(f0),
                "frame_uv": torch.from_numpy(uv),
                "frame_energy": torch.from_numpy(loud),
                "whisper_feat": torch.from_numpy(whisper),
                "contentvec_feat": torch.from_numpy(cvec),
                "spk_id": torch.from_numpy(spk),
                "target_len": torch.tensor([T, T]),
            })
            mel_t = tm(cond_t).numpy()

        cfg = TransformerSVCConfig(
            n_mel=10, hidden=self.D, num_layers=2, num_heads=4,
            ffn_hidden=2048,
            condition=ConditionEncoderConfig(
                output_dim=self.D, use_whisper=True, whisper_dim=12,
                use_contentvec=True, contentvec_dim=10, use_f0=True,
                pitch_bin=256, f0_min=50.0, f0_max=1100.0, use_uv=True,
                use_loudness=True, loudness_bins=256, use_singer=True,
                num_singers=8))
        model = TransformerSVC(cfg)
        params = jax.tree.map(jnp.asarray, transformer_svc_to_flax(
            tc.state_dict(), tm.state_dict(), num_layers=2))
        mel = np.asarray(model.apply({"params": params}, {
            "f0": jnp.asarray(f0), "uv": jnp.asarray(uv),
            "loudness": jnp.asarray(loud), "whisper": jnp.asarray(whisper),
            "contentvec": jnp.asarray(cvec), "singer": jnp.asarray(spk[:, 0]),
        }))
        np.testing.assert_allclose(mel, mel_t, atol=5e-5, rtol=1e-4)


class TestComoSVCRoundTrip:
    """ComoSVC prior Conformer + EDM-preconditioned denoiser vs the
    reference (models/svc/comosvc/comosvc.py — Conformer:369,
    EDMPrecond:52)."""

    D, MEL, LAYERS = 16, 8, 2

    def test_prior_and_precond(self):
        import jax
        import jax.numpy as jnp

        from models.svc.comosvc.comosvc import ComoSVC as RefComo
        from modules.encoder.condition_encoder import (
            ConditionEncoder as RefCond,
        )

        from amphion_tpu.models.svc.comosvc import ComoSVC, ComoSVCConfig
        from amphion_tpu.modules.condition_encoder import ConditionEncoderConfig
        from amphion_tpu.modules.wavenet_denoiser import WaveNetDenoiserConfig
        from amphion_tpu.utils.convert import comosvc_to_flax

        torch.manual_seed(21)
        rng = np.random.default_rng(21)
        cond_cfg = TestConditionEncoderRoundTrip()._cfg("add")
        tc = RefCond(cond_cfg).eval()
        ref_cfg = SimpleNamespace(
            model=SimpleNamespace(
                comosvc=_AttrDict(
                    distill=False, input_dim=self.D, output_dim=self.MEL,
                    n_heads=2, n_layers=self.LAYERS, filter_channels=24,
                    dropout=0.0, P_mean=-1.2, P_std=1.2, sigma_data=0.5,
                    sigma_min=0.002, sigma_max=80, rho=7, n_timesteps=4,
                    n_mel=self.MEL),
                diffusion=SimpleNamespace(
                    model_type="bidilconv",
                    step_encoder=SimpleNamespace(
                        dim_raw_embedding=32, dim_hidden_layer=64,
                        activation="SiLU", num_layer=2, max_period=10000),
                    bidilconv=_AttrDict(
                        base_channel=16, n_res_block=3, conv_kernel_size=3,
                        dilation_cycle_length=2, conditioner_size=self.MEL))),
            preprocess=SimpleNamespace(n_mel=self.MEL))
        tm = RefComo(ref_cfg).eval()

        B, T = 2, 11
        f0 = rng.uniform(0, 600, (B, T)).astype(np.float32)
        uv = (f0 > 0).astype(np.int64)
        loud = rng.uniform(0, 1.5, (B, T)).astype(np.float32)
        whisper = rng.standard_normal((B, T, 12)).astype(np.float32)
        cvec = rng.standard_normal((B, T, 10)).astype(np.float32)
        spk = np.array([[1], [3]], np.int64)
        mel = rng.standard_normal((B, T, self.MEL)).astype(np.float32)

        with torch.no_grad():
            cond_t = tc({
                "frame_pitch": torch.from_numpy(f0),
                "frame_uv": torch.from_numpy(uv),
                "frame_energy": torch.from_numpy(loud),
                "whisper_feat": torch.from_numpy(whisper),
                "contentvec_feat": torch.from_numpy(cvec),
                "spk_id": torch.from_numpy(spk),
                "target_len": torch.tensor([T, T]),
            })
            mask_t = torch.ones(B, T, 1)
            mu_t = tm.encoder(cond_t, mask_t)  # (B, T, MEL)
            # EDM precond at a few sigmas (channel-major in the reference)
            d_ts = []
            for sig in (0.01, 1.0, 80.0):
                s = torch.full((B, 1, 1), sig)
                d = tm.decoder.EDMPrecond(
                    torch.from_numpy(mel).transpose(1, 2), s,
                    mu_t.transpose(1, 2), tm.decoder.denoise_fn)
                d_ts.append(d.transpose(1, 2).numpy())

        cfg = ComoSVCConfig(
            n_mel=self.MEL, hidden=self.D, n_heads=2, n_layers=self.LAYERS,
            filter_channels=24, dropout=0.0,
            denoiser=WaveNetDenoiserConfig(
                in_dim=self.MEL, hidden=16, num_layers=3, dilation_cycle=2,
                cond_dim=self.MEL, t_raw_dim=32, t_mlp_hidden=64,
                t_mlp_layers=2),
            n_timesteps=4,
            condition=ConditionEncoderConfig(
                output_dim=self.D, use_whisper=True, whisper_dim=12,
                use_contentvec=True, contentvec_dim=10, use_f0=True,
                pitch_bin=256, f0_min=50.0, f0_max=1100.0, use_uv=True,
                use_loudness=True, loudness_bins=256, use_singer=True,
                num_singers=8))
        model = ComoSVC(cfg)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = jax.tree.map(jnp.asarray, comosvc_to_flax(
            tc.state_dict(), sd, n_layers=self.LAYERS, denoiser_layers=3))
        feats = {
            "f0": jnp.asarray(f0), "uv": jnp.asarray(uv),
            "loudness": jnp.asarray(loud), "whisper": jnp.asarray(whisper),
            "contentvec": jnp.asarray(cvec), "singer": jnp.asarray(spk[:, 0]),
        }
        mu = model.apply({"params": params}, feats, jnp.ones((B, T)),
                         method=ComoSVC.prior)
        np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(),
                                   atol=5e-5, rtol=1e-4)
        for sig, d_t in zip((0.01, 1.0, 80.0), d_ts):
            d_j = model.apply({"params": params}, jnp.asarray(mel),
                              jnp.full((B,), sig), mu,
                              method=ComoSVC.precond)
            np.testing.assert_allclose(np.asarray(d_j), d_t,
                                       atol=5e-5, rtol=1e-4)


class TestSSLEncoderRoundTrip:
    """HF SSL content-encoder oracles (the reference consumes these as
    frozen torch checkpoints: HuBERT `vevo_utils.py:46`, w2v-bert-2.0
    `maskgct_utils.py:46`, Whisper `content_extractor.py:267`). Tiny
    random-init HF models → convert → our flax encoders must match."""

    def _hubert_cfg(self, **kw):
        from transformers import HubertConfig as HFConfig

        return HFConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=48, num_feat_extract_layers=3,
            conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3),
            conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4, hidden_dropout=0.0,
            attention_dropout=0.0, activation_dropout=0.0,
            feat_proj_dropout=0.0, layerdrop=0.0, mask_time_prob=0.0,
            **kw)

    def _run_hubert(self, hf_cfg, our_cfg, seed):
        import jax.numpy as jnp
        from transformers import HubertModel

        from amphion_tpu.models.ssl_encoders import HubertEncoder
        from amphion_tpu.utils.convert import hf_hubert_to_flax

        torch.manual_seed(seed)
        ref = HubertModel(hf_cfg).eval()
        wav = torch.randn(2, 400)
        with torch.no_grad():
            out = ref(wav, output_hidden_states=True)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = hf_hubert_to_flax(
            sd, num_layers=2, num_feat_layers=3,
            feat_extract_norm=hf_cfg.feat_extract_norm)
        last, hidden = HubertEncoder(our_cfg).apply(
            {"params": params}, jnp.asarray(wav.numpy()))
        assert last.shape == tuple(out.last_hidden_state.shape)
        np.testing.assert_allclose(np.asarray(last),
                                   out.last_hidden_state.numpy(), atol=2e-5)
        # hidden-state tap indexing must match HF (extractors select layers)
        np.testing.assert_allclose(np.asarray(hidden[1]),
                                   out.hidden_states[1].numpy(), atol=2e-5)

    def test_hubert_base_style(self):
        from amphion_tpu.models.ssl_encoders import HubertConfig

        self._run_hubert(
            self._hubert_cfg(feat_extract_norm="group",
                             do_stable_layer_norm=False, conv_bias=False),
            HubertConfig(hidden=32, num_layers=2, num_heads=2, ffn_hidden=48,
                         conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3),
                         conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4,
                         feat_extract_norm="group",
                         do_stable_layer_norm=False, conv_bias=False),
            seed=60)

    def test_hubert_large_style(self):
        from amphion_tpu.models.ssl_encoders import HubertConfig

        self._run_hubert(
            self._hubert_cfg(feat_extract_norm="layer",
                             do_stable_layer_norm=True, conv_bias=True),
            HubertConfig(hidden=32, num_layers=2, num_heads=2, ffn_hidden=48,
                         conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3),
                         conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4,
                         feat_extract_norm="layer",
                         do_stable_layer_norm=True, conv_bias=True),
            seed=61)

    def test_w2v_bert(self):
        import jax.numpy as jnp
        from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

        from amphion_tpu.models.ssl_encoders import (
            W2VBertConfig,
            W2VBertEncoder,
        )
        from amphion_tpu.utils.convert import hf_w2v_bert_to_flax

        torch.manual_seed(62)
        ref = Wav2Vec2BertModel(Wav2Vec2BertConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=48, feature_projection_input_dim=16,
            conv_depthwise_kernel_size=7,
            position_embeddings_type="relative_key",
            left_max_position_embeddings=8, right_max_position_embeddings=4,
            hidden_dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, feat_proj_dropout=0.0,
            conformer_conv_dropout=0.0, layerdrop=0.0,
            apply_spec_augment=False)).eval()
        feats = torch.randn(2, 23, 16)
        with torch.no_grad():
            out = ref(feats, output_hidden_states=True)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = hf_w2v_bert_to_flax(sd, num_layers=2)
        last, hidden = W2VBertEncoder(W2VBertConfig(
            hidden=32, num_layers=2, num_heads=2, ffn_hidden=48,
            input_dim=16, conv_kernel=7, left_max_pos=8,
            right_max_pos=4)).apply(
                {"params": params}, jnp.asarray(feats.numpy()))
        np.testing.assert_allclose(np.asarray(last),
                                   out.last_hidden_state.numpy(), atol=2e-5)
        # MaskGCT taps hidden_states[17] on the real model — indexing parity
        np.testing.assert_allclose(np.asarray(hidden[1]),
                                   out.hidden_states[1].numpy(), atol=2e-5)

    def test_whisper_encoder(self):
        import jax.numpy as jnp
        from transformers import WhisperConfig, WhisperModel

        from amphion_tpu.models.ssl_encoders import (
            WhisperEncConfig,
            WhisperEncoder,
        )
        from amphion_tpu.utils.convert import hf_whisper_encoder_to_flax

        torch.manual_seed(63)
        ref = WhisperModel(WhisperConfig(
            d_model=32, encoder_layers=2, encoder_attention_heads=2,
            encoder_ffn_dim=48, num_mel_bins=16, max_source_positions=20,
            decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=48,
            dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0)).eval()
        mel = torch.randn(2, 16, 40)  # (B, n_mels, T); T = 2*max_source_pos
        with torch.no_grad():
            out = ref.encoder(mel).last_hidden_state
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = hf_whisper_encoder_to_flax(sd, num_layers=2)
        ours = WhisperEncoder(WhisperEncConfig(
            hidden=32, num_layers=2, num_heads=2, ffn_hidden=48, n_mels=16,
            max_source_positions=20)).apply(
                {"params": params},
                jnp.asarray(mel.numpy().transpose(0, 2, 1)))
        assert ours.shape == tuple(out.shape)
        np.testing.assert_allclose(np.asarray(ours), out.numpy(), atol=2e-5)


class TestDebaTTSRoundTrip:
    """DebaTTS T2S (`models/tts/debatts/t2s_model.py:26` T2SLlama_new):
    unified-vocab [prompt0 | phone | target] AR protocol + HF-knob decode."""

    @staticmethod
    def _load_ref_module():
        import importlib.util
        import os

        cwd = os.getcwd()
        os.chdir(str(REFERENCE))  # the module os.chdir()s relative to repo root
        try:
            spec = importlib.util.spec_from_file_location(
                "ref_debatts_t2s",
                str(REFERENCE / "models/tts/debatts/t2s_model.py"))
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        finally:
            os.chdir(cwd)
        return mod

    def _build(self):
        import torch

        mod = self._load_ref_module()
        torch.manual_seed(77)
        ref = mod.T2SLlama_new(
            phone_vocab_size=16, target_vocab_size=32, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
            pad_token_id=48, bos_target_id=49, eos_target_id=50,
            bos_phone_id=51, eos_phone_id=52, bos_prompt0_id=53,
            eos_prompt0_id=54).eval()

        from amphion_tpu.models.tts.debatts import (
            DebaTTST2S, DebaTTST2SConfig)
        from amphion_tpu.utils.convert import debatts_t2s_to_flax

        cfg = DebaTTST2SConfig(phone_vocab=16, target_vocab=32, hidden=32,
                               intermediate=64, num_layers=2, num_heads=4,
                               max_position=128)
        assert (cfg.pad_id, cfg.bos_target_id, cfg.eos_target_id,
                cfg.bos_phone_id, cfg.eos_phone_id, cfg.bos_prompt0_id,
                cfg.eos_prompt0_id) == (48, 49, 50, 51, 52, 53, 54)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = debatts_t2s_to_flax(sd, num_layers=2)
        return ref, DebaTTST2S(cfg), params

    def test_forward_loss(self):
        import jax.numpy as jnp
        import torch

        from amphion_tpu.models.tts.debatts import DebaTTST2S

        ref, ours, params = self._build()
        rng = np.random.default_rng(3)
        b = 2
        p0 = rng.integers(0, 32, (b, 5))
        p0_m = np.array([[1, 1, 1, 1, 1], [1, 1, 1, 0, 0]], np.int64)
        ph = rng.integers(0, 16, (b, 6))
        ph_m = np.array([[1] * 6, [1, 1, 1, 1, 0, 0]], np.int64)
        tg = rng.integers(0, 32, (b, 7))
        tg_m = np.array([[1] * 7, [1, 1, 1, 1, 1, 0, 0]], np.int64)
        with torch.no_grad():
            out = ref(
                torch.tensor(p0), torch.tensor(p0_m), torch.tensor(ph),
                torch.tensor(ph_m), torch.tensor(tg), torch.tensor(tg_m))
        loss, metrics = ours.apply(
            {"params": params}, jnp.asarray(p0), jnp.asarray(p0_m),
            jnp.asarray(ph), jnp.asarray(ph_m), jnp.asarray(tg),
            jnp.asarray(tg_m), method=DebaTTST2S.loss)
        np.testing.assert_allclose(float(loss), float(out.loss), rtol=2e-4)

    def test_greedy_decode_matches_hf_generate(self):
        import jax
        import jax.numpy as jnp
        import torch

        ref, ours, params = self._build()
        rng = np.random.default_rng(5)
        p0 = rng.integers(0, 32, (1, 4))
        ph = rng.integers(0, 16, (1, 5))
        pr = rng.integers(0, 32, (1, 3))
        ones = lambda a: torch.ones_like(torch.tensor(a))
        # sample_hf's prefix construction (t2s_model.py:323-358)
        ph_ids, _, _, _ = ref.add_phone_eos_bos_label(
            torch.tensor(ph), ones(ph), ref.eos_phone_id, ref.bos_phone_id,
            ref.pad_token_id, label="phone_id")
        pr_ids, _, _ = ref.add_target_eos_bos_label(
            torch.tensor(pr), ones(pr), ref.eos_target_id, ref.bos_target_id,
            ref.pad_token_id)
        pr_ids = pr_ids[:, :-1]  # continue mode
        p0_ids, _, _ = ref.add_target_eos_bos_label(
            torch.tensor(p0), ones(p0), ref.eos_prompt0_id,
            ref.bos_prompt0_id, ref.pad_token_id)
        input_ids = torch.cat([p0_ids, ph_ids, pr_ids], dim=-1)
        with torch.no_grad():
            gen = ref.model.generate(
                input_ids, do_sample=False, max_new_tokens=12,
                pad_token_id=ref.pad_token_id,
                eos_token_id=ref.eos_target_id, repetition_penalty=3.5,
                min_new_tokens=5)
        ref_new = gen[0, input_ids.shape[1]:].numpy()
        ref_body = ref_new[:np.argmax(ref_new == ref.eos_target_id)] \
            if (ref_new == ref.eos_target_id).any() else ref_new

        from amphion_tpu.models.tts.debatts import (
            debatts_prefix_ids, debatts_t2s_generate)

        np.testing.assert_array_equal(
            np.asarray(debatts_prefix_ids(
                ours.cfg, jnp.asarray(p0), jnp.asarray(ph),
                jnp.asarray(pr))), input_ids.numpy())
        toks, lens = debatts_t2s_generate(
            ours, params, jnp.asarray(p0), jnp.asarray(ph), jnp.asarray(pr),
            jax.random.key(0), max_new=12, temperature=0.0,
            repeat_penalty=3.5, min_new_tokens=5, compute_dtype="float32")
        n = int(lens[0])
        assert n == len(ref_body)
        np.testing.assert_array_equal(np.asarray(toks[0, :n]), ref_body)


class TestNSFHiFiGANRoundTrip:
    """Full NSFHiFiGAN generator oracle (ref nsfhifigan.py:181) in
    ``reference_forward`` mode — the reference forward overwrites its
    source-conv output with x itself (`:268-270`), so checkpoints trained
    with it double x per scale and never see the excitation; our
    bug-compat mode must reproduce that bit-for-bit through converted
    weights (noise_convs/m_source are converted but unused, matching)."""

    def test_reference_forward_parity(self):
        import jax.numpy as jnp

        from models.vocoders.gan.generator.nsfhifigan import NSFHiFiGAN

        from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig
        from amphion_tpu.models.vocoders.nsf_hifigan import (
            NSFHiFiGANConfig,
            NSFHiFiGANGenerator,
        )
        from amphion_tpu.utils.convert import torch_nsf_hifigan_to_flax

        nsf = SimpleNamespace(
            resblock="1", harmonic_num=3,
            upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
            upsample_initial_channel=16,
            resblock_kernel_sizes=[3, 5],
            resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
        )
        cfg_t = SimpleNamespace(
            model=SimpleNamespace(nsfhifigan=nsf),
            preprocess=SimpleNamespace(n_mel=8, sample_rate=2400),
        )
        torch.manual_seed(50)
        ref = NSFHiFiGAN(cfg_t).eval()
        torch.manual_seed(51)
        mel = torch.randn(2, 8, 17)
        f0 = torch.rand(2, 17) * 200 + 80
        with torch.no_grad():
            y_t = ref(mel, f0)

        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        params = torch_nsf_hifigan_to_flax(
            sd, upsample_rates=(2, 2), resblock_kernel_sizes=(3, 5))
        ours = NSFHiFiGANGenerator(NSFHiFiGANConfig(
            base=HiFiGANConfig(
                resblock="1", upsample_rates=(2, 2),
                upsample_kernel_sizes=(4, 4), upsample_initial_channel=16,
                resblock_kernel_sizes=(3, 5),
                resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)), n_mel=8),
            sample_rate=2400, num_harmonics=3, reference_forward=True))
        y_j = ours.apply(
            {"params": params}, jnp.asarray(mel.numpy().transpose(0, 2, 1)),
            jnp.asarray(f0.numpy()), None)
        np.testing.assert_allclose(
            np.asarray(y_j), y_t.numpy()[:, 0, :], atol=2e-4)

        # the fixed path (excitation actually injected) runs on the same
        # converted params and differs from the bug-compat output
        fixed = NSFHiFiGANGenerator(NSFHiFiGANConfig(
            base=ours.cfg.base, sample_rate=2400, num_harmonics=3))
        y_fix = fixed.apply(
            {"params": params}, jnp.asarray(mel.numpy().transpose(0, 2, 1)),
            jnp.asarray(f0.numpy()), None)
        assert y_fix.shape == y_j.shape
        assert float(np.abs(np.asarray(y_fix) - np.asarray(y_j)).max()) > 1e-6


class TestWaveGlowRoundTrip:
    """Full WaveGlow training-forward oracle (ref waveglow.py:146): learned
    upsampler + mel-major grouping, early-output multi-scale z, invertible
    1x1 convs, WN couplings ([b | log_s] split). Also checks infer() is the
    exact inverse of forward()."""

    def test_forward_parity_and_inverse(self):
        import jax
        import jax.numpy as jnp

        from models.vocoders.flow.waveglow.waveglow import WaveGlow as RefWG

        from amphion_tpu.models.vocoders.waveglow import (
            WaveGlow,
            WaveGlowConfig,
        )
        from amphion_tpu.utils.convert import torch_waveglow_to_flax

        voc = SimpleNamespace(
            INPUT_DIM=8, N_FLOWS=4, N_GROUP=4, N_EARLY_EVERY=2,
            N_EARLY_SIZE=2, N_LAYERS=2, N_CHANNELS=8, KERNEL_SIZE=3)
        torch.manual_seed(60)
        ref = RefWG(SimpleNamespace(VOCODER=voc)).eval()
        # the reference zero-inits WN end layers (identity couplings);
        # randomize them so the couplings actually transform
        for wn_k in ref.WN:
            wn_k.end.weight.data.normal_(std=0.1)
            wn_k.end.bias.data.normal_(std=0.1)

        torch.manual_seed(61)
        frames = 2
        t = (frames - 1) * 256 + 1024  # upsampled length
        mel = torch.randn(2, 8, frames)
        audio = torch.randn(2, t)
        with torch.no_grad():
            z_t, log_s_list, log_det_w_list = ref((mel, audio))

        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        params = torch_waveglow_to_flax(sd, n_flows=4, n_layers=2)
        cfg = WaveGlowConfig(
            n_mel=8, hop_size=256, upsample_kernel=1024, n_group=4,
            n_flows=4, n_early_every=2, n_early_size=2, wn_layers=2,
            wn_channels=8, wn_kernel_size=3)
        ours = WaveGlow(cfg)
        z_j, logdet_j = ours.apply(
            {"params": params}, jnp.asarray(audio.numpy()),
            jnp.asarray(mel.numpy().transpose(0, 2, 1)),
            method=WaveGlow.forward)
        np.testing.assert_allclose(
            np.asarray(z_j).transpose(0, 2, 1), z_t.numpy(),
            atol=2e-4)

        # per-sample logdet: ref's log_det_W entries are summed over batch
        tg = t // 4
        ld_w = sum(float(x) for x in log_det_w_list) / 2  # per sample
        ld_s = sum(s.sum(dim=(1, 2)) for s in log_s_list).numpy()
        np.testing.assert_allclose(
            np.asarray(logdet_j), ld_w + ld_s, rtol=1e-4)
        assert ld_w != 0.0

        # forward(infer(rng)) must reproduce infer's own noise draws:
        # z[:, :, :2] = the early re-injection at k=2 (rngs[2]),
        # z[:, :, 2:] = the initial remaining-channels draw (rngs[0])
        wav = ours.apply({"params": params},
                         jnp.asarray(mel.numpy().transpose(0, 2, 1)),
                         jax.random.key(0), 1.0, method=WaveGlow.infer)
        assert np.isfinite(np.asarray(wav)).all()
        z_rt, _ = ours.apply(
            {"params": params}, wav[:, :t],
            jnp.asarray(mel.numpy().transpose(0, 2, 1)),
            method=WaveGlow.forward)
        rngs = jax.random.split(jax.random.key(0), 4)
        n0 = jax.random.normal(rngs[0], (2, t // 4, 2))
        n2 = jax.random.normal(rngs[2], (2, t // 4, 2))
        np.testing.assert_allclose(np.asarray(z_rt)[..., 2:], np.asarray(n0),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(z_rt)[..., :2], np.asarray(n2),
                                   atol=2e-3)


class TestWaveRNNRoundTrip:
    """Full WaveRNN oracle (ref wavernn/wavernn.py:98): UpsampleNetwork
    (MelResNet + per-scale stretch/smooth convs, indent trim), dual
    residual GRUs with 4-way aux splits, fc stack. BN running stats are
    randomized and run in eval mode on both sides."""

    def test_forward_parity(self):
        import jax
        import jax.numpy as jnp

        if not hasattr(np, "cumproduct"):  # numpy 2 removed the alias
            np.cumproduct = np.cumprod
        from models.vocoders.autoregressive.wavernn.wavernn import (
            WaveRNN as RefWaveRNN,
        )

        from amphion_tpu.models.vocoders.autoregressive import (
            WaveRNNConfig,
            WaveRNNVocoder,
        )
        from amphion_tpu.utils.convert import torch_wavernn_to_flax

        voc = SimpleNamespace(
            INPUT_DIM=6, MEL_FRAME_PAD=1, MODE="mu_law_quantize", BITS=4,
            RNN_DIMS=8, RES_OUT_DIMS=8, HOP_LENGTH=4, FC_DIMS=8,
            UPSAMPLE_FACTORS=[2, 2], COMPUTE_DIMS=8, RES_BLOCKS=2)
        torch.manual_seed(70)
        ref = RefWaveRNN(SimpleNamespace(VOCODER=voc)).eval()
        # randomize BN running stats so eval-mode normalization is exercised
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.data.normal_(std=0.3)
                m.running_var.data.uniform_(0.5, 1.5)

        torch.manual_seed(71)
        frames = 7
        t = (frames - 2) * 4  # (N - 2*pad) * hop
        mel = torch.randn(2, 6, frames)
        x = torch.rand(2, t) * 2 - 1
        with torch.no_grad():
            y_t = ref(x, mel)  # (B, T, 16)

        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        params, stats = torch_wavernn_to_flax(
            sd, res_blocks=2, upsample_factors=(2, 2))
        cfg = WaveRNNConfig(
            n_mel=6, upsample_factors=(2, 2), rnn_dim=8, fc_dim=8,
            compute_dims=8, res_out_dims=8, res_blocks=2, mel_pad=1,
            mode="mu_law_quantize", bits=4)
        ours = WaveRNNVocoder(cfg)
        y_j = ours.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.numpy()),
            jnp.asarray(mel.numpy().transpose(0, 2, 1)))
        np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=2e-4)


class TestWaveNetRoundTrip:
    """Full WaveNet oracle (ref wavenet/wavenet.py:38): ConvInUpsample
    (wide-context conv_in + stretch/smooth conv2ds + indent trim),
    per-layer gated residual blocks with separate cond/skip/out 1x1s and
    sqrt scalings, relu head. Weight norms materialized by the converter."""

    @pytest.mark.parametrize("scalar_input", [False, True])
    def test_forward_parity(self, scalar_input):
        import jax
        import jax.numpy as jnp

        from models.vocoders.autoregressive.wavenet.wavenet import (
            WaveNet as RefWaveNet,
        )

        from amphion_tpu.models.vocoders.autoregressive import (
            WaveNetConfig,
            WaveNetVocoder,
        )
        from amphion_tpu.utils.convert import torch_wavenet_to_flax

        out_ch = 6 if scalar_input else 16
        voc = SimpleNamespace(
            SCALAR_INPUT=scalar_input, OUT_CHANNELS=out_ch, INPUT_DIM=6,
            RESIDUAL_CHANNELS=8, LAYERS=4, STACKS=2, GATE_CHANNELS=8,
            KERNEL_SIZE=3, SKIP_OUT_CHANNELS=8, DROPOUT=0.05,
            UPSAMPLE_SCALES=[2, 2], MEL_FRAME_PAD=1)
        torch.manual_seed(80)
        ref = RefWaveNet(SimpleNamespace(VOCODER=voc)).eval()

        torch.manual_seed(81)
        frames = 7
        t = (frames - 2) * 4
        mel = torch.randn(2, 6, frames)
        if scalar_input:
            x_t = (torch.rand(2, 1, t) * 2 - 1)
            x_ids = None
        else:
            x_ids = torch.randint(0, out_ch, (2, t))
            x_t = torch.nn.functional.one_hot(
                x_ids, out_ch).float().transpose(1, 2)
        with torch.no_grad():
            y_t = ref(x_t, mel)  # (B, out_ch, T)

        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        params = torch_wavenet_to_flax(sd, layers=4, upsample_scales=(2, 2))
        cfg = WaveNetConfig(
            n_mel=6, upsample_scales=(2, 2), mel_frame_pad=1,
            out_channels=out_ch, layers=4, stacks=2, residual_channels=8,
            gate_channels=8, skip_out_channels=8, kernel_size=3,
            scalar_input=scalar_input)
        ours = WaveNetVocoder(cfg)
        x_j = (jnp.asarray(x_t.numpy()[:, 0, :]) if scalar_input
               else jnp.asarray(x_ids.numpy()))
        y_j = ours.apply({"params": params}, x_j,
                         jnp.asarray(mel.numpy().transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(y_j), y_t.numpy().transpose(0, 2, 1), atol=2e-4)


class TestMSSTFTDiscriminatorRoundTrip:
    """MS-STFT discriminator oracle (ref msstftd.py:169, EnCodec style):
    window-normalized complex spectrogram image, plain first conv +
    weight-normed dilated stack, logits + every feature map."""

    def test_forward_parity(self):
        import sys
        import types

        import jax.numpy as jnp

        # functional torchaudio.transforms.Spectrogram shim (the global
        # torchaudio stub has no real ops): center=False, normalized=True
        # ("window" norm), power=None → complex
        class _Spec(torch.nn.Module):
            def __init__(self, n_fft, hop_length, win_length, window_fn,
                         normalized, center, pad_mode, power):
                super().__init__()
                assert power is None and not center and normalized
                self.n_fft, self.hop, self.win = n_fft, hop_length, win_length
                self.register_buffer("window", window_fn(win_length))

            def forward(self, x):
                b, c, t = x.shape
                z = torch.stft(x.reshape(b * c, t), self.n_fft, self.hop,
                               self.win, self.window, center=False,
                               return_complex=True)
                z = z / self.window.pow(2).sum().sqrt()
                return z.reshape(b, c, z.shape[-2], z.shape[-1])

        sys.modules["torchaudio.transforms"].Spectrogram = _Spec
        sys.modules["torchaudio"].transforms = sys.modules[
            "torchaudio.transforms"]

        from models.vocoders.gan.discriminator.msstftd import (
            MultiScaleSTFTDiscriminator,
        )

        from amphion_tpu.models.vocoders.discriminators import (
            MultiSTFTDiscriminator,
        )
        from amphion_tpu.utils.convert import torch_msstftd_to_flax

        cfg = SimpleNamespace(model=SimpleNamespace(
            msstftd=SimpleNamespace(filters=8)))
        torch.manual_seed(90)
        ref = MultiScaleSTFTDiscriminator(
            cfg, n_ffts=[64, 128], hop_lengths=[16, 32],
            win_lengths=[64, 128]).eval()
        torch.manual_seed(91)
        x = torch.randn(2, 1, 400) * 0.3
        with torch.no_grad():
            y_d_rs, _, fmap_rs, _ = ref(x, x)

        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        params = torch_msstftd_to_flax(sd, num_scales=2)
        ours = MultiSTFTDiscriminator(
            resolutions=((64, 16, 64), (128, 32, 128)), channels=8)
        logits, fmaps = ours.apply({"params": params},
                                   jnp.asarray(x.numpy()[:, 0, :]))
        for i in range(2):
            # ref logits (B, 1, T', F') — ours flattened; fmaps are NHWC
            # vs ref NCHW
            np.testing.assert_allclose(
                np.asarray(logits[i]),
                y_d_rs[i].numpy().transpose(0, 2, 3, 1).reshape(2, -1),
                atol=2e-4)
            assert len(fmaps[i]) == len(fmap_rs[i]) == 5
            for fj, ft in zip(fmaps[i], fmap_rs[i]):
                np.testing.assert_allclose(
                    np.asarray(fj), ft.numpy().transpose(0, 2, 3, 1),
                    atol=2e-4)


class TestMSSBCQTDiscriminatorRoundTrip:
    """MS-SB-CQT discriminator oracle (ref mssbcqtd.py:19-176): per-octave
    plain pre-convs over the 2-channel (real, imag) CQT image + EnCodec
    dilated stack with stride 2 on frequency. The nnAudio CQT itself is
    not installable offline, so BOTH models are fed the identical
    native-CQT features (the reference's transform slot is injected); the
    learnable stack and sub-band slicing are then required to match."""

    def test_forward_parity(self):
        import sys
        import types

        import jax.numpy as jnp

        # nnAudio stub: construction must succeed; each disc's transform
        # is replaced with an injector after init
        nn_audio = types.ModuleType("nnAudio")
        nn_audio.__path__ = []
        feats = types.ModuleType("nnAudio.features")
        feats.__path__ = []

        class _FakeCQT(torch.nn.Module):
            def __init__(self, **kw):
                super().__init__()
                self.inject = None  # set post-init per scale

            def forward(self, x):
                return self.inject

        feats.cqt = types.SimpleNamespace(CQT2010v2=_FakeCQT)
        nn_audio.features = feats
        sys.modules["nnAudio"] = nn_audio
        sys.modules["nnAudio.features"] = feats
        sys.modules["torchaudio.transforms"].Resample = (
            lambda orig_freq, new_freq: torch.nn.Identity())
        sys.modules["torchaudio"].transforms = sys.modules[
            "torchaudio.transforms"]

        from models.vocoders.gan.discriminator.mssbcqtd import (
            MultiScaleSubbandCQTDiscriminator,
        )

        from amphion_tpu.modules.anti_aliasing import upsample1d
        from amphion_tpu.ops.cqt import cqt
        from amphion_tpu.utils.convert import torch_mssbcqtd_to_flax

        sr = 24000
        hops, n_octs, bpos = (512, 256), (9, 9), (24, 36)
        cfg = SimpleNamespace(
            preprocess=SimpleNamespace(sample_rate=sr),
            model=SimpleNamespace(mssbcqtd=SimpleNamespace(
                filters=8, max_filters=64, filters_scale=1,
                dilations=[1, 2, 4], in_channels=1, out_channels=1,
                hop_lengths=list(hops), n_octaves=list(n_octs),
                bins_per_octaves=list(bpos))))
        torch.manual_seed(70)
        ref = MultiScaleSubbandCQTDiscriminator(cfg).eval()

        torch.manual_seed(71)
        x = torch.randn(2, 4096) * 0.2
        x_np = x.numpy()
        # identical CQT features on both sides: our native transform of the
        # 2x-resampled audio, injected into the reference's transform slot
        x2 = upsample1d(jnp.asarray(x_np)[..., None], ratio=2)[..., 0]
        for disc, hop, n_oct, bpo in zip(ref.discriminators, hops, n_octs,
                                         bpos):
            z = np.asarray(cqt(x2, sr=2 * sr, hop_length=hop,
                               n_bins=bpo * n_oct, bins_per_octave=bpo))
            disc.cqt_transform.inject = torch.from_numpy(np.array(z))
        with torch.no_grad():
            y_d_rs, _, fmap_rs, _ = ref(x, x)

        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        params = torch_mssbcqtd_to_flax(sd, num_scales=2, n_octaves=n_octs)

        # our multi-scale wrapper hard-wires the reference's full-size
        # filters; build a same-shape stack at the test size
        import flax.linen as fnn

        class _Small(fnn.Module):
            @fnn.compact
            def __call__(self, xx):
                from amphion_tpu.models.vocoders.discriminators import (
                    SubBandCQTDiscriminator,
                )
                logits, fmaps = [], []
                for hop, n_oct, bpo in zip(hops, n_octs, bpos):
                    lo, fm = SubBandCQTDiscriminator(
                        sr, hop, n_octaves=n_oct, bins_per_octave=bpo,
                        filters=8, max_filters=64)(xx)
                    logits.append(lo)
                    fmaps.append(fm)
                return logits, fmaps

        logits, fmaps = _Small().apply({"params": params},
                                       jnp.asarray(x_np))
        for i in range(2):
            np.testing.assert_allclose(
                np.asarray(logits[i]),
                y_d_rs[i].numpy().transpose(0, 2, 3, 1).reshape(2, -1),
                atol=3e-4)
            assert len(fmaps[i]) == len(fmap_rs[i]) == 5
            for fj, ft in zip(fmaps[i], fmap_rs[i]):
                np.testing.assert_allclose(
                    np.asarray(fj), ft.numpy().transpose(0, 2, 3, 1),
                    atol=3e-4)


class TestMetisStage1RoundTrip:
    """MetisStage1 oracle (ref metis_model.py:43): MaskGCT T2S + zero-gated
    SimpleAdapter conditioning added element-wise over [prompt ‖ target];
    CFG step parity incl. the without-prompt adapter slice on the
    unconditional branch and std-rescaled guidance."""

    def test_task_step_parity(self):
        import jax.numpy as jnp

        from models.tts.metis.metis_model import MetisStage1

        from amphion_tpu.models.tts.maskgct.maskgct import S2AConfig, T2SConfig
        from amphion_tpu.models.tts.metis.metis import Metis, MetisConfig
        from amphion_tpu.utils.convert import metis_stage1_to_flax

        torch.manual_seed(95)
        hidden, heads, layers, vocab, cond_dim = 32, 4, 2, 24, 8
        ref = MetisStage1(ft_type="vc", ft_cond_dim=cond_dim,
                          hidden_size=hidden, num_heads=heads,
                          num_layers=layers, cond_codebook_size=vocab).eval()
        _shim_old_hf_attention(ref.diff_estimator)
        with torch.no_grad():
            for n, p in ref.named_parameters():
                if "to_weight" in n:
                    p.copy_(torch.randn_like(p) * 0.2)
            # gate starts at zero; randomize so the adapter matters
            ref.cond_adapter.gate_scale.copy_(torch.tensor([0.7]))

        b, t_len, plen = 2, 6, 3
        torch.manual_seed(96)
        seq = torch.randint(0, vocab, (b, t_len))
        mask = torch.zeros(b, t_len, dtype=torch.bool)
        mask[:, 2:] = True
        prompt = torch.randint(0, vocab, (b, plen))
        finetune_cond = torch.randn(b, plen + t_len, cond_dim)
        tvec = torch.tensor([0.3, 0.7])
        cfg, rescale = 1.5, 0.75
        with torch.no_grad():
            # mirrors reverse_diffusion's inner step (metis_model.py:280-306)
            ftc = ref.cond_adapter(finetune_cond)
            cur = torch.where(mask[..., None], ref.mask_emb.weight[0],
                              ref.cond_emb(seq))
            cur_prompt = ref.cond_emb(prompt)
            xt_input = torch.cat([cur_prompt, cur], dim=1) + ftc
            embeds = ref.diff_estimator(
                xt_input, tvec, torch.ones(b, plen + t_len))[:, plen:]
            mask_embeds = ref.diff_estimator(
                cur + ftc[:, plen:], tvec, torch.ones(b, t_len))
            std_pos = embeds.std()
            g = embeds + cfg * (embeds - mask_embeds)
            g = rescale * (g * std_pos / g.std()) + (1 - rescale) * g
            ref_logits = ref.to_logit(g).numpy()

        params = metis_stage1_to_flax(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()},
            num_layers=layers)
        ours = Metis(MetisConfig(
            t2s=T2SConfig(hidden=hidden, num_layers=layers, num_heads=heads,
                          codebook_size=vocab, phone_vocab=1024,
                          max_position=64),
            s2a=S2AConfig(hidden=hidden, num_layers=1, num_heads=heads,
                          codebook_size=8, num_quantizers=2, semantic_dim=8,
                          max_position=64),
            cond_feature_dim=cond_dim,
        ))
        logits = ours.apply(
            {"params": params}, jnp.asarray(seq.numpy()),
            jnp.asarray(mask.numpy()), jnp.asarray(tvec.numpy()),
            jnp.asarray(prompt.numpy()), jnp.asarray(finetune_cond.numpy()),
            cfg, rescale, method=Metis.task_sample_step)
        # torch .std() is unbiased (ddof=1) vs jnp.std biased — the rescale
        # branch differs by ~n/(n-1); tolerance covers it at test size
        np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=3e-3)


class TestJetsRoundTrip:
    """Full JETS inference-path oracle (ref jets.py:573-620): legacy FFT
    encoder → variance predictors → conv p/e embeds added to hs →
    exp(d)-1 length regulation → legacy FFT decoder → HiFiGAN generator.
    (The training-only alignment module has its own oracle; the training
    forward differs from inference only by the raw-scalar ps/es add and
    random segmenting.)"""

    def test_inference_parity(self, tmp_path):
        import sys as _sys
        import types as _types

        import jax.numpy as jnp

        if "unidecode" not in _sys.modules:
            mod = _types.ModuleType("unidecode")
            mod.unidecode = lambda s: s
            _sys.modules["unidecode"] = mod
        if "inflect" not in _sys.modules:
            mod = _types.ModuleType("inflect")
            mod.engine = lambda: SimpleNamespace(
                number_to_words=lambda *a, **k: "")
            _sys.modules["inflect"] = mod

        import models.tts.jets.jets as ref_jets_mod

        from amphion_tpu.models.tts.fastspeech2.fs2 import FastSpeech2Config
        from amphion_tpu.models.tts.jets.jets import Jets, JetsConfig
        from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig
        from amphion_tpu.utils.convert import torch_jets_to_flax

        # the reference hardcodes attention_dim=256 (jets.py:421), so the
        # transformer hidden must be 256; keep everything else tiny
        hidden = 256
        cfg = _fs2_ref_cfg(str(tmp_path))
        # _AttrDict reads go through __getitem__ — update the dict keys
        cfg.model.transformer.update(
            encoder_hidden=hidden, decoder_hidden=hidden,
            encoder_layer=1, decoder_layer=1)
        cfg.train.segment_size = 8
        # stub the vendored load_config("egs/vocoder/gan/hifigan/...") with
        # a tiny HiFiGAN config (the ctor overrides n_mel = attention_dim)
        hifi = SimpleNamespace(
            model=SimpleNamespace(hifigan=SimpleNamespace(
                resblock="2", upsample_rates=[2, 2],
                upsample_kernel_sizes=[4, 4], upsample_initial_channel=16,
                resblock_kernel_sizes=[3],
                resblock_dilation_sizes=[[1, 3]])),
            preprocess=SimpleNamespace(n_mel=hidden))
        orig_load = ref_jets_mod.load_config
        ref_jets_mod.load_config = lambda path: hifi
        try:
            torch.manual_seed(100)
            ref = ref_jets_mod.Jets(cfg).eval()
        finally:
            ref_jets_mod.load_config = orig_load

        torch.manual_seed(101)
        b, n = 1, 6
        texts = torch.randint(1, 30, (b, n))
        data = {"spk_id": torch.zeros(b, dtype=torch.long), "texts": texts,
                "text_len": torch.tensor([n])}
        with torch.no_grad():
            wav_t, d_t = ref.inference(data)

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = torch_jets_to_flax(
            sd, enc_layers=1, dec_layers=1, upsample_rates=(2, 2),
            resblock_kernel_sizes=(3,), resblock="2",
            dilations_per_block=2)
        total = int(d_t.sum())
        ours = Jets(JetsConfig(
            fs2=FastSpeech2Config(
                num_phones=sd["encoder.src_word_emb.weight"].shape[0],
                hidden=hidden, n_enc_layers=1, n_dec_layers=1, n_heads=2,
                ffn_hidden=32, kernel_size=9, n_mel=8, max_frames=total,
                variance_hidden=16),
            decoder=HiFiGANConfig(
                resblock="2", upsample_rates=(2, 2),
                upsample_kernel_sizes=(4, 4), upsample_initial_channel=16,
                resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
                n_mel=hidden)))
        wav_j, _ = ours.apply(
            {"params": params}, jnp.asarray(texts.numpy()), jnp.ones((b, n)),
            method=Jets.infer)
        assert wav_j.shape[1] == wav_t.shape[-1]
        np.testing.assert_allclose(np.asarray(wav_j),
                                   wav_t.numpy().reshape(b, -1), atol=3e-4)


class TestValleRefRoundTrip:
    """Checkpoint-compatible VALL-E oracle (ref valle.py:25): AR logits
    (text-block/causal-audio attention, learnable positional alphas),
    NAR stage logits (adaptive layer norms + per-stage embeddings,
    prefix modes 0/1), and full greedy zero-shot decode parity (AR loop +
    sequential NAR codebooks) through converted weights."""

    def _build_ref(self, prefix_mode=0, q=4):
        import sys as _sys
        import types as _types

        if "torchmetrics" not in _sys.modules:
            tm = _types.ModuleType("torchmetrics")
            tmc = _types.ModuleType("torchmetrics.classification")

            class _Acc(torch.nn.Module):
                def __init__(self, *a, **k):
                    super().__init__()

                def forward(self, *a, **k):
                    return torch.tensor(0.0)

            tmc.MulticlassAccuracy = _Acc
            tm.classification = tmc
            _sys.modules["torchmetrics"] = tm
            _sys.modules["torchmetrics.classification"] = tmc
        from models.tts.valle.valle import VALLE

        cfg = SimpleNamespace(
            decoder_dim=32, nhead=4, nar_scale_factor=1, num_quantizers=q,
            num_decoder_layers=2, text_token_num=40, audio_token_num=24,
            prepend_bos=False, add_prenet=False, norm_first=True,
            prefix_mode=prefix_mode, share_embedding=True)
        torch.manual_seed(110)
        return VALLE(cfg).eval(), cfg

    def _ours(self, cfg, sd):
        from amphion_tpu.models.tts.valle.valle_ref import (
            ValleRef,
            ValleRefConfig,
        )
        from amphion_tpu.utils.convert import valle_ref_to_flax

        params = valle_ref_to_flax(sd, num_layers=cfg.num_decoder_layers,
                                   num_quantizers=cfg.num_quantizers)
        ours = ValleRef(ValleRefConfig(
            text_token_num=cfg.text_token_num,
            audio_token_num=cfg.audio_token_num,
            decoder_dim=cfg.decoder_dim, nhead=cfg.nhead,
            num_decoder_layers=cfg.num_decoder_layers,
            num_quantizers=cfg.num_quantizers, norm_first=cfg.norm_first,
            prefix_mode=cfg.prefix_mode, prepend_bos=cfg.prepend_bos))
        return ours, params

    def test_ar_and_nar_logits_parity(self):
        import jax.numpy as jnp

        from amphion_tpu.models.tts.valle.valle_ref import ValleRef

        ref, cfg = self._build_ref(prefix_mode=1)
        torch.manual_seed(111)
        b, s, t = 2, 5, 7
        text = torch.randint(1, 40, (b, s))
        y = torch.randint(0, 24, (b, t))
        codes = torch.randint(0, 24, (b, t, cfg.num_quantizers))

        with torch.no_grad():
            # AR: mirror _forward_ar_decoder (valle.py:330-372), no padding
            x = ref.ar_text_position(ref.ar_text_embedding(text))
            y_pos = ref.ar_audio_position(ref.ar_audio_embedding(y))
            xy_pos = torch.concat([x, y_pos], dim=1)
            x_attn = torch.nn.functional.pad(
                torch.zeros((s, s), dtype=torch.bool), (0, t), value=True)
            y_attn = torch.nn.functional.pad(
                torch.triu(torch.ones(t, t, dtype=torch.bool), diagonal=1),
                (s, 0), value=False)
            mask = torch.concat([x_attn, y_attn], dim=0)
            attn = torch.zeros_like(mask, dtype=x.dtype).masked_fill(
                mask, float("-inf"))
            xy_dec, _ = ref.ar_decoder((xy_pos, None), mask=attn)
            ar_logits_t = ref.ar_predict_layer(xy_dec[:, s:])

            # NAR stage 2, prefix_mode 1 with prefix_len 3: mirror
            # _forward_nar_decoder + PromptPreparer mode 1
            stage, plen = 2, 3
            xn = ref.nar_text_position(ref.nar_text_embedding(text))
            y_prompts = ref.nar_audio_embeddings[0](codes[:, :plen, 0])
            y_emb = ref.nar_audio_embeddings[0](codes[:, plen:, 0])
            for j in range(1, cfg.num_quantizers):
                y_prompts = y_prompts + ref.nar_audio_embeddings[j](
                    codes[:, :plen, j])
                if j < stage:
                    y_emb = y_emb + ref.nar_audio_embeddings[j](
                        codes[:, plen:, j])
            y_full = torch.concat([y_prompts, y_emb], dim=1)
            y_posn = ref.nar_audio_position(y_full)
            xy = torch.concat([xn, y_posn], dim=1)
            xy_dec_n, _ = ref.nar_decoder(
                (xy, ref.nar_stage_embeddings[stage - 1].weight))
            nar_logits_t = ref.nar_predict_layers[stage - 1](xy_dec_n[:, s:])

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        ours, params = self._ours(cfg, sd)
        ar_logits_j = ours.apply(
            {"params": params}, jnp.asarray(text.numpy()),
            jnp.asarray(y.numpy()), jnp.ones((b, s)), jnp.ones((b, t)),
            method=ValleRef.ar_logits)
        np.testing.assert_allclose(np.asarray(ar_logits_j),
                                   ar_logits_t.numpy(), atol=2e-4)
        nar_logits_j = ours.apply(
            {"params": params}, jnp.asarray(text.numpy()),
            jnp.asarray(codes.numpy()), stage, jnp.ones((b, s)),
            jnp.ones((b, t)), plen, method=ValleRef.nar_logits)
        np.testing.assert_allclose(np.asarray(nar_logits_j),
                                   nar_logits_t.numpy(), atol=2e-4)

    def test_greedy_zero_shot_decode_parity(self):
        import jax.numpy as jnp

        import models.tts.valle.valle as ref_valle_mod

        from amphion_tpu.models.tts.valle.valle_ref import (
            valle_ref_ar_generate,
            valle_ref_nar_generate,
        )

        ref, cfg = self._build_ref(prefix_mode=0)
        torch.manual_seed(112)
        text = torch.randint(1, 40, (1, 4))
        prompts = torch.randint(0, 24, (1, 3, cfg.num_quantizers))

        orig = ref_valle_mod.topk_sampling
        ref_valle_mod.topk_sampling = (
            lambda logits, **kw: torch.argmax(logits, -1, keepdim=True))
        try:
            with torch.no_grad():
                codes_t = ref.inference(
                    text, torch.tensor([4]), prompts, torch.tensor([4]))
        finally:
            ref_valle_mod.topk_sampling = orig

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        ours, params = self._ours(cfg, sd)
        codes0 = valle_ref_ar_generate(
            ours, params, jnp.asarray(text.numpy()),
            jnp.asarray(prompts.numpy()[..., 0]))
        codes_j = valle_ref_nar_generate(
            ours, params, jnp.asarray(text.numpy()), codes0,
            jnp.asarray(prompts.numpy()))
        np.testing.assert_array_equal(np.asarray(codes_j), codes_t.numpy())


class TestValleRefContinual:
    """`continual` parity (valle.py:611): prefix = min(T/2, 225), codebook
    0 of the continuation kept, codebooks 1..7 regenerated by argmax."""

    def test_continual_parity(self):
        import jax.numpy as jnp

        from amphion_tpu.models.tts.valle.valle_ref import valle_ref_continual

        helper = TestValleRefRoundTrip()
        ref, cfg = helper._build_ref(prefix_mode=0, q=8)
        torch.manual_seed(120)
        text = torch.randint(1, 40, (1, 4))
        y = torch.randint(0, 24, (1, 10, 8))
        with torch.no_grad():
            codes_t = ref.continual(text, torch.tensor([4]), y)

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        ours, params = helper._ours(cfg, sd)
        codes_j = valle_ref_continual(ours, params,
                                      jnp.asarray(text.numpy()),
                                      jnp.asarray(y.numpy()))
        np.testing.assert_array_equal(np.asarray(codes_j), codes_t.numpy())


class TestVitsSVCRoundTrip:
    """Full VitsSVC oracle (ref models/svc/vits/vits.py:81): condition
    encoder → ContentEncoder prior (rel-attn + 1x1 proj) → flow reverse →
    GAN-zoo HiFiGAN decoder, deterministic inference (noise 0)."""

    def test_inference_parity(self):
        import jax
        import jax.numpy as jnp

        from models.svc.vits.vits import SynthesizerTrn

        from amphion_tpu.models.svc.vits_svc import VitsSVC, VitsSVCConfig
        from amphion_tpu.models.tts.vits.vits import VITSConfig
        from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig
        from amphion_tpu.modules.condition_encoder import (
            ConditionEncoderConfig,
        )
        from amphion_tpu.utils.convert import vits_svc_to_flax

        class _Cfg(SimpleNamespace):
            def __contains__(self, k):
                return hasattr(self, k)

        D = 16  # hidden == condition output
        cond = _Cfg(
            merge_mode="add",
            use_whisper=True, whisper_dim=12, content_encoder_dim=D,
            use_contentvec=False, use_mert=False, use_wenet=False,
            use_f0=True, use_uv=True,
            input_melody_dim=1, output_melody_dim=D, n_bins_melody=256,
            f0_min=50, f0_max=1100,
            use_energy=True, input_loudness_dim=1, output_loudness_dim=D,
            n_bins_loudness=256,
            use_spkid=True, singer_table_size=8, output_singer_dim=D,
            use_conformer_for_content_features=False,
        )
        hifi = SimpleNamespace(
            resblock="2", upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
            upsample_initial_channel=16, resblock_kernel_sizes=[3],
            resblock_dilation_sizes=[[1, 3]])
        vits = SimpleNamespace(
            inter_channels=8, hidden_channels=D, filter_channels=32,
            n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.0,
            n_flow_layer=4, gin_channels=8, n_speakers=8)
        ref_cfg = SimpleNamespace(
            model=SimpleNamespace(vits=vits, generator="hifigan",
                                  generator_config=SimpleNamespace(hifigan=hifi),
                                  condition_encoder=cond),
            preprocess=SimpleNamespace(pitch_bin=256, f0_min=50, f0_max=1100,
                                       n_mel=8),
        )
        torch.manual_seed(130)
        ref = SynthesizerTrn(spec_channels=16, segment_size=4,
                             cfg=ref_cfg).eval()

        torch.manual_seed(131)
        rng = np.random.default_rng(131)
        B, T = 2, 12
        f0 = rng.uniform(100, 500, (B, T)).astype(np.float32)
        uv = np.ones((B, T), np.int64)
        loud = rng.uniform(0, 1.5, (B, T)).astype(np.float32)
        whisper = rng.standard_normal((B, T, 12)).astype(np.float32)
        spk = np.array([[2], [5]], np.int64)
        data = {
            "frame_pitch": torch.from_numpy(f0),
            "frame_uv": torch.from_numpy(uv),
            "frame_energy": torch.from_numpy(loud),
            "whisper_feat": torch.from_numpy(whisper),
            "spk_id": torch.from_numpy(spk),
            "target_len": torch.tensor([T, T]),
        }
        with torch.no_grad():
            # deterministic inference composition (infer with noise 0,
            # ref vits.py:238-268)
            g = ref.emb_g(torch.from_numpy(spk)[:, 0][:, None]).transpose(1, 2)
            x = ref.condition_encoder(data).transpose(1, 2)
            x_mask = torch.ones(B, 1, T)
            _, m_p, logs_p, _ = ref.enc_p(x, x_mask, noice_scale=0.0)
            z = ref.flow(m_p, x_mask, g=g, reverse=True)
            wav_t = ref.dec(z * x_mask)

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = vits_svc_to_flax(sd, n_layers=2, num_upsamples=2,
                                  num_kernels=1, resblock="2",
                                  dilations_per_block=2)
        ours = VitsSVC(VitsSVCConfig(
            vits=VITSConfig(
                spec_channels=16, inter_channels=8, hidden_channels=D,
                filter_channels=32, n_heads=2, n_layers=2, kernel_size=3,
                n_speakers=8, gin_channels=8, segment_size=4,
                decoder=HiFiGANConfig(
                    resblock="2", upsample_rates=(2, 2),
                    upsample_kernel_sizes=(4, 4), upsample_initial_channel=16,
                    resblock_kernel_sizes=(3,),
                    resblock_dilation_sizes=((1, 3),), n_mel=8)),
            condition=ConditionEncoderConfig(
                output_dim=D, merge_mode="add",
                use_whisper=True, whisper_dim=12,
                use_f0=True, pitch_bin=256, f0_min=50.0, f0_max=1100.0,
                use_uv=True, use_loudness=True, loudness_bins=256,
                use_singer=True, num_singers=8)))
        feats = {
            "f0": jnp.asarray(f0), "uv": jnp.asarray(uv),
            "loudness": jnp.asarray(loud), "whisper": jnp.asarray(whisper),
            "singer": jnp.asarray(spk[:, 0]),
        }
        wav_j = ours.apply(
            {"params": params}, feats, jnp.ones((B, T)), jax.random.key(0),
            jnp.asarray(spk[:, 0]), 0.0, method=VitsSVC.infer)
        np.testing.assert_allclose(np.asarray(wav_j),
                                   wav_t.numpy()[:, 0, :], atol=3e-4)


class TestFACodecV2RoundTrip:
    """FACodecDecoderV2 oracle (ref facodec.py:848): the prosody branch
    quantizes melspec_encoder(melspec_linear(prosody_feature)) instead of
    the raw latents; quantize + inference through converted weights."""

    def test_v2_quantize_and_inference_parity(self):
        import jax.numpy as jnp

        from models.codec.ns3_codec.facodec import FACodecDecoderV2

        from amphion_tpu.models.codec.amphion_codec import CodecConfig
        from amphion_tpu.models.codec.facodec import (
            FACodecConfig,
            FACodecDecoder,
        )
        from amphion_tpu.utils.convert import facodec_decoder_to_flax

        torch.manual_seed(140)
        ref = FACodecDecoderV2(
            in_channels=256, upsample_initial_channel=64, up_ratios=(5, 2),
            vq_num_q_c=2, vq_num_q_p=1, vq_num_q_r=3, vq_dim=256,
            codebook_dim=4, codebook_size_prosody=4, codebook_size_content=4,
            codebook_size_residual=4).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = facodec_decoder_to_flax(sd, up_ratios=(5, 2))

        torch.manual_seed(141)
        z = torch.randn(2, 256, 8) * 0.5
        pf = torch.randn(2, 20, 8) * 0.5  # (B, 20 mel bins, N)
        with torch.no_grad():
            outs_t, qs_t, _, bufs_t, spk_t = ref(
                z, pf, vq=True, eval_vq=False)
            # V2 has no separate `inference`; the decode path is identical
            # to V1 (timbre film + conv stack)
            style = ref.timbre_linear(spk_t).unsqueeze(2)
            gamma, beta = style.chunk(2, 1)
            xin = ref.timbre_norm(outs_t.transpose(1, 2)).transpose(1, 2)
            audio_t = ref.model(xin * gamma + beta)

        ours = FACodecDecoder(FACodecConfig(
            codec=CodecConfig(encoder_dim=4, latent_dim=256, decoder_dim=16,
                              strides=(2, 5)),
            prosody_layers=1, content_layers=2, detail_layers=3,
            codebook_size=16, codebook_dim=4, version=2))
        zj = jnp.asarray(z.transpose(1, 2).numpy())
        pfj = jnp.asarray(pf.transpose(1, 2).numpy())
        outs_j, codes_j, _, bufs_j, spk_j = ours.apply(
            {"params": params}, zj, pfj, method=FACodecDecoder.quantize)
        np.testing.assert_array_equal(np.asarray(codes_j), qs_t.numpy())
        np.testing.assert_allclose(
            np.asarray(outs_j), outs_t.transpose(1, 2).numpy(), atol=3e-5)
        np.testing.assert_allclose(np.asarray(spk_j), spk_t.numpy(),
                                   atol=3e-5)
        audio_j = ours.apply({"params": params}, outs_j, spk_j,
                             method=FACodecDecoder.inference)
        np.testing.assert_allclose(
            np.asarray(audio_j), audio_t[:, 0].numpy(), atol=3e-4)


class TestValleRefPromptedNAR:
    """NAR prefix modes 2/4 (separate prompt segment, PromptPreparer
    `_handle_prefix_mode_2_4`): prompt embedded with ALL quantizers,
    target with 0..stage-1; logits over the target region."""

    def test_prompted_nar_logits_parity(self):
        import jax.numpy as jnp

        from amphion_tpu.models.tts.valle.valle_ref import ValleRef

        helper = TestValleRefRoundTrip()
        ref, cfg = helper._build_ref(prefix_mode=4)
        torch.manual_seed(150)
        b, s, t, lp, stage = 2, 5, 7, 3, 2
        text = torch.randint(1, 40, (b, s))
        codes = torch.randint(0, 24, (b, t, cfg.num_quantizers))
        prompts = torch.randint(0, 24, (b, lp, cfg.num_quantizers))

        with torch.no_grad():
            # mirror _forward_nar_decoder + _handle_prefix_mode_2_4
            xn = ref.nar_text_position(ref.nar_text_embedding(text))
            y_prompts = ref.nar_audio_embeddings[0](prompts[..., 0])
            for j in range(1, cfg.num_quantizers):
                y_prompts = y_prompts + ref.nar_audio_embeddings[j](
                    prompts[..., j])
            y_emb = ref.nar_audio_embeddings[0](codes[..., 0])
            for j in range(1, stage):
                y_emb = y_emb + ref.nar_audio_embeddings[j](codes[..., j])
            y_full = torch.concat([y_prompts, y_emb], dim=1)
            y_pos = ref.nar_audio_position(y_full)
            xy = torch.concat([xn, y_pos], dim=1)
            xy_dec, _ = ref.nar_decoder(
                (xy, ref.nar_stage_embeddings[stage - 1].weight))
            logits_t = ref.nar_predict_layers[stage - 1](xy_dec[:, s + lp:])

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        ours, params = helper._ours(cfg, sd)
        logits_j = ours.apply(
            {"params": params}, jnp.asarray(text.numpy()),
            jnp.asarray(codes.numpy()), jnp.asarray(prompts.numpy()), stage,
            jnp.ones((b, s)), jnp.ones((b, t)),
            method=ValleRef.nar_logits_prompted)
        np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                                   atol=2e-4)
