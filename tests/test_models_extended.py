import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.models.svc.vits_svc import VitsSVC, VitsSVCConfig
from amphion_tpu.models.tts.jets.jets import Jets, JetsConfig
from amphion_tpu.models.tts.fastspeech2.fs2 import FastSpeech2Config
from amphion_tpu.models.tts.metis.metis import Metis, MetisConfig
from amphion_tpu.models.tts.maskgct.maskgct import S2AConfig, T2SConfig
from amphion_tpu.models.tts.vits.vits import VITSConfig
from amphion_tpu.models.vc.noro import Noro, NoroConfig, noro_convert
from amphion_tpu.models.vocoders.hifigan import HiFiGANConfig
from amphion_tpu.modules.condition_encoder import ConditionEncoderConfig
from amphion_tpu.modules.wavenet_denoiser import WaveNetDenoiserConfig
from amphion_tpu.runtime.optimizers import (
    build_optimizer,
    eden_schedule,
    eve,
    noam_schedule,
    scaled_adam,
)


def test_jets_train_and_infer(rng):
    fs2 = FastSpeech2Config(
        num_phones=16, hidden=16, n_enc_layers=1, n_dec_layers=1, n_heads=2,
        ffn_hidden=32, n_mel=16, max_frames=24,
        pitch_level="phoneme", energy_level="phoneme",
    )
    dec = HiFiGANConfig(
        resblock="2", upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), n_mel=16,
    )
    model = Jets(JetsConfig(fs2=fs2, decoder=dec))
    phones = jnp.asarray(rng.integers(1, 16, (2, 5)))
    pmask = jnp.ones((2, 5), jnp.float32)
    mel = jnp.asarray(rng.standard_normal((2, 20, 16)).astype(np.float32))
    mmask = jnp.ones((2, 20), jnp.float32)
    pitch = jnp.zeros((2, 24))
    energy = jnp.zeros((2, 24))
    params = model.init(
        jax.random.key(0), phones, pmask, mel, mmask, pitch, energy,
        method=Jets.train_forward,
    )["params"]
    wav, fmask, aux = model.apply(
        {"params": params}, phones, pmask, mel, mmask, pitch, energy,
        method=Jets.train_forward,
    )
    assert wav.shape == (2, 24 * 8)
    assert np.isfinite(float(aux["align_loss"]))
    assert (np.asarray(aux["durations"]).sum(1) == 20).all()  # MAS covers mel
    wav_i, _ = model.apply(
        {"params": params}, phones, pmask, method=Jets.infer
    )
    assert wav_i.shape == (2, 24 * 8)


def test_vits_svc(rng):
    vcfg = VITSConfig(
        spec_channels=17, inter_channels=8, hidden_channels=8,
        filter_channels=16, n_heads=2, n_layers=1, n_speakers=4,
        gin_channels=8, segment_size=4,
        decoder=HiFiGANConfig(
            resblock="2", upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
            upsample_initial_channel=16, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),), n_mel=8,
        ),
    )
    cond = ConditionEncoderConfig(output_dim=8, use_whisper=True, whisper_dim=6,
                                  num_singers=4)
    model = VitsSVC(VitsSVCConfig(vits=vcfg, condition=cond))
    feats = {
        "whisper": jnp.asarray(rng.standard_normal((2, 12, 6)).astype(np.float32)),
        "f0": jnp.full((2, 12), 220.0),
        "uv": jnp.ones((2, 12)),
        "loudness": jnp.full((2, 12), 0.1),
        "singer": jnp.asarray([0, 1]),
    }
    spec = jnp.asarray(rng.standard_normal((2, 12, 17)).astype(np.float32))
    fmask = jnp.ones((2, 12), jnp.float32)
    params = model.init(
        jax.random.key(0), feats, spec, fmask, jax.random.key(1),
        jnp.asarray([0, 1]), method=VitsSVC.train_forward,
    )["params"]
    out = model.apply(
        {"params": params}, feats, spec, fmask, jax.random.key(2),
        jnp.asarray([0, 1]), method=VitsSVC.train_forward,
    )
    assert out["wav_segment"].shape == (2, 4 * 8)
    wav = model.apply(
        {"params": params}, feats, fmask, jax.random.key(3), jnp.asarray([2, 3]),
        method=VitsSVC.infer,
    )
    assert wav.shape == (2, 12 * 8)


def test_metis_tasks(rng):
    cfg = MetisConfig(
        t2s=T2SConfig(hidden=32, num_layers=1, num_heads=4, codebook_size=24,
                      phone_vocab=16, max_position=64),
        s2a=S2AConfig(hidden=32, num_layers=1, num_heads=4, codebook_size=16,
                      num_quantizers=2, semantic_dim=8, max_position=64),
        cond_feature_dim=8,
    )
    model = Metis(cfg)
    x0 = jnp.asarray(rng.integers(0, 24, (2, 10)))
    xmask = jnp.ones((2, 10), jnp.float32)
    phones = jnp.asarray(rng.integers(0, 16, (2, 4)))
    pmask = jnp.ones((2, 4), jnp.float32)
    # time-aligned adapter conditioning (ref metis_model.py:131-136 adds
    # the SimpleAdapter output element-wise to the token embeddings)
    cond = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    params = model.init(
        jax.random.key(0), "tts", x0, xmask, jax.random.key(1), phones, pmask,
        method=Metis.t2s_loss,
    )["params"]
    loss_tts, _ = model.apply(
        {"params": params}, "tts", x0, xmask, jax.random.key(2), phones, pmask,
        method=Metis.t2s_loss,
    )
    assert np.isfinite(float(loss_tts))
    # continuous-conditioned task (se) requires its own params (extra
    # modules); init again with that signature
    params_se = model.init(
        jax.random.key(0), "se", x0, xmask, jax.random.key(1), None, None, cond,
        method=Metis.t2s_loss,
    )["params"]
    loss_se, _ = model.apply(
        {"params": params_se}, "se", x0, xmask, jax.random.key(3), None, None,
        cond, method=Metis.t2s_loss,
    )
    assert np.isfinite(float(loss_se))

    # task-conditioned inference (ref metis_infer_{vc,se,tse}.py): the
    # mask-predict sampler with element-wise adapter conditioning
    from amphion_tpu.models.tts.metis.metis import (
        metis_infer_se,
        metis_infer_vc,
    )

    toks = metis_infer_se(model, params_se, cond, target_len=10,
                          rng=jax.random.key(4), n_steps=3)
    assert toks.shape == (2, 10)
    assert (np.asarray(toks) >= 0).all() and (np.asarray(toks) < 24).all()
    # with a semantic prompt (vc/tse route): cond covers [prompt ‖ target]
    prompt = jnp.asarray(rng.integers(0, 24, (2, 4)))
    cond_vc = jnp.asarray(rng.standard_normal((2, 14, 8)).astype(np.float32))
    toks_vc = metis_infer_vc(model, params_se, cond_vc, target_len=10,
                             rng=jax.random.key(5), prompt_tokens=prompt,
                             n_steps=3)
    assert toks_vc.shape == (2, 10)


def test_noro(rng):
    cfg = NoroConfig(
        n_mel=8, content_dim=6, hidden=16, ref_in_dim=8, ref_layers=1,
        ref_heads=2, ref_filter=32, num_query_emb=4, wavenet_layers=2,
        wavenet_cattn_every=2, wavenet_heads=2,
    )
    model = Noro(cfg)
    mel = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    content = jnp.asarray(rng.standard_normal((2, 10, 6)).astype(np.float32))
    f0 = jnp.full((2, 10), 200.0)
    ref_c = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
    ref_n = ref_c + 0.3 * jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
    mask = jnp.ones((2, 10))
    params = model.init(
        jax.random.key(0), mel, content, f0, ref_c, ref_n, mask,
        jax.random.key(1), method=Noro.loss,
    )["params"]
    loss, parts = model.apply(
        {"params": params}, mel, content, f0, ref_c, ref_n, mask,
        jax.random.key(2), method=Noro.loss,
    )
    assert np.isfinite(float(loss))
    out = noro_convert(model, params, content, f0, ref_c, jax.random.key(3),
                       num_steps=4)
    assert out.shape == mel.shape


def test_optimizers(rng):
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for tx in (eve(1e-3), scaled_adam(1e-2)):
        state = tx.init(params)
        updates, state = tx.update(grads, state, params)
        new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        assert np.isfinite(np.asarray(new["w"])).all()
        assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"]))
    # schedules decrease after warmup
    s = noam_schedule(256, warmup=10)
    assert float(s(jnp.asarray(1000))) < float(s(jnp.asarray(10)))
    e = eden_schedule(1e-3)
    assert float(e(jnp.asarray(100000))) < float(e(jnp.asarray(1)))
    # factory
    from amphion_tpu.utils.config import JsonHParams

    for name in ("adamw", "adam", "sgd", "eve", "scaledadam"):
        assert build_optimizer(name, JsonHParams(lr=1e-3)) is not None
