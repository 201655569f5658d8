import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.models.tta.audioldm import AudioLDM, AudioLDMConfig, audioldm_sample
from amphion_tpu.models.tta.autoencoder_kl import AutoencoderKL, AutoencoderKLConfig
from amphion_tpu.models.tts.naturalspeech2.ns2 import (
    NaturalSpeech2,
    NS2Config,
    ns2_sample,
)

VAE_TINY = AutoencoderKLConfig(base_channels=8, channel_mults=(1, 2), latent_channels=4)
LDM_TINY = AudioLDMConfig(
    latent_channels=4, base_channels=8, channel_mults=(1, 2), attn_levels=(1,),
    num_heads=2, text_dim=16, num_train_steps=20,
)
NS2_TINY = NS2Config(
    num_phones=20, latent_dim=8, hidden=16, n_layers=1, n_heads=2,
    ffn_filter=32, predictor_filter=16, predictor_layers=2,
    predictor_cattn_every=2, predictor_heads=2, wavenet_layers=2,
    wavenet_cattn_every=2, wavenet_heads=2, query_tokens=4, max_frames=24,
)


def test_autoencoder_kl(rng):
    vae = AutoencoderKL(VAE_TINY)
    x = jnp.asarray(rng.standard_normal((2, 16, 8, 1)).astype(np.float32))
    params = vae.init(jax.random.key(0), x, jax.random.key(1),
                      method=AutoencoderKL.loss)["params"]
    (total, parts) = vae.apply(
        {"params": params}, x, jax.random.key(2), method=AutoencoderKL.loss
    )
    assert np.isfinite(float(total))
    z, mu, logvar = vae.apply(
        {"params": params}, x, None, method=AutoencoderKL.encode
    )
    assert z.shape == (2, 8, 4, 4)  # downsampled once, latent_channels=4
    recon = vae.apply({"params": params}, z, method=AutoencoderKL.decode)
    assert recon.shape == x.shape


def test_audioldm_loss_and_sample(rng):
    ldm = AudioLDM(LDM_TINY)
    z0 = jnp.asarray(rng.standard_normal((2, 8, 4, 4)).astype(np.float32))
    text = jnp.asarray(rng.standard_normal((2, 5, 16)).astype(np.float32))
    params = ldm.init(
        jax.random.key(0), z0, text, jax.random.key(1), method=AudioLDM.loss
    )["params"]
    loss, _ = ldm.apply(
        {"params": params}, z0, text, jax.random.key(2), method=AudioLDM.loss
    )
    assert np.isfinite(float(loss))
    out = audioldm_sample(
        ldm, params, text, (2, 8, 4, 4), jax.random.key(3), num_steps=4,
        guidance_scale=2.0,
    )
    assert out.shape == (2, 8, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_ns2_loss_and_sample(rng):
    model = NaturalSpeech2(NS2_TINY)
    b, lp = 2, 5
    phones = jnp.asarray(rng.integers(1, 20, (b, lp)))
    pmask = jnp.ones((b, lp), jnp.float32)
    durs = jnp.asarray(rng.integers(1, 5, (b, lp)))
    latent = jnp.asarray(rng.standard_normal((b, 24, 8)).astype(np.float32))
    pitch = jnp.abs(jnp.asarray(
        rng.standard_normal((b, 24)).astype(np.float32))) * 100 + 80
    prompt = jnp.asarray(rng.standard_normal((b, 6, 8)).astype(np.float32))
    ref_mask = jnp.ones((b, 6), jnp.float32)
    fmask_in = jnp.ones((b, 24), jnp.float32)
    params = model.init(
        jax.random.key(0), latent, phones, pmask, prompt, ref_mask, durs,
        pitch, fmask_in, jax.random.key(1), method=NaturalSpeech2.loss,
    )["params"]
    loss, parts = model.apply(
        {"params": params}, latent, phones, pmask, prompt, ref_mask, durs,
        pitch, fmask_in, jax.random.key(2), method=NaturalSpeech2.loss,
    )
    assert np.isfinite(float(loss))
    z, fmask = ns2_sample(
        model, params, phones, pmask, prompt, ref_mask, jax.random.key(3),
        num_steps=4, max_frames=24,
    )
    assert z.shape == (b, 24, 8)
    assert np.isfinite(np.asarray(z)).all()
