import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
from amphion_tpu.models.codec.codec_trainer import (
    create_codec_states,
    make_codec_train_step,
    multiscale_mel_loss,
)
from amphion_tpu.models.codec.repcodec import RepCodec, RepCodecConfig
from amphion_tpu.models.vocoders.gan_trainer import CombinedDiscriminator, GANTrainConfig

TINY = CodecConfig(
    sample_rate=8000, encoder_dim=8, latent_dim=16, decoder_dim=8,
    strides=(2, 4), num_quantizers=2, codebook_size=64, codebook_dim=4,
)


def test_codec_roundtrip_shapes(rng):
    codec = AmphionCodec(TINY)
    audio = jnp.asarray((rng.standard_normal((2, 8 * TINY.hop)) * 0.2).astype(np.float32))
    variables = codec.init(jax.random.key(0), audio)
    recon, codes, losses = codec.apply(variables, audio)
    assert recon.shape == audio.shape
    assert codes.shape == (2, 2, 8)
    toks = codec.apply(variables, audio, method=AmphionCodec.encode)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(codes))
    wav = codec.apply(variables, toks, method=AmphionCodec.decode_codes)
    assert wav.shape == audio.shape


def test_codec_gan_step(rng):
    codec = AmphionCodec(TINY)
    disc = CombinedDiscriminator(use=("mpd",), mpd_periods=(2,), channel_mult=0.0625)
    audio = jnp.asarray((rng.standard_normal((2, 16 * TINY.hop)) * 0.2).astype(np.float32))
    gstate, dstate = create_codec_states(codec, disc, jax.random.key(0), audio)
    step = make_codec_train_step(codec)
    batch = {"audio": audio}
    first = None
    for i in range(6):
        gstate, dstate, m = step(gstate, dstate, batch)
        if i == 0:
            first = {k: float(v) for k, v in m.items()}
            assert all(np.isfinite(v) for v in first.values())
    assert float(m["g_mel"]) < first["g_mel"]


def test_repcodec_overfit(rng):
    cfg = RepCodecConfig(feature_dim=16, hidden=24, codebook_size=32,
                         codebook_dim=4, num_blocks=1)
    model = RepCodec(cfg)
    feats = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
    params = model.init(jax.random.key(0), feats)["params"]
    recon, tokens, losses = model.apply({"params": params}, feats)
    assert recon.shape == feats.shape and tokens.shape == (2, 12)
    toks = model.apply({"params": params}, feats, method=RepCodec.encode)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(tokens))

    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            _, _, ld = model.apply({"params": p}, feats)
            return ld["recon"] + ld["vq_commit"] + ld["vq_codebook"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    losses_hist = []
    for _ in range(40):
        params, opt, loss = step(params, opt)
        losses_hist.append(float(loss))
    assert losses_hist[-1] < losses_hist[0] * 0.5


def test_multiscale_mel_loss_zero_for_identical(rng):
    a = jnp.asarray((rng.standard_normal((1, 4096)) * 0.2).astype(np.float32))
    assert float(multiscale_mel_loss(a, a, 8000)) == 0.0
    b = a + 0.05
    assert float(multiscale_mel_loss(a, b, 8000)) > 0


# ---------------------------------------------------------------------------
# Length-masked ragged decode (serving pad-bleed fix)
# ---------------------------------------------------------------------------


def _masked_vs_solo(codec, variables, codes_padded, lengths, hop):
    """Rows of a length-masked padded decode must equal unpadded solo
    decodes (the whole point: no pad bleed through the conv/iSTFT
    receptive field). Tolerance covers program-shape reduction-order
    drift only."""
    batched = np.asarray(codec.apply(
        variables, codes_padded, jnp.asarray(lengths, jnp.int32),
        method=AmphionCodec.decode_codes))
    for i, n in enumerate(lengths):
        solo = np.asarray(codec.apply(
            variables, codes_padded[:, i:i + 1, :n],
            method=AmphionCodec.decode_codes))[0]
        np.testing.assert_allclose(
            batched[i, : n * hop], solo, rtol=0, atol=1e-5,
            err_msg=f"row {i} len {n}")


def test_decode_codes_length_masked_conv(rng):
    codec = AmphionCodec(TINY)
    audio = jnp.asarray(
        (rng.standard_normal((3, 12 * TINY.hop)) * 0.2).astype(np.float32))
    variables = codec.init(jax.random.key(0), audio)
    codes = codec.apply(variables, audio, method=AmphionCodec.encode)
    _masked_vs_solo(codec, variables, np.asarray(codes), [12, 7, 3], TINY.hop)


def test_decode_codes_length_masked_vocos(rng):
    cfg = CodecConfig(
        sample_rate=8000, encoder_dim=8, latent_dim=16, decoder_dim=8,
        strides=(2, 4), num_quantizers=2, codebook_size=64, codebook_dim=4,
        use_vocos_decoder=True, vocos_dim=16, vocos_intermediate_dim=32,
        vocos_num_layers=2, vocos_n_fft=32, vocos_hop=8)
    codec = AmphionCodec(cfg)
    audio = jnp.asarray(
        (rng.standard_normal((3, 16 * 8)) * 0.2).astype(np.float32))
    variables = codec.init(jax.random.key(1), audio)
    codes = codec.apply(variables, audio, method=AmphionCodec.encode)
    _masked_vs_solo(codec, variables, np.asarray(codes), [16, 9, 5],
                    cfg.vocos_hop)


def test_decode_codes_unmasked_tail_differs(rng):
    """Sanity: WITHOUT frame_lengths the shorter row's tail really does
    bleed pad content (otherwise the masked path is vacuous)."""
    codec = AmphionCodec(TINY)
    audio = jnp.asarray(
        (rng.standard_normal((2, 12 * TINY.hop)) * 0.2).astype(np.float32))
    variables = codec.init(jax.random.key(0), audio)
    codes = np.asarray(codec.apply(variables, audio,
                                   method=AmphionCodec.encode))
    n = 5
    plain = np.asarray(codec.apply(
        variables, codes, method=AmphionCodec.decode_codes))
    solo = np.asarray(codec.apply(
        variables, codes[:, :1, :n], method=AmphionCodec.decode_codes))[0]
    tail = slice((n - 2) * TINY.hop, n * TINY.hop)
    assert np.abs(plain[0, tail] - solo[tail]).max() > 1e-4
