"""FACodec (NaturalSpeech3): factorized codec — prosody / content / detail
branches + global timbre, checkpoint-compatible with the reference
(`models/codec/ns3_codec/facodec.py`: `FACodecEncoder:157`,
`FACodecDecoder:242`, `FACodecRedecoder:602`, CNNLSTM predictor heads `:35`,
`transformer.py` encoder with the batch-indexed positional-encoding quirk,
`quantize/{fvq,rvq}.py` L2-normalized factorized RVQ).

Structure (all convs weight-normed, all activations anti-aliased SnakeBeta):
- encoder: conv k7 → EncoderBlocks (3 dilated ResidualUnits + strided conv,
  channel doubling) → SnakeBeta → conv k3 → latents (B, N, D)
- decoder: three factorized RVQ branches over the latents (prosody /
  content("phone") / residual-detail, the residual branch quantizing
  x - (prosody + content).detach()), a timbre TransformerEncoder whose
  mean-pooled output is the speaker embedding, FiLM (timbre_linear γ/β on a
  non-affine LayerNorm) re-injecting timbre, then a mirror conv stack
- redecoder: code embeddings + timbre-conditioned prosody encoder (SALN)
  for zero-shot VC from codes alone

The `FACodec` facade keeps this repo's trainer-facing API
(__call__/voice_conversion/encode_branches) on top of the faithful modules.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.models.codec.amphion_codec import CodecConfig
from amphion_tpu.modules.activations import SnakeBeta
from amphion_tpu.modules.anti_aliasing import (
    Activation1d,
    downsample1d,
    upsample1d,
)
from amphion_tpu.modules.quantize import FactorizedVectorQuantize
from amphion_tpu.modules.saln_transformer import (
    NS3SALN,
    NS3TransformerEncoder,
    NS3TransformerLayer,
)


@jax.custom_vjp
def gradient_reversal(x, scale=1.0):
    return x


def _grl_fwd(x, scale):
    return x, scale


def _grl_bwd(scale, g):
    return (-scale * g, None)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)


def _layer_norm_noaffine(x, eps=1e-5):
    """torch nn.LayerNorm(elementwise_affine=False) over the last dim."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


@dataclass(frozen=True)
class FACodecConfig:
    codec: CodecConfig = field(default_factory=CodecConfig)
    prosody_layers: int = 1  # vq_num_q_p
    content_layers: int = 2  # vq_num_q_c
    detail_layers: int = 3  # vq_num_q_r
    codebook_size: int = 1024  # true size (the reference passes log2)
    codebook_dim: int = 8
    timbre_dim: int = 256  # facade compat; ref spk emb dim == latent dim
    num_speakers: int = 512
    grl_scale: float = 1.0
    timbre_layers: int = 4
    timbre_heads: int = 4
    timbre_filter: int = 1024
    phone_vocab: int = 5003
    predict_f0_phone: bool = False  # CNNLSTM aux heads (training losses)
    prob_random_mask_residual: float = 0.75
    # V2 (ref FACodecEncoderV2/DecoderV2, facodec.py:772/848): the prosody
    # branch quantizes a low-mel prosody feature (first 20 mel bins of a
    # 16 kHz mel, hop == codec hop) passed through Linear(20, D) + a 4-layer
    # NS3 transformer, instead of the raw latents. Encoder is unchanged.
    version: int = 1


def _wn_conv(feats, k, name, strides=None, dilation=1, padding="SAME"):
    return nn.WeightNorm(nn.Conv(
        feats, (k,), strides=None if strides is None else (strides,),
        kernel_dilation=(dilation,), padding=padding, name=name))


class FAResidualUnit(nn.Module):
    """AA-SnakeBeta → WN conv k7 dilated → AA-SnakeBeta → WN conv k1,
    residual (ref facodec.py:121)."""

    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        y = Activation1d(SnakeBeta(self.dim, alpha_logscale=True))(x)
        y = _wn_conv(self.dim, 7, "conv1", dilation=self.dilation)(y)
        y = Activation1d(SnakeBeta(self.dim, alpha_logscale=True))(y)
        y = _wn_conv(self.dim, 1, "conv2")(y)
        return x + y


class FACodecEncoder(nn.Module):
    """(B, T) waveform → (B, T/hop, out_channels) (ref facodec.py:157)."""

    ngf: int = 32
    up_ratios: tuple[int, ...] = (2, 4, 5, 5)
    out_channels: int = 256

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:
            x = x[..., None]
        h = _wn_conv(self.ngf, 7, "conv_pre")(x)
        d = self.ngf
        for i, s in enumerate(self.up_ratios):
            d *= 2
            for j, dil in enumerate((1, 3, 9)):
                h = FAResidualUnit(d // 2, dil, name=f"block_{i}_res_{j}")(h)
            h = Activation1d(SnakeBeta(d // 2, alpha_logscale=True,
                                       name=f"down_act_{i}"))(h)
            # torch symmetric padding ceil(s/2); right side only needs s//2
            h = _wn_conv(d, 2 * s, f"down_{i}", strides=s,
                         padding=[(s // 2 + s % 2, s // 2)])(h)
        h = Activation1d(SnakeBeta(d, alpha_logscale=True, name="final_act"))(h)
        return _wn_conv(self.out_channels, 3, "conv_out")(h)


class FADecoderBlock(nn.Module):
    """AA-SnakeBeta → WN deconv (k=2s, torch p=ceil(s/2), out_pad=s%2) →
    3 dilated ResidualUnits (ref facodec.py:220)."""

    in_dim: int
    out_dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        s, k = self.stride, 2 * self.stride
        h = Activation1d(SnakeBeta(self.in_dim, alpha_logscale=True,
                                   name="act"))(x)
        p = s // 2 + s % 2
        # flax custom padding for torch ConvTranspose1d(p, output_padding=s%2)
        h = nn.WeightNorm(nn.ConvTranspose(
            self.out_dim, (k,), strides=(s,),
            padding=((k - 1 - p, k - 1 - s // 2),), name="up"))(h)
        for j, dil in enumerate((1, 3, 9)):
            h = FAResidualUnit(self.out_dim, dil, name=f"res_{j}")(h)
        return h


class CNNLSTMHead(nn.Module):
    """ref CNNLSTM (facodec.py:35): 3 ResidualUnits (dil 1/2/3) +
    AA-SnakeBeta + per-head Linear."""

    dim: int
    outdim: int
    heads: int
    global_pred: bool = False

    @nn.compact
    def __call__(self, x):
        for j, dil in enumerate((1, 2, 3)):
            x = FAResidualUnit(self.dim, dil, name=f"res_{j}")(x)
        x = Activation1d(SnakeBeta(self.dim, alpha_logscale=True,
                                   name="act"))(x)
        if self.global_pred:
            x = jnp.mean(x, axis=1)
        return [nn.Dense(self.outdim, name=f"head_{i}")(x)
                for i in range(self.heads)]


class FABranchRVQ(nn.Module):
    """One ns3 ResidualVQ branch (quantize/rvq.py:12): a stack of
    L2-normalized FactorizedVectorQuantize layers."""

    num_layers: int
    codebook_size: int
    codebook_dim: int
    input_dim: int
    commitment: float = 0.005

    def setup(self):
        self.layers = [
            FactorizedVectorQuantize(
                self.codebook_size, self.codebook_dim, self.input_dim,
                self.commitment, use_l2_normlize=True, name=f"layer_{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, x):
        residual = x
        out = jnp.zeros_like(x)
        idxs, commits = [], 0.0
        for q in self.layers:
            zq, idx, ld = q(residual)
            residual = residual - zq
            out = out + zq
            idxs.append(idx)
            commits = commits + ld["vq_commit"] + ld["vq_codebook"]
        return out, jnp.stack(idxs), commits

    def vq2emb(self, codes):
        """(L, B, T) → (B, T, D)."""
        out = None
        for i, q in enumerate(self.layers):
            d = q.decode(codes[i])
            out = d if out is None else out + d
        return out


class FACodecDecoder(nn.Module):
    """ref facodec.py:242 — quantizer branches + timbre + FiLM + conv stack.

    Methods mirror the reference forward modes: `quantize` (vq=True path,
    returns (z_q_sum, codes, commit, [prosody, content, detail] bufs,
    spk_embs)), `decode` (vq=False path), `inference(x, spk)`, `vq2emb`."""

    cfg: FACodecConfig

    def setup(self):
        c = self.cfg
        d = c.codec.latent_dim
        mk = lambda n, name: FABranchRVQ(
            n, c.codebook_size, c.codebook_dim, d, name=name)
        self.q_prosody = mk(c.prosody_layers, "q_prosody")
        self.q_content = mk(c.content_layers, "q_content")
        self.q_detail = mk(c.detail_layers, "q_detail")
        self.timbre_encoder = NS3TransformerEncoder(
            hidden=d, num_layers=c.timbre_layers, heads=c.timbre_heads,
            filter_size=c.timbre_filter, name="timbre_encoder")
        if c.version == 2:
            self.melspec_linear = nn.Dense(d, name="melspec_linear")
            self.melspec_encoder = NS3TransformerEncoder(
                hidden=d, num_layers=4, heads=4, filter_size=1024,
                name="melspec_encoder")
        self.timbre_linear = nn.Dense(
            2 * d, name="timbre_linear",
            bias_init=lambda k, s, dtype=jnp.float32: jnp.concatenate(
                [jnp.ones(d, dtype), jnp.zeros(d, dtype)]))
        if c.predict_f0_phone:
            self.f0_predictor = CNNLSTMHead(d, 1, 2, name="f0_predictor")
            self.phone_predictor = CNNLSTMHead(d, c.phone_vocab, 1,
                                               name="phone_predictor")
        self.spk_classifier = CNNLSTMHead(d, c.num_speakers, 1,
                                          global_pred=True,
                                          name="x_timbre_predictor")
        # conv stack: conv_pre + DecoderBlocks + final act/conv
        up_init = c.codec.decoder_dim * (2 ** len(c.codec.strides))
        self.pre_conv = _wn_conv(up_init, 7, "conv_pre")
        blocks = []
        ch = up_init
        for i, s in enumerate(tuple(reversed(c.codec.strides))):
            blocks.append(FADecoderBlock(ch, ch // 2, s, name=f"up_block_{i}"))
            ch //= 2
        self.blocks = blocks
        self.final_act = SnakeBeta(ch, alpha_logscale=True, name="final_out_act")
        self.post_conv = _wn_conv(1, 7, "conv_post")

    # -- reference forward modes --------------------------------------------

    def quantize(self, z, prosody_feature=None):
        """z (B, N, D) latents → (z_q_sum, codes (Qtot, B, N), commit,
        [prosody, content, detail] quantized bufs, spk_embs).

        V2 (`FACodecDecoderV2.quantize`, ref facodec.py:1026-1056): the
        prosody branch quantizes ``melspec_encoder(melspec_linear(
        prosody_feature))`` instead of the raw latents."""
        if self.cfg.version == 2:
            assert prosody_feature is not None
            p_in = self.melspec_encoder(self.melspec_linear(prosody_feature))
            zp, ip, lp = self.q_prosody(p_in)
        else:
            zp, ip, lp = self.q_prosody(z)
        # ref quantize(): the content branch re-quantizes the RAW latents,
        # the detail branch quantizes x - (prosody + content).detach()
        zc, ic, lc = self.q_content(z)
        zr, ir, lr = self.q_detail(z - jax.lax.stop_gradient(zp + zc))
        outs = zp + zc + zr
        codes = jnp.concatenate([ip, ic, ir], axis=0)
        spk = jnp.mean(self.timbre_encoder(z), axis=1)
        return outs, codes, lp + lc + lr, (zp, zc, zr), spk

    def _film(self, x, spk):
        style = self.timbre_linear(spk)[:, None, :]  # (B, 1, 2D)
        gamma, beta = jnp.split(style, 2, axis=-1)
        x = _layer_norm_noaffine(x)  # ref timbre_norm: LN without affine
        return x * gamma + beta

    def _stack(self, x):
        h = self.pre_conv(x)
        for blk in self.blocks:
            h = blk(h)
        h = downsample1d(self.final_act(upsample1d(h, 2)), 2)
        return jnp.tanh(self.post_conv(h))[..., 0]

    def decode(self, quantized, spk, rng=None, train=False):
        """(prosody, content, detail) bufs + spk emb → audio + aux preds
        (ref forward vq=False, facodec.py:473-560)."""
        c = self.cfg
        zp, zc, zr = quantized
        out = {}
        if c.predict_f0_phone:
            f0, uv = self.f0_predictor(zp)
            (phone,) = self.phone_predictor(zc)
            out.update(f0=f0[..., 0], uv=uv[..., 0], phone=phone)
        if train and rng is not None:
            # random residual-branch dropout (ref :514-535)
            keep = (jax.random.uniform(rng, (zr.shape[0], 1, 1))
                    >= c.prob_random_mask_residual).astype(zr.dtype)
            x = (jax.lax.stop_gradient(zp) + jax.lax.stop_gradient(zc)
                 + zr * keep)
        else:
            x = jax.lax.stop_gradient(zp) + jax.lax.stop_gradient(zc) + zr
        (spk_logits,) = self.spk_classifier(
            gradient_reversal(x, c.grl_scale))
        out["spk_logits"] = spk_logits
        out["audio"] = self._stack(self._film(x, spk))
        return out

    def inference(self, x, spk):
        """Summed latents + speaker embedding → audio (ref :560-576)."""
        return self._stack(self._film(x, spk))

    def vq2emb(self, codes, use_residual=True):
        """codes (Qtot, B, T) → summed latents (B, T, D) (ref :548-560)."""
        c = self.cfg
        p, cc = c.prosody_layers, c.content_layers
        out = self.q_prosody.vq2emb(codes[:p])
        out = out + self.q_content.vq2emb(codes[p:p + cc])
        if use_residual and c.detail_layers > 0:
            out = out + self.q_detail.vq2emb(codes[p + cc:])
        return out


class FACodecRedecoder(nn.Module):
    """ref facodec.py:602 — zero-shot VC from codes: per-layer code
    embeddings, timbre-conditioned (SALN) prosody encoder, FiLM + conv
    stack."""

    cfg: FACodecConfig

    def setup(self):
        c = self.cfg
        d = c.codec.latent_dim
        self.prosody_embs = [
            nn.Embed(c.codebook_size, d,
                     embedding_init=nn.initializers.normal(1e-5),
                     name=f"prosody_emb_{i}")
            for i in range(c.prosody_layers)]
        self.content_embs = [
            nn.Embed(c.codebook_size, d,
                     embedding_init=nn.initializers.normal(1e-5),
                     name=f"content_emb_{i}")
            for i in range(c.content_layers)]
        self.residual_embs = [
            nn.Embed(c.codebook_size, d,
                     embedding_init=nn.initializers.normal(1e-5),
                     name=f"residual_emb_{i}")
            for i in range(c.detail_layers)]
        self.timbre_cond_prosody_enc = NS3TransformerEncoder(
            hidden=d, num_layers=c.timbre_layers, heads=c.timbre_heads,
            filter_size=c.timbre_filter, use_cln=True,
            name="timbre_cond_prosody_enc")
        self.timbre_linear = nn.Dense(
            2 * d, name="timbre_linear",
            bias_init=lambda k, s, dtype=jnp.float32: jnp.concatenate(
                [jnp.ones(d, dtype), jnp.zeros(d, dtype)]))
        up_init = c.codec.decoder_dim * (2 ** len(c.codec.strides))
        self.pre_conv = _wn_conv(up_init, 7, "conv_pre")
        blocks = []
        ch = up_init
        for i, s in enumerate(tuple(reversed(c.codec.strides))):
            blocks.append(FADecoderBlock(ch, ch // 2, s, name=f"up_block_{i}"))
            ch //= 2
        self.blocks = blocks
        self.final_act = SnakeBeta(ch, alpha_logscale=True, name="final_out_act")
        self.post_conv = _wn_conv(1, 7, "conv_post")

    def vq2emb(self, codes, spk, use_residual=True):
        """codes (Qtot, B, T) + speaker embedding (B, D) → summed latents
        (B, T, D) (ref vq2emb, facodec.py:742-765 — includes the
        timbre-conditioned SALN prosody encoder)."""
        c = self.cfg
        x_p = 0.0
        for i in range(c.prosody_layers):
            x_p = x_p + self.prosody_embs[i](codes[i])
        t = x_p.shape[1]
        spk_cond = jnp.broadcast_to(spk[:, None, :], (spk.shape[0], t, spk.shape[1]))
        x_p = self.timbre_cond_prosody_enc(x_p, condition=spk_cond)
        x = x_p
        for i in range(c.content_layers):
            x = x + self.content_embs[i](codes[c.prosody_layers + i])
        if use_residual:
            for i in range(c.detail_layers):
                x = x + self.residual_embs[i](
                    codes[c.prosody_layers + c.content_layers + i])
        return x

    def inference(self, x, spk):
        """Latents (B, T, D) + speaker embedding → audio (ref inference,
        facodec.py:766-775). Note: the reference's `forward` applies its
        timbre_norm on the wrong axis (transpose-before-norm bug,
        facodec.py:755-759) and crashes for T != in_channels; this
        vq2emb→inference composition is the working reference path."""
        style = self.timbre_linear(spk)[:, None, :]
        gamma, beta = jnp.split(style, 2, axis=-1)
        x = _layer_norm_noaffine(x)
        x = x * gamma + beta
        h = self.pre_conv(x)
        for blk in self.blocks:
            h = blk(h)
        h = downsample1d(self.final_act(upsample1d(h, 2)), 2)
        return jnp.tanh(self.post_conv(h))[..., 0]

    def __call__(self, codes, spk, use_residual_code=False):
        """codes (Qtot, B, T) + speaker embedding (B, D) → audio (the ref
        forward intent, with the norm applied on the feature axis)."""
        return self.inference(
            self.vq2emb(codes, spk, use_residual=use_residual_code), spk)


class FACodec(nn.Module):
    """Facade keeping the repo's trainer/inference API on the faithful
    encoder/decoder: __call__(audio, speaker_id, rng, train),
    encode_branches, voice_conversion."""

    cfg: FACodecConfig

    def setup(self):
        c = self.cfg
        self.encoder = FACodecEncoder(
            ngf=c.codec.encoder_dim, up_ratios=tuple(c.codec.strides),
            out_channels=c.codec.latent_dim)
        self.decoder = FACodecDecoder(c)

    def encode_branches(self, audio, rng=None, train=False):
        z = self.encoder(audio)
        outs, codes, commit, bufs, spk = self.decoder.quantize(z)
        losses = {"vq_commit": commit}
        return z, spk, bufs, codes, losses

    def __call__(self, audio, speaker_id=None, rng=None, train=False):
        c = self.cfg
        z = self.encoder(audio)
        outs, codes, commit, bufs, spk = self.decoder.quantize(z)
        dec = self.decoder.decode(bufs, spk, rng=rng, train=train)
        losses = {"vq_commit": commit}
        if speaker_id is not None:
            # adversarial speaker removal (GRL head over the summed
            # timbre-free latents; ref use_gr_x_timbre)
            logp = jax.nn.log_softmax(dec["spk_logits"], axis=-1)
            losses["spk_adv"] = -jnp.mean(
                jnp.take_along_axis(logp, speaker_id[:, None], axis=-1))
        return dec["audio"], codes, spk, losses

    def voice_conversion(self, audio_src, audio_ref):
        """Source prosody/content/detail + reference timbre (the
        FACodecRedecoder capability, run through the main decoder)."""
        z_src = self.encoder(audio_src)
        _, _, _, bufs, _ = self.decoder.quantize(z_src)
        z_ref = self.encoder(audio_ref)
        _, _, _, _, spk_ref = self.decoder.quantize(z_ref)
        zp, zc, zr = bufs
        return self.decoder.inference(zp + zc + zr, spk_ref)


def facodec_prosody_feature(audio: jax.Array) -> jax.Array:
    """V2 prosody feature (ref `FACodecEncoderV2.get_prosody_feature`,
    facodec.py:820-822): first 20 bins of a 16 kHz mel (n_fft 1024,
    hop 200 = the codec hop, win 800, fmax 8000) → (B, N, 20)."""
    from amphion_tpu.ops.mel import MelConfig, mel_spectrogram

    mel = mel_spectrogram(audio, MelConfig(
        sample_rate=16000, n_fft=1024, win_size=800, hop_size=200,
        n_mel=80, fmin=0.0, fmax=8000.0))
    return mel[:, :20, :].transpose(0, 2, 1)
