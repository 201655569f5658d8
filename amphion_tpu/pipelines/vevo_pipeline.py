"""Vevo zero-shot voice imitation pipeline (VC / AC / style / TTS).

Assembly equivalent of the reference (reference:
`models/vc/vevo/vevo_utils.py:175` `VevoInferencePipeline` —
`inference_ar_and_fm:403`, `inference_fm:572`; duration-reduced content
tokens `:306`; Vevo1.5 singing variant `models/svc/vevosing/
vevosing_utils.py:153`):

- content tokenizer: HuBERT features → VQ-32 (style-removed, duration-
  reduced); content-style tokenizer: VQ-8192;
- AR transformer maps content/phone tokens → content-style tokens
  (Vevo-Voice / Vevo-TTS);
- flow-matching transformer renders mel with prompt-prefix timbre;
- Vocos vocoder → waveform.

Four products map to flags (ref `models/vc/vevo/README.md:16-21`):
Vevo-Timbre (fm only), Vevo-Style/-Voice (ar + fm), Vevo-TTS (phone ar + fm).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.models.codec.repcodec import RepCodec
from amphion_tpu.models.vc.ar_transformer import ARTransformer, ar_transformer_generate
from amphion_tpu.models.vc.flow_matching_transformer import (
    FlowMatchingTransformer,
    fmt_inference,
)
from amphion_tpu.models.vocoders.vocos import VocosGenerator
from amphion_tpu.ops.mel import MelConfig, mel_spectrogram


def duration_reduce(tokens: np.ndarray) -> np.ndarray:
    """Collapse consecutive duplicate tokens (ref `vevo_utils.py:306`)."""
    tokens = np.asarray(tokens)
    if tokens.size == 0:
        return tokens
    keep = np.concatenate([[True], tokens[1:] != tokens[:-1]])
    return tokens[keep]


@dataclass
class VevoPipeline:
    content_tokenizer: RepCodec  # vocab 32
    style_tokenizer: RepCodec  # vocab 8192
    ar: ARTransformer
    fm: FlowMatchingTransformer
    vocoder: VocosGenerator
    params: dict  # {"content_tokenizer","style_tokenizer","ar","fm","vocoder"}
    hubert_extractor: object = None  # (audio, sr) -> (T, D)
    mel_cfg: MelConfig = MelConfig()

    # -- tokenization --------------------------------------------------------

    def _ssl(self, audio: np.ndarray) -> jax.Array:
        feats = self.hubert_extractor(audio, self.mel_cfg.sample_rate)
        return jnp.asarray(feats)[None]

    def content_tokens(self, audio: np.ndarray, reduce: bool = True) -> np.ndarray:
        # method-by-name keeps any tokenizer with an `encode` method usable
        # (RepCodec here, or the checkpoint-compatible VevoRepCodec —
        # `models/codec/vevo_repcodec.py` — for converted reference weights)
        toks = self.content_tokenizer.apply(
            {"params": self.params["content_tokenizer"]}, self._ssl(audio),
            method="encode",
        )
        toks = np.asarray(toks)[0]
        return duration_reduce(toks) if reduce else toks

    def style_tokens(self, audio: np.ndarray) -> np.ndarray:
        toks = self.style_tokenizer.apply(
            {"params": self.params["style_tokenizer"]}, self._ssl(audio),
            method="encode",
        )
        return np.asarray(toks)[0]

    def _mel(self, audio: np.ndarray) -> jax.Array:
        """(1, T, n_mel) mel of a waveform, hop-truncated."""
        hop = self.mel_cfg.hop_size
        t = max(len(audio) // hop * hop, hop)
        return mel_spectrogram(
            jnp.asarray(audio[:t])[None], self.mel_cfg
        ).transpose(0, 2, 1)

    # -- stages (ref vevo_utils.py:403-600) ---------------------------------

    def ar_stage(self, input_tokens: np.ndarray, rng, max_new=2048,
                 speculative: int = 0, draft_layers: int = 3, **sample_kw):
        """AR content→content-style decode. ``speculative=k`` switches to
        self-speculative decode (models/vc/speculative.py — exact same
        output distribution; greedy draft of k tokens verified per full
        pass; the early-exit while-loop converts acceptance into fewer
        iterations). 0 = plain scan decode.

        Measured tuning (BENCHMARKS.md vevo_spec_accept, single v5e, a
        12-layer model at α≈0.99): SHALLOW drafts win — draft_layers=3
        with k=8 gave 3.13× over plain greedy; d=5 only 1.7-1.8×; d=8
        barely breaks even. Speedup is acceptance-dependent
        (speedup(α) ≈ (αk+1)·t_step/t_iter, validated within ~15% on
        hardware) — measure α on YOUR checkpoint first via
        ``ar_transformer_generate_speculative(..., return_iters=True)``:
        α = (gen_len/n_iters − 1)/k; below the breakeven α
        (~(t_iter/t_step − 1)/k) keep ``speculative=0``."""
        if speculative > 0:
            from amphion_tpu.models.vc.speculative import (
                ar_transformer_generate_speculative,
            )

            tokens, lengths = ar_transformer_generate_speculative(
                self.ar, self.params["ar"],
                jnp.asarray(input_tokens)[None], rng=rng, max_new=max_new,
                draft_layers=draft_layers, k=speculative, **sample_kw)
        else:
            tokens, lengths = ar_transformer_generate(
                self.ar, self.params["ar"], jnp.asarray(input_tokens)[None],
                rng, max_new=max_new, **sample_kw,
            )
        n = int(lengths[0])
        return np.asarray(tokens)[0, :n]

    def fm_stage(self, style_tokens: np.ndarray, prompt_audio: np.ndarray,
                 rng, flow_matching_steps: int = 32,
                 prompt_tokens: np.ndarray | None = None,
                 compute_dtype: str = "bfloat16",
                 solver: str = "euler") -> jax.Array:
        """`flow_matching_steps`/`solver` trade latency for ODE fidelity —
        see the measured `fm_frontier` table in BENCHMARKS.md (16 Euler
        steps ≈ half the FM latency for little fidelity loss; the
        reference pins 32, `vevo_utils.py:414`)."""
        prompt_mel = self._mel(prompt_audio)  # (1, Np, n_mel)
        csf = self.fm.cfg.cond_scale_factor
        # prompt token region carries the timbre reference's OWN
        # content-style tokens (ref vevo_utils.py:549-553 concatenates
        # timbre_ref_hubert_codecs before the predicted codecs); extract
        # them from the prompt audio unless the caller already has them
        if prompt_tokens is None:
            prompt_tokens = self.style_tokens(prompt_audio)
        # align mel prefix to a whole number of condition tokens
        n_ptok = min(len(prompt_tokens), prompt_mel.shape[1] // csf)
        n_p = n_ptok * csf
        prompt_mel = prompt_mel[:, :n_p]
        tok = jnp.concatenate([
            jnp.asarray(prompt_tokens[:n_ptok], jnp.int32),
            jnp.asarray(style_tokens, jnp.int32),
        ])[None]
        # fmt_inference takes the clean prompt mel as the prefix and
        # returns only the generated target region (ref reverse_diffusion)
        return fmt_inference(
            self.fm, self.params["fm"], tok, prompt_mel, rng,
            num_steps=flow_matching_steps, compute_dtype=compute_dtype,
            solver=solver,
        )

    def vocode(self, mel: jax.Array) -> np.ndarray:
        # jitted (unjitted module.apply dispatches op-by-op on TPU)
        if not hasattr(self, "_vocode_jit"):
            object.__setattr__(self, "_vocode_jit", jax.jit(
                lambda p, m: self.vocoder.apply({"params": p}, m)))
        wav = self._vocode_jit(self.params["vocoder"], mel)
        return np.asarray(wav)[0]

    # -- products ------------------------------------------------------------

    def inference_fm(self, src_audio, ref_audio, rng, **kw):
        """Vevo-Timbre: keep source style tokens, re-render with ref timbre."""
        style = self.style_tokens(src_audio)
        mel = self.fm_stage(style, ref_audio, rng, **kw)
        return self.vocode(mel)

    def ar_style_prompt(self, style_ref_audio):
        """(prompt_output_tokens, ref_mel) for style-prompted AR decode (ref
        vevo_utils.py:528-543): the style reference's own content-style
        tokens prefix the output stream so generation continues in that
        style; its mel feeds the global encoder when the AR has one."""
        prompt_out = self.style_tokens(style_ref_audio)[None]
        ref_mel = (self._mel(style_ref_audio)
                   if self.ar.cfg.use_global_timbre else None)
        return jnp.asarray(prompt_out, jnp.int32), ref_mel

    def inference_ar_and_fm(self, src_audio, style_ref_audio, timbre_ref_audio,
                            rng, use_style_prompt: bool = True,
                            max_new: int = 2048, **kw):
        """Vevo-Voice/-Style: content of src → style tokens of style-ref →
        timbre of timbre-ref. Vevo-Style (accent conversion) is this with
        ``timbre_ref_audio = src_audio`` (ref infer_vevostyle.py:12-19).

        Style prompting follows the reference (vevo_utils.py:486-543):
        content tokens are extracted from [style_ref ‖ src] so the AR sees
        the reference's content as context, and the output stream is
        prompted with the style reference's own content-style tokens
        (dropped from the result — our AR generate returns only new
        tokens). ``use_style_prompt=False`` = the reference's
        global-guided mode (global encoder only)."""
        r1, r2 = jax.random.split(rng)
        if use_style_prompt:
            content = self.content_tokens(
                np.concatenate([np.asarray(style_ref_audio),
                                np.asarray(src_audio)]))
            prompt_out, ref_mel = self.ar_style_prompt(style_ref_audio)
        else:
            content = self.content_tokens(src_audio)
            prompt_out = None
            ref_mel = (self._mel(style_ref_audio)
                       if self.ar.cfg.use_global_timbre else None)
        style = self.ar_stage(content, r1, max_new=max_new,
                              prompt_output_tokens=prompt_out,
                              ref_mel=ref_mel)
        mel = self.fm_stage(style, timbre_ref_audio, r2, **kw)
        return self.vocode(mel)

    def inference_tts(self, phone_ids: list[int], timbre_ref_audio, rng,
                      style_ref_audio=None, style_ref_phone_ids=None,
                      max_new: int = 2048, **kw):
        """Vevo-TTS: phones → style tokens → mel with reference timbre.
        With a style reference + its transcript phones, the AR is prompted
        the same way the reference is (vevo_utils.py:464-486: style phones
        prefix the input, style content-style tokens prefix the output)."""
        r1, r2 = jax.random.split(rng)
        ids = list(phone_ids)
        prompt_out = ref_mel = None
        if style_ref_audio is not None:
            if style_ref_phone_ids is not None:
                ids = list(style_ref_phone_ids) + ids
            prompt_out, ref_mel = self.ar_style_prompt(style_ref_audio)
        style = self.ar_stage(np.asarray(ids), r1, max_new=max_new,
                              prompt_output_tokens=prompt_out,
                              ref_mel=ref_mel)
        mel = self.fm_stage(style, timbre_ref_audio, r2, **kw)
        return self.vocode(mel)


@dataclass
class VevoSingPipeline(VevoPipeline):
    """Vevo1.5 singing variant (reference:
    `models/svc/vevosing/vevosing_utils.py:153` — adds the Coco prosody
    tokenizer at 6.25 Hz next to the 12.5 Hz content-style stream; supports
    TTS/VC/SVS/SVC/editing).

    prosody_tokenizer: a `CocoCodec` in "style" mode; its tokens condition
    the AR stage alongside content tokens (concatenated input streams)."""

    prosody_tokenizer: object = None  # CocoCodec(style) module
    prosody_params: dict | None = None

    def _is_coco(self, tokenizer, mode: str) -> bool:
        from amphion_tpu.models.codec.coco import CocoCodec

        return isinstance(tokenizer, CocoCodec) and tokenizer.cfg.mode == mode

    def style_tokens(self, audio: np.ndarray) -> np.ndarray:
        """Content-style tokens. A Coco content-style tokenizer consumes
        whisper-space features AND the chromagram (ref
        ``extract_coco_codec("content_style", ...)``
        `vevosing_utils.py:302-378`); any other tokenizer gets the SSL
        stream only (base behavior)."""
        if self._is_coco(self.style_tokenizer, "contentstyle"):
            feats = self._ssl(audio)
            chroma = self.chromagram(np.asarray(audio))[None]
            n = min(feats.shape[1], chroma.shape[1])
            toks = self.style_tokenizer.apply(
                {"params": self.params["style_tokenizer"]}, feats[:, :n],
                None, jnp.asarray(chroma[:, :n]), method="encode")
            return np.asarray(toks)[0]
        return super().style_tokens(audio)

    def chromagram(self, audio: np.ndarray,
                   frame_len_ratio: float = 1.0,
                   shifted_steps: int = 0) -> np.ndarray:
        """(T, 24) chromagram in the reference's frame convention (ref
        `vevosing_utils.py:380-398`); ``shifted_steps`` pitch-shifts the
        source first (the f0-median-matching trick of `inference_fm`,
        `vevosing_utils.py:425-443`)."""
        from amphion_tpu.data.processors.augment import pitch_shift
        from amphion_tpu.ops.chroma import chromagram_for_frames

        mc = self.mel_cfg
        audio = np.asarray(audio, np.float32)
        if shifted_steps:
            audio = pitch_shift(audio, mc.sample_rate, shifted_steps)
        return chromagram_for_frames(
            audio, len(audio) // mc.hop_size, mc.sample_rate, mc.n_fft,
            mc.hop_size, mc.win_size, frame_len_ratio=frame_len_ratio)

    def shifted_steps_to_match(self, src_audio, ref_audio) -> int:
        """Semitone shift aligning the source's F0 median to the timbre
        reference's (ref `vevosing_utils.py:425-443`)."""
        from amphion_tpu.ops.f0 import F0Config, yin_f0

        fc = F0Config(sample_rate=self.mel_cfg.sample_rate,
                      hop_size=self.mel_cfg.hop_size)

        def median_f0(a):
            f0, _ = yin_f0(jnp.asarray(
                np.asarray(a[: len(a) // fc.hop_size * fc.hop_size],
                           np.float32))[None], fc)
            f0 = np.asarray(f0)[0]
            voiced = f0[f0 > 1.0]
            return float(np.median(voiced)) if voiced.size else 0.0

        src, ref = median_f0(src_audio), median_f0(ref_audio)
        if src <= 0 or ref <= 0:
            return 0
        return int(round(12 * np.log2(ref / src)))

    def prosody_tokens(self, audio: np.ndarray, f0: np.ndarray = None,
                       frame_len_ratio: float = 1.0,
                       shifted_steps: int = 0) -> np.ndarray:
        """Style (prosody) tokens. By default the conditioning is the
        reference's 24-bin chromagram; passing ``f0`` instead uses the
        offline F0-proxy path (tokenizers trained with
        ``style_feature: "f0"``)."""
        assert self.prosody_tokenizer is not None
        if f0 is not None:
            toks = self.prosody_tokenizer.apply(
                {"params": self.prosody_params}, None, jnp.asarray(f0)[None],
                method=type(self.prosody_tokenizer).encode,
            )
        else:
            chroma = self.chromagram(audio, frame_len_ratio, shifted_steps)
            toks = self.prosody_tokenizer.apply(
                {"params": self.prosody_params}, None, None,
                jnp.asarray(chroma)[None],
                method=type(self.prosody_tokenizer).encode,
            )
        return np.asarray(toks)[0]

    def inference_fm(self, src_audio, ref_audio, rng,
                     match_pitch_prosody: bool = False,
                     match_pitch_contentstyle: bool = False, **kw):
        """Vevo1.5 timbre conversion (ref `vevosing_utils.py:400-498`
        ``inference_fm``): content-style tokens of the source re-rendered
        with the reference's timbre. The two flags reproduce
        ``use_shifted_src_to_extract_{prosody,contentstyle}``: the source
        is pitch-shifted to the reference's F0 median before extracting
        the chroma (prosody) and/or whisper (content) streams, so the
        token stream itself carries the target register."""
        if ((match_pitch_prosody or match_pitch_contentstyle)
                and self._is_coco(self.style_tokenizer, "contentstyle")):
            from amphion_tpu.data.processors.augment import pitch_shift

            steps = self.shifted_steps_to_match(src_audio, ref_audio)
            sr = self.mel_cfg.sample_rate
            src = np.asarray(src_audio, np.float32)
            content_src = (pitch_shift(src, sr, steps)
                           if match_pitch_contentstyle and steps else src)
            feats = self._ssl(content_src)
            chroma = self.chromagram(
                src, shifted_steps=steps if match_pitch_prosody else 0)[None]
            n = min(feats.shape[1], chroma.shape[1])
            toks = self.style_tokenizer.apply(
                {"params": self.params["style_tokenizer"]}, feats[:, :n],
                None, jnp.asarray(chroma[:, :n]), method="encode")
            style = np.asarray(toks)[0]
            mel = self.fm_stage(style, ref_audio, rng, **kw)
            return self.vocode(mel)
        return super().inference_fm(src_audio, ref_audio, rng, **kw)

    def inference_svc(self, src_audio, timbre_ref_audio, rng, src_f0=None,
                      match_pitch: bool = False,
                      target_src_duration_ratio: float = 1.0, **kw):
        """Singing voice conversion: content + prosody of source → timbre
        of reference (ref `infer_vevosing_ar.py` conversion task with
        ``use_style_tokens_as_ar_input``). ``match_pitch`` extracts prosody
        from a source pitch-shifted to the reference's F0 median."""
        r1, r2 = jax.random.split(rng)
        content = self.content_tokens(src_audio)
        steps = (self.shifted_steps_to_match(src_audio, timbre_ref_audio)
                 if match_pitch else 0)
        prosody = self.prosody_tokens(
            src_audio, src_f0, frame_len_ratio=target_src_duration_ratio,
            shifted_steps=steps)
        if self.ar.cfg.style_vocab:
            # dedicated prosody stream in the unified vocab (ref svc
            # ar_model.py:126-170: [content block][style block][output])
            style = self.ar_stage(
                content, r1,
                style_tokens=jnp.asarray(prosody, jnp.int32)[None])
        else:
            # legacy single-stream AR: prosody prefixes the content tokens
            style = self.ar_stage(np.concatenate([prosody, content]), r1)
        mel = self.fm_stage(style, timbre_ref_audio, r2, **kw)
        return self.vocode(mel)
