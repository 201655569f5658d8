"""Batched zero-shot TTS serving on top of `MaskGCTPipeline`.

Production counterpart of the reference's single-request gradio demo
(`models/tts/maskgct/gradio_demo.py`): concurrent requests are coalesced
by `MicroBatcher` into shape-bucketed batches and run through the ragged
samplers (`models/tts/maskgct/ragged_sampling.py`) — B requests with
different prompt/target lengths share ONE compiled T2S program, one S2A
program, and one codec decode.

Length buckets: prompt/phone/target lengths are quantized onto ladders
(`bucket_ladder`) so the jit cache stays bounded; only same-bucket
requests batch together. Per-request RNG seeds keep results independent
of batch composition (asserted in tests/test_ragged_sampling.py).

Batched codec decode is length-masked (`decode_codes(..., frame_lengths)`):
every spatial op in the decoder (convs, iSTFT overlap-add + window
normalization) sees zeros beyond each row's valid extent — the same
boundary an unpadded solo decode gets from SAME padding — so shorter rows
in a bucket get no pad bleed in their tails. Remaining approximation: the
float (mel-proxy) semantic conditioning path still runs over the padded
grid; the token-conditioned reference path is positionwise-embedded and
exact.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.models.tts.maskgct.ragged_sampling import (
    pack_prefix_target,
    s2a_sample_ragged,
    t2s_sample_ragged,
)
from amphion_tpu.serving.batcher import MicroBatcher, bucket_ladder


def _pad_to(arr: np.ndarray, length: int, axis: int = 0) -> np.ndarray:
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, length - arr.shape[axis])
    return np.pad(arr, pad)


def _pad_audio_grid(audio: np.ndarray, sr: int, grid_s: float) -> np.ndarray:
    """Pad inbound request audio up to a ``grid_s``-second grid.

    The front-end extractor programs (mel, tokenizers, codecs) are
    jitted per input LENGTH — unbounded request lengths would mean a
    fresh XLA compile per request (tens of seconds through the axon
    tunnel, measured in the `continuous_http` bench). Gridding bounds
    the compile surface to (max_len/grid) programs; the trailing zeros
    are trailing silence. ``grid_s<=0`` disables."""
    audio = np.asarray(audio, np.float32)
    if grid_s <= 0:
        return audio
    g = max(int(grid_s * sr), 1)
    m = max(g, -(-len(audio) // g) * g)
    return np.pad(audio, (0, m - len(audio)))


@dataclass
class _CoreRequest:
    prompt_semantic: np.ndarray  # (Lp,) int
    prompt_acoustic: np.ndarray  # (Q, Lp) int
    phone_ids: np.ndarray  # (Lph,) int
    target_len: int
    seed: int


class MaskGCTService:
    """Thread-safe batched synthesis around a `MaskGCTPipeline`.

    ``synthesize`` may be called concurrently from many threads (e.g. a
    ThreadingHTTPServer); calls in the same length bucket share compiled
    programs and device dispatches.
    """

    def __init__(self, pipeline, max_batch: int = 8, max_wait_ms: float = 50.0,
                 len_step: int = 64, max_prompt_len: int = 512,
                 max_target_len: int = 1024, max_phone_len: int = 512,
                 t2s_kwargs: dict | None = None, s2a_kwargs: dict | None = None,
                 audio_grid_s: float = 0.5):
        self.pipeline = pipeline
        self.audio_grid_s = audio_grid_s
        self.len_step = len_step
        self.max_prompt_len = max_prompt_len
        self.max_target_len = max_target_len
        self.max_phone_len = max_phone_len
        self.t2s_kwargs = dict(t2s_kwargs or {})
        self.s2a_kwargs = dict(s2a_kwargs or {})
        p = pipeline
        self._decode_jit = jax.jit(
            lambda prm, codes, fl: p.acoustic_codec.apply(
                {"params": prm}, codes, fl,
                method=type(p.acoustic_codec).decode_codes))
        self._frontend_lock = threading.Lock()  # g2p symbol table mutation
        self.batcher = MicroBatcher(
            self._run_batch, self._bucket_of, max_batch=max_batch,
            max_wait_ms=max_wait_ms,
        )

    # -- request side ---------------------------------------------------------

    def _bucket_of(self, req: _CoreRequest):
        return (
            bucket_ladder(len(req.prompt_semantic), self.len_step,
                          self.max_prompt_len),
            bucket_ladder(len(req.phone_ids), self.len_step,
                          self.max_phone_len),
            bucket_ladder(req.target_len, self.len_step, self.max_target_len),
        )

    def synthesize(self, prompt_audio: np.ndarray, prompt_text: str,
                   target_text: str, target_len: int | None = None,
                   seed: int = 0) -> np.ndarray:
        """Blocking single request; batches with concurrent callers."""
        p = self.pipeline
        prompt_audio = _pad_audio_grid(prompt_audio, p.sample_rate,
                                       self.audio_grid_s)
        with self._frontend_lock:
            if p.symbol_table is None:
                p.symbol_table = p.g2p.build_symbol_table(
                    [prompt_text, target_text]
                )
            phones_prompt = p.g2p.to_ids(prompt_text, p.symbol_table)
            phones_target = p.g2p.to_ids(target_text, p.symbol_table)
        phone_ids = np.asarray(phones_prompt + phones_target, np.int32)

        prompt_semantic = np.asarray(p.extract_semantic_code(prompt_audio))[0]
        prompt_acoustic = np.asarray(
            jnp.transpose(p.extract_acoustic_code(prompt_audio), (1, 0, 2))
        )[0]  # (Q, Lp)
        lp = min(len(prompt_semantic), prompt_acoustic.shape[1],
                 self.max_prompt_len)
        prompt_semantic = prompt_semantic[:lp]
        prompt_acoustic = prompt_acoustic[:, :lp]
        if target_len is None:
            ratio = max(len(phones_target), 1) / max(len(phones_prompt), 1)
            target_len = int(lp * ratio) + 1
        target_len = min(int(target_len), self.max_target_len)

        req = _CoreRequest(prompt_semantic, prompt_acoustic,
                           phone_ids[: self.max_phone_len], target_len, seed)
        return self.batcher(req)

    def stats(self) -> dict:
        return self.batcher.stats.snapshot()

    # -- batch side -------------------------------------------------------------

    def _run_batch(self, bucket, reqs: list[_CoreRequest]) -> list[np.ndarray]:
        lp_max, lph_max, t_max = bucket
        p = self.pipeline
        b = len(reqs)
        prompt_sem = np.stack(
            [_pad_to(r.prompt_semantic, lp_max) for r in reqs]
        ).astype(np.int32)
        prompt_ac = np.stack(
            [_pad_to(r.prompt_acoustic, lp_max, axis=1) for r in reqs]
        ).astype(np.int32)
        phones = np.stack(
            [_pad_to(r.phone_ids, lph_max) for r in reqs]
        ).astype(np.int32)
        prompt_len = np.asarray([len(r.prompt_semantic) for r in reqs], np.int32)
        phone_len = np.asarray([len(r.phone_ids) for r in reqs], np.int32)
        target_len = np.asarray([r.target_len for r in reqs], np.int32)
        rngs = jax.vmap(jax.random.key)(
            jnp.asarray([r.seed for r in reqs], jnp.uint32)
        )
        r_t2s = jax.vmap(lambda k: jax.random.fold_in(k, 1))(rngs)
        r_s2a = jax.vmap(lambda k: jax.random.fold_in(k, 2))(rngs)

        semantic = t2s_sample_ragged(
            p.t2s, p.params["t2s"], prompt_sem, prompt_len, phones, phone_len,
            target_len, r_t2s, t_max, **self.t2s_kwargs,
        )  # (B, t_max)

        token_cond = "cond_emb" in p.params["s2a"]
        sem_packed = pack_prefix_target(
            jnp.asarray(prompt_sem), semantic, jnp.asarray(prompt_len)
        )
        if not token_cond:
            # mel-proxy checkpoints condition on continuous codec latents
            sem_packed = p.semantic_codec.apply(
                {"params": p.params["semantic_codec"]}, sem_packed,
                method=type(p.semantic_codec).decode_tokens,
            )
        codes = s2a_sample_ragged(
            p.s2a, p.params["s2a"], sem_packed, prompt_ac, prompt_len,
            target_len, r_s2a, t_max, **self.s2a_kwargs,
        )  # (B, Q, t_max)

        # batched length-masked codec decode (pipeline.codec_decode slices
        # row 0 — bypass); frame_lengths kills pad bleed in shorter rows
        wav = np.asarray(self._decode_jit(
            p.params["acoustic_codec"],
            jnp.transpose(codes, (1, 0, 2)),
            jnp.asarray(target_len),
        ))  # (B, T_samples)
        samples_per_frame = wav.shape[-1] / t_max
        return [
            wav[i, : int(round(r.target_len * samples_per_frame))]
            for i, r in enumerate(reqs)
        ]


@dataclass
class _ValleCoreRequest:
    phone_ids: np.ndarray  # (Lph,) int
    prompt_codes: np.ndarray  # (Q, Lp) int
    seed: int


class VALLEService:
    """Batched zero-shot VALL-E serving (AR + NAR + codec decode).

    AR requests are right-aligned-packed (`ops/ragged.py`: exact under the
    RoPE backbone) so B mixed-length requests share one prefill + one
    decode scan; NAR runs compact-packed; decode length comes from each
    request's own EOS (`gen_len`). Same MicroBatcher mechanics and
    per-request RNG isolation as `MaskGCTService`.
    """

    def __init__(self, model, params, tokenizer, g2p, symbol_table,
                 max_batch: int = 8, max_wait_ms: float = 50.0,
                 len_step: int = 64, max_phone_len: int = 256,
                 max_prompt_len: int = 512, max_new: int = 768,
                 temperature: float = 1.0, top_k: int = 50,
                 compute_dtype: str = "bfloat16",
                 audio_grid_s: float = 0.5):
        self.audio_grid_s = audio_grid_s
        self.model = model
        self.params = params
        self.tokenizer = tokenizer  # utils.tokenizer.AudioTokenizer
        self.g2p = g2p
        self.symbol_table = symbol_table
        self.len_step = len_step
        self.max_phone_len = max_phone_len
        self.max_prompt_len = max_prompt_len
        self.max_new = max_new
        self.temperature = temperature
        self.top_k = top_k
        self.compute_dtype = compute_dtype
        self._frontend_lock = threading.Lock()
        self._init_dispatch(max_batch, max_wait_ms)

    def _init_dispatch(self, max_batch, max_wait_ms):
        """Window `MicroBatcher` dispatcher; `ValleContinuousService`
        overrides with the continuous engine."""
        self.batcher = MicroBatcher(
            self._run_batch, self._bucket_of, max_batch=max_batch,
            max_wait_ms=max_wait_ms,
        )

    def _bucket_of(self, req: _ValleCoreRequest):
        return (
            bucket_ladder(len(req.phone_ids), self.len_step,
                          self.max_phone_len),
            bucket_ladder(req.prompt_codes.shape[1], self.len_step,
                          self.max_prompt_len),
        )

    def synthesize(self, prompt_audio: np.ndarray, prompt_text: str,
                   target_text: str, seed: int = 0) -> np.ndarray:
        return self.batcher(self._prepare_request(
            prompt_audio, prompt_text, target_text, seed))

    def _prepare_request(self, prompt_audio, prompt_text, target_text,
                         seed) -> _ValleCoreRequest:
        prompt_audio = _pad_audio_grid(prompt_audio,
                                       self.tokenizer.sample_rate,
                                       self.audio_grid_s)
        with self._frontend_lock:
            ids = self.g2p.to_ids(prompt_text + " " + target_text,
                                  self.symbol_table)
        phone_ids = np.asarray(ids, np.int32)[: self.max_phone_len]
        codes = self.tokenizer.encode(prompt_audio)[0]  # (Q, Lp)
        codes = codes[:, : self.max_prompt_len].astype(np.int32)
        return _ValleCoreRequest(phone_ids, codes, seed)

    def stats(self) -> dict:
        return self.batcher.stats.snapshot()

    def _run_batch(self, bucket, reqs: list[_ValleCoreRequest]):
        from amphion_tpu.models.tts.valle.valle import valle_generate_ragged

        lph_max, lp_max = bucket
        phones = np.stack(
            [_pad_to(r.phone_ids, lph_max) for r in reqs]).astype(np.int32)
        prompts = np.stack(
            [_pad_to(r.prompt_codes, lp_max, axis=1) for r in reqs]
        ).astype(np.int32)
        phone_len = np.asarray([len(r.phone_ids) for r in reqs], np.int32)
        prompt_len = np.asarray(
            [r.prompt_codes.shape[1] for r in reqs], np.int32)
        keys = jax.vmap(jax.random.key)(
            jnp.asarray([r.seed for r in reqs], jnp.uint32))

        codes, gen_len = valle_generate_ragged(
            self.model, self.params, phones, phone_len, prompts, prompt_len,
            keys, max_new=self.max_new, temperature=self.temperature,
            top_k=self.top_k, compute_dtype=self.compute_dtype,
        )
        lens = np.maximum(np.asarray(gen_len), 1).astype(np.int32)
        wav = self.tokenizer.decode(np.asarray(codes), lengths=lens)
        spf = wav.shape[-1] / codes.shape[-1]
        return [
            wav[i, : int(round(max(int(gen_len[i]), 1) * spf))]
            for i in range(len(reqs))
        ]


@dataclass
class _VevoCoreRequest:
    mode: str  # "timbre" (FM only) | "voice" (AR + FM)
    content: np.ndarray  # (Lc,) AR content ids (voice mode; empty otherwise)
    prompt_out: np.ndarray  # (Lo,) AR output-stream style prompt (voice mode)
    target_style: np.ndarray  # (Lt,) target content-style tokens (timbre mode)
    fm_prompt_tokens: np.ndarray  # (Lp,) timbre ref content-style tokens
    fm_prompt_mel: np.ndarray  # (Lp*csf, n_mel) timbre ref clean mel
    seed: int


class VevoService:
    """Batched zero-shot Vevo VC serving (AR + 32-step FM + Vocos).

    The 780M-class AR decode is weight-HBM-bound (BENCHMARKS.md), so
    serving is where the remaining single-request RTF headroom lives:
    batching B requests amortizes the per-token weight stream ~B×. Both
    stages run ragged — per-request lengths in ONE compiled program each
    (`ar_transformer_generate_ragged`, `fmt_inference_ragged`) with
    per-request RNG keys, so results are independent of batch composition
    (tests/test_ragged_vevo.py). Two products map onto the reference's
    pipeline (ref `models/vc/vevo/vevo_utils.py:403-572`):

    - ``mode="timbre"`` (Vevo-Timbre): source style tokens re-rendered
      with the reference speaker's timbre — FM + Vocos only.
    - ``mode="voice"`` (Vevo-Voice): AR re-writes content into the style
      reference's style first (style-prompted decode), then FM.

    Front-end token/mel extraction happens per request in `synthesize`
    (serialized — the extractors are single compiled programs); the
    batcher only runs the ragged device programs.
    """

    def __init__(self, pipeline, max_batch: int = 8, max_wait_ms: float = 50.0,
                 len_step: int = 128, max_content_len: int = 1024,
                 max_prompt_len: int = 512, max_new: int = 1024,
                 flow_matching_steps: int = 32, fm_solver: str = "euler",
                 cfg_scale: float = 0.0,
                 temperature: float = 1.0, top_k: int = 40,
                 compute_dtype: str = "bfloat16",
                 audio_grid_s: float = 0.5):
        self.pipe = pipeline
        self.audio_grid_s = audio_grid_s
        self.len_step = len_step
        self.max_content_len = max_content_len
        self.max_prompt_len = max_prompt_len
        self.max_new = max_new
        self.fm_steps = flow_matching_steps
        self.fm_solver = fm_solver
        self.cfg_scale = cfg_scale
        self.temperature = temperature
        self.top_k = top_k
        self.compute_dtype = compute_dtype
        self._frontend_lock = threading.Lock()
        self._voc_jit = jax.jit(
            lambda prm, m, fl: pipeline.vocoder.apply({"params": prm}, m, fl))
        self._init_dispatch(max_batch, max_wait_ms)

    def _init_dispatch(self, max_batch, max_wait_ms):
        """Build the request dispatcher — the window `MicroBatcher` here;
        `VevoContinuousService` overrides this with the continuous
        engine (`serving/continuous_service.py`)."""
        self.batcher = MicroBatcher(
            self._run_batch, self._bucket_of, max_batch=max_batch,
            max_wait_ms=max_wait_ms,
        )

    def _ladder(self, n, cap):
        return bucket_ladder(max(int(n), 1), self.len_step, cap)

    def _bucket_of(self, req: _VevoCoreRequest):
        if req.mode == "voice":
            shape = (self._ladder(len(req.content), self.max_content_len),
                     self._ladder(len(req.prompt_out), self.max_prompt_len))
        else:
            shape = (self._ladder(len(req.target_style), self.max_new),)
        return (req.mode, shape,
                self._ladder(len(req.fm_prompt_tokens), self.max_prompt_len))

    def _fm_prompt(self, ref_style_tokens: np.ndarray, ref_audio: np.ndarray):
        """(ref content-style tokens, frame-aligned clean mel) — the FM
        prompt protocol of `VevoPipeline.fm_stage`."""
        ptok = ref_style_tokens[: self.max_prompt_len]
        mel = np.asarray(self.pipe._mel(ref_audio))[0]
        csf = self.pipe.fm.cfg.cond_scale_factor
        n_ptok = max(min(len(ptok), mel.shape[0] // csf), 1)
        return ptok[:n_ptok].astype(np.int32), mel[: n_ptok * csf]

    def synthesize(self, src_audio: np.ndarray, ref_audio: np.ndarray,
                   mode: str = "timbre", seed: int = 0) -> np.ndarray:
        return self.batcher(self._prepare_request(src_audio, ref_audio,
                                                  mode, seed))

    def _prepare_request(self, src_audio, ref_audio, mode, seed
                         ) -> _VevoCoreRequest:
        """Front-end token/mel extraction (serialized — the extractors
        are single compiled programs); shared by the window and
        continuous dispatch paths."""
        assert mode in ("timbre", "voice")
        sr = self.pipe.mel_cfg.sample_rate
        src_audio = _pad_audio_grid(src_audio, sr, self.audio_grid_s)
        ref_audio = _pad_audio_grid(ref_audio, sr, self.audio_grid_s)
        empty = np.zeros((0,), np.int32)
        with self._frontend_lock:
            # one style-tokenizer pass over ref_audio serves both the FM
            # prompt and (voice mode) the AR output-stream prompt
            ref_style = np.asarray(
                self.pipe.style_tokens(ref_audio)).astype(np.int32)
            ptok, pmel = self._fm_prompt(ref_style, ref_audio)
            if mode == "voice":
                content = self.pipe.content_tokens(
                    np.concatenate([np.asarray(ref_audio),
                                    np.asarray(src_audio)])
                ).astype(np.int32)
                if len(content) > self.max_content_len:
                    # keep the TAIL (source content being converted); what
                    # overflows is the reference prefix at the front
                    import warnings

                    warnings.warn(
                        f"vevo voice request content ({len(content)} tokens) "
                        f"exceeds max_content_len={self.max_content_len}; "
                        "truncating the reference prefix from the front")
                    content = content[-self.max_content_len:]
                prompt_out = ref_style[: self.max_prompt_len]
                target = empty
            else:
                content = prompt_out = empty
                target = self.pipe.style_tokens(
                    src_audio)[: self.max_new].astype(np.int32)
        return _VevoCoreRequest(
            mode, content, prompt_out, target, ptok, pmel, seed)

    def stats(self) -> dict:
        return self.batcher.stats.snapshot()

    def _run_batch(self, bucket, reqs: list[_VevoCoreRequest]):
        from amphion_tpu.models.vc.ar_transformer import (
            ar_transformer_generate_ragged,
        )
        from amphion_tpu.models.vc.flow_matching_transformer import (
            fmt_inference_ragged,
        )

        mode, shape, lp_tok = bucket
        b = len(reqs)
        seeds = jnp.asarray([r.seed for r in reqs], jnp.uint32)
        keys = jax.vmap(jax.random.key)(seeds)

        if mode == "voice":
            lc, lo = shape
            content = np.stack(
                [_pad_to(r.content, lc) for r in reqs]).astype(np.int32)
            clen = np.asarray([len(r.content) for r in reqs], np.int32)
            pout = np.stack(
                [_pad_to(r.prompt_out, lo) for r in reqs]).astype(np.int32)
            polen = np.asarray([len(r.prompt_out) for r in reqs], np.int32)
            toks, gen_len = ar_transformer_generate_ragged(
                self.pipe.ar, self.pipe.params["ar"], content, clen,
                jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys),
                max_new=self.max_new, temperature=self.temperature,
                top_k=self.top_k, prompt_output_tokens=pout,
                prompt_output_len=polen, compute_dtype=self.compute_dtype)
            gen_len = np.maximum(np.asarray(gen_len), 1)
            lt_tok = self._ladder(gen_len.max(), self.max_new)
            target = np.asarray(toks)[:, :lt_tok].astype(np.int32)
            tlen = gen_len.astype(np.int32)
        else:
            (lt_tok,) = shape
            target = np.stack(
                [_pad_to(r.target_style, lt_tok) for r in reqs]
            ).astype(np.int32)
            tlen = np.asarray(
                [max(len(r.target_style), 1) for r in reqs], np.int32)

        csf = self.pipe.fm.cfg.cond_scale_factor
        ptoks = np.stack(
            [_pad_to(r.fm_prompt_tokens, lp_tok) for r in reqs]
        ).astype(np.int32)
        plen = np.asarray(
            [len(r.fm_prompt_tokens) for r in reqs], np.int32)
        pmel = np.stack(
            [_pad_to(r.fm_prompt_mel, lp_tok * csf) for r in reqs])
        mel = fmt_inference_ragged(
            self.pipe.fm, self.pipe.params["fm"], ptoks, plen, target, tlen,
            pmel, jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys),
            num_steps=self.fm_steps, cfg_scale=self.cfg_scale,
            compute_dtype=self.compute_dtype, solver=self.fm_solver)
        wav = np.asarray(self._voc_jit(
            self.pipe.params["vocoder"], mel,
            jnp.asarray(tlen, jnp.int32) * csf))
        spf = wav.shape[-1] / mel.shape[1]
        return [wav[i, : int(round(int(tlen[i]) * csf * spf))]
                for i in range(b)]
