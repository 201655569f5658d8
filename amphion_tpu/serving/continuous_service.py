"""Continuous-batching serving backends — the production AR path.

The continuous engine (`serving/continuous.py`) measures 1.7-2.5×
better p50 than the static window batcher at every load rung on the
same Poisson trace with equal-or-better throughput (round-5 n=100
sweeps, BENCHMARKS.md `continuous` tables); this module puts that
engine in the HTTP serving path. `bins/serve.py --batcher continuous` (the default for the AR
backends) builds these services instead of the window ones.

Design:

- `EngineDriver` owns a continuous engine on ONE background thread (the
  engine is single-threaded by design — one TPU program at a time) and
  exposes a blocking `submit_wait` that any number of HTTP handler
  threads call concurrently. A request is admitted at the next CHUNK
  boundary of the live decode — no wait-window, no drain — which is
  exactly where the p50 win over the window batcher comes from.
- `VevoContinuousService` / `ValleContinuousService` subclass the window
  services (`serving/service.py`) and override ONLY dispatch: the shared
  `_prepare_request` front end feeds the engine for the AR stage, and
  the non-AR stages (Vevo's 32-step FM + Vocos, VALL-E's NAR + codec
  decode) run per completed request. Those stages are single forward
  passes / compute-bound ODE loops, not weight-streaming token loops —
  continuous batching has nothing to amortize there (BENCHMARKS.md: FM
  is ~75% MFU at B=1; mask-predict throughput FALLS with batch).
- Per-request RNG keys use the SAME fold_in discipline as the window
  path, so a request's token stream is bit-identical whichever
  dispatcher served it (asserted in tests/test_continuous_service.py).

The reference has no serving layer at all (closest: the one-shot
`models/vc/vevo/vevo_utils.py:403` inference call); this is our-bar
work like the rest of `serving/`.
"""

from __future__ import annotations

import threading
import time

import jax
import numpy as np

from amphion_tpu.serving.continuous import (
    ContinuousARBatcher,
    ContinuousValleBatcher,
)
from amphion_tpu.serving.service import (
    VALLEService,
    VevoService,
    _pad_to,
    _VevoCoreRequest,
)


def _ladder_tuple(step: int, cap: int) -> tuple[int, ...]:
    """Bucket ladder as an explicit tuple: step, 2*step, ..., cap."""
    rungs = list(range(step, cap, step)) + [cap]
    return tuple(sorted(set(rungs)))


class EngineDriver:
    """Thread-safe blocking facade over a continuous engine.

    `submit_wait(*engine_submit_args)` enqueues into the engine (on the
    driver thread, at the next chunk boundary) and blocks the calling
    thread until that request's tokens are ready. Errors raised by the
    engine's `submit` (over-long prompt, capacity) propagate to the
    caller. `stats()` is cheap and safe from any thread.
    """

    def __init__(self, engine, solo_fn=None, solo_gate=None):
        self.engine = engine
        # solo_gate: extra host-side predicate consulted before taking
        # the solo path — the services pass "service in-flight <= 1" so
        # a lone AR request only goes solo when NOTHING else (including
        # another request's FM/NAR tail on a different thread) is using
        # the device. Without it, steady sub-saturation load can be
        # served as back-to-back solos, forfeiting the weight-stream
        # amortization and diverging (measured: 0.5 qps fell to 0.19
        # achieved qps with p95 3 min).
        self.solo_gate = solo_gate
        # solo fast path: when the engine is fully idle and exactly one
        # request is pending, run the family's ONE-SHOT B=1 ragged
        # decode instead of the chunked engine — a lone request then
        # pays the one-shot program (no per-chunk device->host fetches;
        # closes the light-load gap to the window batcher measured in
        # the round-5 HTTP bench). solo_fn returns None to decline
        # (e.g. a per-request cap that differs from the service cap —
        # one-shot programs compile per max_new); arrivals during a
        # solo run wait it out, exactly like the window batcher, which
        # is rare at the loads where the solo path triggers.
        self.solo_fn = solo_fn
        self.solo_enabled = solo_fn is not None
        self._solo_served = 0
        self._cv = threading.Condition()
        self._inbox: list[tuple[tuple, dict, dict]] = []
        self._waiters: dict[int, dict] = {}
        self._latencies: list[float] = []
        self._stop = False
        self._admitted = 0
        self._chunks = 0
        self._occ_sum = 0
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="continuous-engine")
        self._thread.start()

    def submit_wait(self, *args, timeout: float | None = None,
                    **kw) -> np.ndarray:
        box: dict = {"ev": threading.Event(), "t0": time.perf_counter()}
        with self._cv:
            if self._stop:
                raise RuntimeError("engine driver is shut down")
            self._inbox.append((args, kw, box))
            self._cv.notify()
        if not box["ev"].wait(timeout):
            raise TimeoutError("request timed out in the continuous engine")
        if "error" in box:
            raise box["error"]
        return box["tokens"]

    def shutdown(self, wait: bool = True) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify()
        if wait:
            self._thread.join(timeout=60)

    def _busy(self) -> bool:
        e = self.engine
        return bool(e.queue) or any(s.req is not None for s in e.slots)

    def _loop(self) -> None:
        e = self.engine
        while True:
            with self._cv:
                while not self._inbox and not self._busy() and not self._stop:
                    self._cv.wait()
                if self._stop:
                    # fail fast for anyone still waiting
                    err = RuntimeError("engine driver shut down")
                    for _, _, box in self._inbox:
                        box["error"] = err
                        box["ev"].set()
                    for box in self._waiters.values():
                        box["error"] = err
                        box["ev"].set()
                    return
                pending, self._inbox = self._inbox, []
            if (self.solo_enabled and len(pending) == 1
                    and not self._waiters and not self._busy()
                    and (self.solo_gate is None or self.solo_gate())):
                args, kw, box = pending[0]
                try:
                    toks = self.solo_fn(*args, **kw)
                except Exception:
                    toks = None  # fall back to the engine path
                if toks is not None:
                    self._solo_served += 1
                    with self._cv:
                        self._latencies.append(
                            time.perf_counter() - box["t0"])
                        del self._latencies[:-4096]
                    box["tokens"] = np.asarray(toks, np.int32)
                    box["ev"].set()
                    continue
            for args, kw, box in pending:
                try:
                    rid = e.submit(*args, **kw)
                    self._waiters[rid] = box
                    self._admitted += 1
                except Exception as exc:  # over-long prompt, capacity, ...
                    box["error"] = exc
                    box["ev"].set()
            if not self._busy():
                continue
            finished = e.step_chunk()
            self._chunks += 1
            self._occ_sum += (sum(s.req is not None for s in e.slots)
                              + len(finished))
            for rid in finished:
                box = self._waiters.pop(rid, None)
                tokens = e.completed.pop(rid, None)
                lat = e.latency_s.pop(rid, 0.0)
                with self._cv:
                    self._latencies.append(lat)
                    del self._latencies[:-4096]  # bounded history
                if box is not None:
                    box["tokens"] = tokens
                    box["ev"].set()

    def prewarm_rungs(self, submit_args_fn) -> None:
        """Compile every occupancy rung's chunk program: S concurrent
        dummy requests with STAGGERED caps drain occupancy S→1, hitting
        each rung on the way down (`continuous.py` runs the smallest
        compiled rung covering the active slots — a rung first seen
        under live traffic would compile inline)."""
        import concurrent.futures as cf

        s = self.engine.S
        solo_was = self.solo_enabled
        self.solo_enabled = False  # rung warmup must hit the ENGINE
        try:
            with cf.ThreadPoolExecutor(s) as ex:
                futs = [ex.submit(self.submit_wait, *submit_args_fn(),
                                  max_new=min(self.engine.chunk * (i + 1),
                                              self.engine.default_max_new))
                        for i in range(s)]
                for f in futs:
                    f.result()
        finally:
            self.solo_enabled = solo_was

    def stats(self) -> dict:
        with self._cv:
            lats = sorted(self._latencies)
            inbox = len(self._inbox)
            waiting = len(self._waiters)

        def pct(p):
            return (lats[min(len(lats) - 1, int(p / 100 * len(lats)))]
                    if lats else 0.0)

        return {
            "batcher": "continuous",
            "slots": self.engine.S,
            "chunk": self.engine.chunk,
            "admitted": self._admitted,
            "in_flight": waiting,
            "driver_inbox": inbox,
            "chunks": self._chunks,
            "mean_slot_occupancy": round(
                self._occ_sum / max(self._chunks, 1), 3),
            "solo_served": self._solo_served,
            "ar_p50_s": round(pct(50), 4),
            "ar_p95_s": round(pct(95), 4),
            "ar_p99_s": round(pct(99), 4),
        }


class VevoContinuousService(VevoService):
    """Vevo VC serving with the continuous engine on the AR stage.

    ``mode="voice"`` (AR style rewrite + FM): the AR decode — the
    weight-HBM-bound stage where batching matters — runs in the
    continuous engine's slots; the FM + Vocos tail runs per completed
    request (compute-bound, nothing to amortize). ``mode="timbre"`` has
    no AR stage at all; it runs the FM tail directly (for timbre-heavy
    workloads the window batcher's FM batching is equivalent — measured
    FM is ~75% MFU at B=1, BENCHMARKS.md).
    """

    def __init__(self, pipeline, *, slots: int = 4, chunk: int = 64,
                 **kw):
        self.slots_n, self.chunk = slots, chunk
        super().__init__(pipeline, **kw)

    def _init_dispatch(self, max_batch, max_wait_ms):
        del max_batch, max_wait_ms  # window-batcher knobs
        if self.pipe.params.get("ar") is None:
            self.driver = None  # timbre-only deployment
            return
        engine = ContinuousARBatcher(
            self.pipe.ar, self.pipe.params["ar"], slots=self.slots_n,
            chunk=self.chunk,
            buckets=_ladder_tuple(self.len_step, self.max_content_len),
            out_buckets=_ladder_tuple(self.len_step, self.max_prompt_len),
            max_new=self.max_new, temperature=self.temperature,
            top_k=self.top_k, compute_dtype=self.compute_dtype)
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        self.driver = EngineDriver(
            engine, solo_fn=self._solo_decode,
            solo_gate=lambda: self._inflight <= 1)

    def _solo_decode(self, content, rng, max_new=None,
                     prompt_output=None):
        """One-shot B=1 ragged decode for the driver's solo fast path
        (same bucketed shapes + rng discipline as the engine, so the
        token stream is identical); declines (None) when the
        per-request cap differs from the service cap — one-shot
        programs compile per max_new."""
        from amphion_tpu.models.vc.ar_transformer import (
            ar_transformer_generate_ragged,
        )

        if (max_new or self.max_new) != self.max_new:
            return None
        eng = self.driver.engine
        lb = eng._bucket(len(content))
        buf = np.zeros((1, lb), np.int32)
        buf[0, :len(content)] = content
        if prompt_output is not None:
            lo = eng._bucket(len(prompt_output), eng.out_buckets)
            pbuf = np.zeros((1, lo), np.int32)
            pbuf[0, :len(prompt_output)] = prompt_output
            po = pbuf
            polen = np.asarray([len(prompt_output)], np.int32)
        else:
            po = polen = None
        toks, n = ar_transformer_generate_ragged(
            self.pipe.ar, self.pipe.params["ar"], buf,
            np.asarray([len(content)], np.int32), rng[None],
            max_new=self.max_new, temperature=self.temperature,
            top_k=self.top_k, prompt_output_tokens=po,
            prompt_output_len=polen, compute_dtype=self.compute_dtype)
        return np.asarray(toks[0])[:int(n[0])]

    def synthesize(self, src_audio: np.ndarray, ref_audio: np.ndarray,
                   mode: str = "timbre", seed: int = 0) -> np.ndarray:
        with self._inflight_lock:
            self._inflight += 1
        try:
            return self._synthesize(src_audio, ref_audio, mode, seed)
        finally:
            with self._inflight_lock:
                self._inflight -= 1

    def _synthesize(self, src_audio, ref_audio, mode, seed):
        req = self._prepare_request(src_audio, ref_audio, mode, seed)
        if mode == "voice":
            if self.driver is None:
                raise RuntimeError("voice mode needs AR weights")
            # same per-request key split as the window path's _run_batch
            key_ar = jax.random.fold_in(jax.random.key(seed), 1)
            toks = self.driver.submit_wait(
                req.content, key_ar, max_new=self.max_new,
                prompt_output=req.prompt_out)
            empty = np.zeros((0,), np.int32)
            req = _VevoCoreRequest(
                "timbre", empty, empty,
                np.asarray(toks, np.int32), req.fm_prompt_tokens,
                req.fm_prompt_mel, seed)
        # FM + vocoder tail, solo (B=1 program per length bucket)
        lt = self._ladder(len(req.target_style), self.max_new)
        lp = self._ladder(len(req.fm_prompt_tokens), self.max_prompt_len)
        return self._run_batch(("timbre", (lt,), lp), [req])[0]

    def prewarm(self) -> None:
        """Compile the engine's bucket surface before serving traffic:
        one admission per (content, style) bucket pair + one decode
        chunk + the FM tail at the max_new bucket. A first request in a
        fresh bucket otherwise pays that compile inline — through the
        axon tunnel that is tens of seconds added to an unlucky
        request's latency (`bins/serve.py --prewarm`)."""
        if self.driver is None:
            return
        eng = self.driver.engine
        for lb in eng.buckets:
            for lo in eng.out_buckets or (0,):
                po = (np.zeros(lo, np.int32) if lo else None)
                self.driver.submit_wait(
                    np.zeros(lb, np.int32), jax.random.key(0),
                    max_new=eng.chunk, prompt_output=po)
        self.driver.prewarm_rungs(
            lambda: (np.zeros(eng.buckets[0], np.int32),
                     jax.random.key(0)))
        # solo fast-path programs: sequential submits on the idle
        # engine route through `_solo_decode` (one-shot per bucket pair
        # at the service cap)
        for lb in eng.buckets:
            for lo in eng.out_buckets or (0,):
                po = (np.zeros(lo, np.int32) if lo else None)
                self.driver.submit_wait(np.zeros(lb, np.int32),
                                        jax.random.key(0),
                                        prompt_output=po)
        empty = np.zeros((0,), np.int32)
        lt = self._ladder(self.max_new, self.max_new)
        for lp in {self._ladder(1, self.max_prompt_len),
                   self._ladder(self.max_prompt_len,
                                self.max_prompt_len)}:
            csf = self.pipe.fm.cfg.cond_scale_factor
            req = _VevoCoreRequest(
                "timbre", empty, empty,
                np.zeros(self.max_new, np.int32),
                np.zeros(lp, np.int32),
                np.zeros((lp * csf, self.pipe.fm.cfg.n_mel), np.float32),
                0)
            self._run_batch(("timbre", (lt,), lp), [req])

    def stats(self) -> dict:
        return (self.driver.stats() if self.driver is not None
                else {"batcher": "continuous", "ar": None})

    def shutdown(self) -> None:
        if self.driver is not None:
            self.driver.shutdown()


class ValleContinuousService(VALLEService):
    """Zero-shot VALL-E serving with the continuous engine on the AR
    stage; the greedy NAR fill + codec decode run per completed request
    (plain forward passes — `ContinuousValleBatcher` docstring)."""

    def __init__(self, model, params, tokenizer, g2p, symbol_table, *,
                 slots: int = 4, chunk: int = 64, **kw):
        self.slots_n, self.chunk = slots, chunk
        super().__init__(model, params, tokenizer, g2p, symbol_table, **kw)

    def _init_dispatch(self, max_batch, max_wait_ms):
        del max_batch, max_wait_ms
        engine = ContinuousValleBatcher(
            self.model, self.params, slots=self.slots_n, chunk=self.chunk,
            phone_buckets=_ladder_tuple(self.len_step, self.max_phone_len),
            prompt_buckets=_ladder_tuple(self.len_step, self.max_prompt_len),
            max_new=self.max_new, temperature=self.temperature,
            top_k=self.top_k, compute_dtype=self.compute_dtype)
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        self.driver = EngineDriver(
            engine, solo_fn=self._solo_decode,
            solo_gate=lambda: self._inflight <= 1)

    def _solo_decode(self, phones, prompt_tokens, rng, max_new=None):
        """One-shot B=1 VALL-E AR decode for the solo fast path (see
        `VevoContinuousService._solo_decode`)."""
        from amphion_tpu.models.tts.valle.valle import ar_generate_ragged

        if (max_new or self.max_new) != self.max_new:
            return None
        eng = self.driver.engine
        lph = eng._bucket(len(phones))
        lp = eng._bucket(len(prompt_tokens), eng.out_buckets)
        phb = np.zeros((1, lph), np.int32)
        phb[0, :len(phones)] = phones
        prb = np.zeros((1, lp), np.int32)
        prb[0, :len(prompt_tokens)] = prompt_tokens
        toks, n = ar_generate_ragged(
            self.model, self.params, phb,
            np.asarray([len(phones)], np.int32), prb,
            np.asarray([len(prompt_tokens)], np.int32), rng[None],
            max_new=self.max_new, temperature=self.temperature,
            top_k=self.top_k, compute_dtype=self.compute_dtype)
        return np.asarray(toks[0])[:int(n[0])]

    def synthesize(self, prompt_audio: np.ndarray, prompt_text: str,
                   target_text: str, seed: int = 0) -> np.ndarray:
        with self._inflight_lock:
            self._inflight += 1
        try:
            return self._synthesize(prompt_audio, prompt_text,
                                    target_text, seed)
        finally:
            with self._inflight_lock:
                self._inflight -= 1

    def _synthesize(self, prompt_audio, prompt_text, target_text, seed):
        from amphion_tpu.models.tts.valle.valle import nar_generate_ragged

        req = self._prepare_request(prompt_audio, prompt_text,
                                    target_text, seed)
        # window path: keys = vmap(jax.random.key)(seeds)
        toks0 = self.driver.submit_wait(
            req.phone_ids, req.prompt_codes[0], jax.random.key(seed),
            max_new=self.max_new)
        n_gen = len(toks0)  # may be 0 (immediate EOS) — the NAR sees
        # the TRUE gen_len, exactly like `valle_generate_ragged`
        dec_len = max(n_gen, 1)

        from amphion_tpu.serving.batcher import bucket_ladder

        lph = bucket_ladder(len(req.phone_ids), self.len_step,
                            self.max_phone_len)
        lp = bucket_ladder(req.prompt_codes.shape[1], self.len_step,
                           self.max_prompt_len)
        lt = bucket_ladder(dec_len, self.len_step, self.max_new)
        tokens0 = np.zeros((1, lt), np.int32)
        tokens0[0, :n_gen] = toks0
        codes = nar_generate_ragged(
            self.model, self.params,
            _pad_to(req.phone_ids, lph)[None],
            np.asarray([len(req.phone_ids)], np.int32), tokens0,
            np.asarray([n_gen], np.int32),
            _pad_to(req.prompt_codes, lp, axis=1)[None],
            np.asarray([req.prompt_codes.shape[1]], np.int32),
            compute_dtype=self.compute_dtype)
        wav = self.tokenizer.decode(
            np.asarray(codes), lengths=np.asarray([dec_len], np.int32))
        spf = wav.shape[-1] / codes.shape[-1]
        return wav[0, : int(round(dec_len * spf))]

    def prewarm(self) -> None:
        """Compile the (phone, prompt) admission bucket surface + one
        decode chunk (see `VevoContinuousService.prewarm`). The NAR +
        codec tail compiles per generated-length bucket on first use."""
        eng = self.driver.engine
        for lph in eng.buckets:
            for lp in eng.out_buckets:
                self.driver.submit_wait(
                    np.zeros(lph, np.int32), np.zeros(lp, np.int32),
                    jax.random.key(0), max_new=eng.chunk)
        self.driver.prewarm_rungs(
            lambda: (np.zeros(eng.buckets[0], np.int32),
                     np.zeros(eng.out_buckets[0], np.int32),
                     jax.random.key(0)))
        for lph in eng.buckets:  # solo fast-path programs
            for lp in eng.out_buckets:
                self.driver.submit_wait(np.zeros(lph, np.int32),
                                        np.zeros(lp, np.int32),
                                        jax.random.key(0))

    def stats(self) -> dict:
        return self.driver.stats()

    def shutdown(self) -> None:
        self.driver.shutdown()
