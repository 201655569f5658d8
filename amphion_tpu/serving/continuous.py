"""Continuous batching for the AR decode families (beyond-reference).

The static micro-batchers in `serving/service.py` gate requests on a
wait-window: a request that arrives while a batch is decoding waits for
the whole batch to finish. For weight-HBM-bound AR decode that leaves
the chip idle per-request-wise — the weight stream that batching is
supposed to amortize is only amortized across requests that happened to
arrive in the same window.

`ContinuousARBatcher` keeps S decode *slots* live inside ONE compiled
decode program and admits new requests mid-flight (vLLM-style continuous
batching, re-designed for XLA's static-shape world):

- Every slot owns an independent KV-cache row (leading dim S) and its
  OWN write cursor: the chunked decode `vmap`s the single-token step
  over the slot axis, so `cache_index` is a scalar per lane (per-row
  `dynamic_update_slice`, per-row RoPE positions, per-row
  `pos_k <= cursor` bounds all fall out of the vmap). Slots never attend
  each other — attention is within-row.
- A new request is admitted *between* decode chunks by a right-aligned
  prefill into its slot's row (`ARTransformer.prefill_ragged` on a
  1-row cache slice): the packed prompt lands at `[0, l0)`, the slot's
  cursor resets to `l0`, and its `kv_valid` row masks both the pad
  prefix and the previous occupant's junk. Right-aligned placement is
  exact under RoPE — scores depend only on relative distance
  (`ops/ragged.py`).
- Per-slot cursors mean NO shared-capacity epochs: a slot's capacity is
  exactly `max_bucket + 3 + max_new`, reads are bounded by that (the
  same cache footprint as the one-shot ragged batcher), idle slots burn
  nothing anyone else needs, and a freed slot is re-admittable
  immediately. (An earlier shared-cursor design serialized badly at low
  load — idle slots burned the shared capacity and late arrivals
  waited out a full drain.)
- Decode runs in chunks of `chunk` steps (one jitted `lax.scan`); the
  host harvests ONE packed (tokens|done) fetch per chunk (~a few KB;
  through the axon tunnel every fetch pays the ~35-50 ms dispatch
  floor, so one matters), retires finished slots (EOS or per-request
  cap — caps are host-side, so per-request lengths need NO extra
  compiles), and admits queued requests via a per-bucket admission
  program. The KV cache stays device-resident and donated across calls.
- The chunk is OCCUPANCY-ADAPTIVE (round 5): a vmapped lane costs real
  weight+KV traffic whether or not it holds a request, so active slots
  are compacted into a prefix (`_compact` — exact row moves) and the
  chunk runs the smallest power-of-two lane rung covering them
  (`_rung`). A solo request therefore pays ~a one-shot B=1 step, not
  the full-S step (the round-5 HTTP bench caught the window batcher's
  B=1 programs beating a mostly-idle fixed-4-lane engine). Rung
  programs compile lazily; `prewarm`/bench priming drain a staggered
  batch through every rung up front.

Token-exactness: with per-request rng keys the engine reproduces
`ar_transformer_generate_ragged` (and therefore solo decode —
tests/test_ragged_vevo.py) token-for-token regardless of admission
order, because a slot's sampling stream splits once per step from its
own key and its attention view is identical to a solo right-aligned run
(tests/test_continuous_batching.py, float32). In reduced-precision
modes (bf16/int8/int4) the engine and the one-shot decoder are
DIFFERENT XLA programs, so ULP-level fusion differences can flip a
borderline sampled token (observed on TPU with tiny models); within the
engine, results remain independent of admission order/batch company.
Quantization itself runs inside a jitted prep (`_prep_engine_params`)
so its scale reductions match the traced quantization of the one-shot
decoders.

The reference has no serving layer at all (closest: one-shot
`models/vc/vevo/vevo_utils.py:403` inference); this module is our-bar
work, like `serving/service.py`.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.models.vc.ar_transformer import (
    ARTransformer,
    _decode_model_dtype,
    _decode_params,
)
from amphion_tpu.modules.llama import LlamaDecoder
from amphion_tpu.ops.ragged import split_each
from amphion_tpu.ops.sampling import sample_logits


@dataclasses.dataclass
class _Request:
    rid: int
    content: np.ndarray  # (L,) raw content ids
    rng: jax.Array  # per-request key — decouples sampling from scheduling
    max_new: int
    prompt_output: np.ndarray | None = None  # style prompt (Vevo-Voice)
    submit_t: float = 0.0
    admit_t: float = 0.0


@dataclasses.dataclass
class _Slot:
    req: _Request | None = None
    tokens: list[int] = dataclasses.field(default_factory=list)
    finished: bool = False


def _restore_int4(params):
    """Invert the engine's int8-at-rest storage of int4 weights (see
    `_prep_engine_params`) inside a jitted program."""
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.int4) if p.dtype == jnp.int8 else p, params)


def _prep_engine_params(decode_params_fn, params, compute_dtype):
    """Decode-prep the param tree for ENGINE-resident storage.

    The one-shot decoders quantize inside their own jit every call; the
    engine quantizes ONCE here. For int4 the whole prep runs inside one
    jitted program with the int4 leaves stored as int8 — an int4 (S4)
    array can neither be passed to a jit nor touched eagerly on this
    stack (JAX device_put-with-layout recursion, found by the round-5
    continuous_crossover bench); `_restore_int4` casts back inside every
    decode program (~1/chunk_len extra weight traffic)."""
    def prep(p):
        q = decode_params_fn(p, compute_dtype)
        if compute_dtype == "int4":
            q = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.int8) if x.dtype == jnp.int4 else x,
                q)
        return q

    # jit the prep for EVERY mode: eager quantization computes max/abs
    # scales with a different reduction order than the traced
    # quantization the one-shot decoders run, and the ULP difference is
    # enough to flip borderline sampled tokens vs the ragged comparator
    # (observed for int8 on TPU).
    return jax.jit(prep)(params), compute_dtype == "int4"


def _chunk_impl(model, step_method, eos_id, temperature, top_k, top_p,
                chunk, int4_storage, s_active, params, caches, kv_valid,
                logits, rngs, done, cur):
    """One compiled chunk: `chunk` decode steps for the first
    ``s_active`` slots, each at its OWN cursor (`cur` is (S,); the step
    is vmapped over the lane axis so `cache_index` is a scalar per
    lane).

    ``s_active`` makes the chunk OCCUPANCY-ADAPTIVE (round 5): a
    vmapped lane costs real weight+KV traffic whether or not its slot
    holds a request (a fixed 4-lane chunk made a mostly-idle engine
    lose to the window batcher's B=1 programs in the round-5 HTTP
    bench; with rungs, 1-lane ~= one-shot B=1 + tunnel fetch), so the
    engine compacts active slots into a prefix and runs the smallest
    compiled rung that covers them. Lanes >= s_active pass through
    untouched (donated buffers alias).

    Generic over the AR family: ``step_method`` is the model's
    single-token decode method (`ARTransformer.step` or `VALLE.ar_step`
    — identical ``(token, caches, cache_index, kv_valid)`` signatures)
    and ``eos_id`` its stop token. Mirrors the family's
    `_ar_generate_ragged_impl` scan body exactly (same rng split
    discipline, same EOS freezing) so slot streams are token-identical
    to the one-shot ragged decode."""

    if int4_storage:
        params = _restore_int4(params)

    full = (caches, logits, rngs, done, cur)

    def head(a):
        return jax.lax.slice_in_dim(a, 0, s_active, axis=0)

    caches = jax.tree_util.tree_map(head, caches)
    kv_valid = head(kv_valid)
    logits, rngs, done, cur = (head(logits), head(rngs), head(done),
                               head(cur))

    def step_row(tok, cache_row, valid_row, idx):
        # re-add the batch dim the vmap stripped; the model sees B=1
        row = jax.tree_util.tree_map(lambda a: a[None], cache_row)
        lg, row = model.apply(
            {"params": params}, tok[None], row, idx, valid_row[None],
            method=step_method,
        )
        return lg[0], jax.tree_util.tree_map(lambda a: a[0], row)

    vstep = jax.vmap(step_row)

    def body(carry, _):
        caches, logits, rngs, done, cur = carry
        rngs, r = split_each(rngs, 2)
        tok = jax.vmap(
            lambda k, lg: sample_logits(k, lg, temperature, top_k, top_p)
        )(r, logits.astype(jnp.float32))
        done_new = done | (tok == eos_id)
        tok_clean = jnp.where(done_new, 0, tok)
        logits_new, caches_new = vstep(tok_clean, caches, kv_valid, cur)
        # Frozen lanes (EOS'd, or cap-retired via the host-set flag) stop
        # advancing their cursor: the lane still computes (vmap runs all
        # lanes regardless) but its K/V writes stay put, it can never run
        # past capacity into clamped writes, and stats()['cursors'] stays
        # truthful. Lanes are independent, so active slots are unaffected.
        cur_new = jnp.where(done_new, cur, cur + 1)
        # bf16 decode emits bf16 logits; the carry (and sampling) stay f32
        return (caches_new, logits_new.astype(logits.dtype), rngs,
                done_new, cur_new), (tok_clean, done_new)

    init = (caches, logits, rngs, done, cur)
    (caches, logits, rngs, done, cur), (toks, dones) = jax.lax.scan(
        body, init, None, length=chunk)
    # write the stepped prefix back into the full-S buffers
    fc, fl, fr, fd, fcur = full
    caches = jax.tree_util.tree_map(
        lambda f, n: jax.lax.dynamic_update_slice_in_dim(f, n, 0, axis=0),
        fc, caches)
    logits = jax.lax.dynamic_update_slice_in_dim(fl, logits, 0, axis=0)
    rngs = jax.lax.dynamic_update_slice_in_dim(fr, rngs, 0, axis=0)
    done = jax.lax.dynamic_update_slice_in_dim(fd, done, 0, axis=0)
    cur = jax.lax.dynamic_update_slice_in_dim(fcur, cur, 0, axis=0)
    # ONE packed host fetch per chunk: [tokens | done-after-step]
    # (s_active, 2k). Through the axon tunnel every device->host fetch
    # pays the ~35-50 ms dispatch floor (BENCHMARKS.md measurement
    # notes) — three separate fetches per chunk tripled the scheduler
    # overhead.
    packed = jnp.concatenate(
        [jnp.moveaxis(toks, 0, 1),
         jnp.moveaxis(dones, 0, 1).astype(jnp.int32)], axis=1)
    return caches, logits, rngs, done, cur, packed


def _admit_impl(model, int4_storage, params, caches, kv_valid, logits,
                done, cur, content, content_len, slot, prompt_out=None,
                prompt_out_len=None):
    """Prefill `content` (1, Lb) right-aligned into slot `slot`'s row and
    scatter the row of (caches, kv_valid, logits); reset the slot's
    cursor to the window end.

    The packed window is `l0 = Lb + 3 (+ Lo)` wide (IN_BOS + content +
    IN_EOS + OUT_BOS + optional style-prompt output stream, the
    Vevo-Voice protocol); K/V land at `[0, l0)` and the slot's cursor
    becomes `l0`. The row's new validity starts at `l0 - packed_len` —
    pad prefix AND the slot's previous occupant are masked out;
    positions >= l0 become readable only as the slot's cursor writes
    them (the step path's `pos_k <= cache_index` bound,
    `modules/llama.py`)."""
    if int4_storage:
        params = _restore_int4(params)
    l0 = content.shape[1] + 3
    packed = content_len + 3
    if prompt_out is not None:
        l0 = l0 + prompt_out.shape[1]
        packed = packed + prompt_out_len
    cap = kv_valid.shape[1]
    row_caches = jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0), caches)
    row_valid = (jnp.arange(cap)[None, :] >= l0 - packed)
    new_logits, row_caches, _ = model.apply(
        {"params": params}, content, content_len[None], row_caches,
        row_valid, method=ARTransformer.prefill_ragged,
        prompt_output_tokens=prompt_out,
        prompt_output_len=(None if prompt_out_len is None
                           else prompt_out_len[None]),
        cache_index=0,
    )
    caches = jax.tree_util.tree_map(
        lambda full, row: jax.lax.dynamic_update_slice_in_dim(
            full, row, slot, axis=0),
        caches, row_caches)
    kv_valid = jax.lax.dynamic_update_slice_in_dim(
        kv_valid, row_valid, slot, axis=0)
    logits = jax.lax.dynamic_update_slice_in_dim(
        logits, new_logits.astype(logits.dtype), slot, axis=0)
    done = done.at[slot].set(False)
    cur = cur.at[slot].set(l0)
    return caches, kv_valid, logits, done, cur


@functools.lru_cache(maxsize=16)
def _chunk_jitted(model, step_method, eos_id, temperature, top_k, top_p,
                  chunk, int4_storage=False, s_active=4):
    # params is a jit ARGUMENT, never a closure capture — closed-over
    # trees bake into the HLO as constants (the `ssl` bench's 2.3 GB
    # remote-compile failure, BENCHMARKS.md measurement notes)
    return jax.jit(
        functools.partial(_chunk_impl, model, step_method, eos_id,
                          temperature, top_k, top_p, chunk, int4_storage,
                          s_active),
        donate_argnums=(1,))


def _move_slot_impl(caches, kv_valid, logits, rngs, done, cur, src, dst):
    """Copy slot row ``src`` → ``dst`` and idle ``src`` (compaction for
    the occupancy-adaptive chunk — active lanes must form a prefix).
    One program serves every (src, dst) pair (traced indices)."""
    def mv(a):
        return a.at[dst].set(a[src])

    caches = jax.tree_util.tree_map(mv, caches)
    kv_valid = mv(kv_valid)
    logits = mv(logits)
    rngs = mv(rngs)
    done = done.at[dst].set(done[src]).at[src].set(True)
    cur = cur.at[dst].set(cur[src])
    return caches, kv_valid, logits, rngs, done, cur


_move_slot_jit = jax.jit(_move_slot_impl, donate_argnums=(0,))


@functools.lru_cache(maxsize=16)
def _admit_jitted(model, int4_storage=False):
    # one specialization per (content bucket, style bucket | None) pair —
    # jit specializes on the padded shapes at first use
    return jax.jit(functools.partial(_admit_impl, model, int4_storage),
                   donate_argnums=(1,))


def _admit_valle_impl(model, int4_storage, params, caches, kv_valid,
                      logits, done, cur, phones, phone_len, prompt,
                      prompt_len, slot):
    """VALL-E admission: right-aligned ``[pad | phones_i | prompt_i]``
    prefilled into slot `slot`'s row (`VALLE.ar_prefill_ragged` — writes
    at the start of the row, exact under RoPE); same scatter/cursor/
    validity mechanics as `_admit_impl`."""
    from amphion_tpu.models.tts.valle.valle import VALLE

    if int4_storage:
        params = _restore_int4(params)
    l0 = phones.shape[1] + prompt.shape[1]
    packed = phone_len + prompt_len
    cap = kv_valid.shape[1]
    row_caches = jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0), caches)
    row_valid = (jnp.arange(cap)[None, :] >= l0 - packed)
    new_logits, row_caches = model.apply(
        {"params": params}, phones, phone_len[None], prompt,
        prompt_len[None], row_caches, row_valid,
        method=VALLE.ar_prefill_ragged)
    caches = jax.tree_util.tree_map(
        lambda full, row: jax.lax.dynamic_update_slice_in_dim(
            full, row, slot, axis=0),
        caches, row_caches)
    kv_valid = jax.lax.dynamic_update_slice_in_dim(
        kv_valid, row_valid, slot, axis=0)
    logits = jax.lax.dynamic_update_slice_in_dim(
        logits, new_logits.astype(logits.dtype), slot, axis=0)
    done = done.at[slot].set(False)
    cur = cur.at[slot].set(l0)
    return caches, kv_valid, logits, done, cur


@functools.lru_cache(maxsize=16)
def _admit_valle_jitted(model, int4_storage=False):
    return jax.jit(functools.partial(_admit_valle_impl, model,
                                     int4_storage),
                   donate_argnums=(1,))


class ContinuousARBatcher:
    """Slot-based continuous batching over an `ARTransformer`.

    Synchronous driver: `submit()` enqueues, `step_chunk()` admits +
    decodes one chunk and returns newly finished requests, `run()` loops
    until drained. A server thread can call `step_chunk()` in its loop;
    the whole engine is single-threaded by design (one TPU program at a
    time anyway).
    """

    def __init__(self, model: ARTransformer, params, *, slots: int = 4,
                 capacity: int | None = None, chunk: int = 16,
                 buckets: tuple[int, ...] = (64, 128, 256),
                 out_buckets: tuple[int, ...] = (),
                 max_new: int = 256, temperature: float = 1.0,
                 top_k: int = 40, top_p: float = 1.0,
                 compute_dtype: str = "bfloat16"):
        assert not model.cfg.use_global_timbre, \
            "continuous batching supports the plain VC layout"
        model, dt = _decode_model_dtype(model, compute_dtype)
        params, self._int4_storage = _prep_engine_params(
            _decode_params, params, compute_dtype)
        self.model, self.params = model, params
        self.S, self.chunk = slots, chunk
        self.buckets = tuple(sorted(buckets))
        self.out_buckets = tuple(sorted(out_buckets))
        # per-slot capacity: the largest packed window + the decode run.
        # Cursors are per slot, so this is also the per-step KV read
        # bound — the same cache footprint as the one-shot ragged decode.
        self.base = (self.buckets[-1] + 3
                     + (self.out_buckets[-1] if self.out_buckets else 0))
        need = self.base + max_new + chunk  # cap-retired slots coast to
        # the next chunk boundary before reuse; give them room
        self.capacity = max(capacity or 0, need)
        self.default_max_new = max_new

        # module-level lru_cache'd jit wrappers: a FRESH engine instance
        # must reuse the live executables — new jit objects lose the
        # in-memory cache, and re-loading the big chunk program through
        # the axon tunnel costs ~50 s (measured) even with the persistent
        # compile cache warm. Same pattern as `_ar_generate_jitted`.
        self._chunk_spec = (model, ARTransformer.step, model.cfg.eos_id,
                            temperature, top_k, top_p, chunk,
                            self._int4_storage)
        self._admit_fn = _admit_jitted(model, self._int4_storage)

        self.caches = LlamaDecoder(model.cfg.llama()).init_cache(
            slots, self.capacity, dtype=dt)
        # idle rows keep cache slot 0 attendable: a fully-masked softmax
        # row is NaN and its garbage would churn through the idle row's
        # own stream (never read, but keep the arithmetic finite anyway —
        # `LlamaDecoder.__call__` docstring has the same rule for pads)
        self.kv_valid = (jnp.zeros((slots, self.capacity), bool)
                         .at[:, 0].set(True))
        self.logits = jnp.zeros((slots, model.cfg.total_vocab),
                                jnp.float32)
        self.rngs = jax.random.split(jax.random.key(0), slots)
        self.done = jnp.ones((slots,), bool)  # device-resident freeze flags
        self.cur = jnp.ones((slots,), jnp.int32)  # per-slot write cursors
        self.slots = [_Slot(finished=True) for _ in range(slots)]
        self.queue: list[_Request] = []
        self._next_rid = 0
        self.completed: dict[int, np.ndarray] = {}
        self.latency_s: dict[int, float] = {}
        self.last_rung = 0  # lanes run by the most recent chunk

    # ------------------------------------------------------------- API
    def submit(self, content: np.ndarray, rng: jax.Array,
               max_new: int | None = None,
               prompt_output: np.ndarray | None = None) -> int:
        """Enqueue a request. ``prompt_output`` is the optional
        output-stream style prompt (the Vevo-Voice protocol — ref
        `models/vc/vevo/vevo_utils.py:403`: content + style-reference
        output prefix -> style-rewritten tokens)."""
        rid = self._next_rid
        self._next_rid += 1
        content = np.asarray(content, np.int32)
        self._bucket(len(content))  # raise NOW, not at admit time
        po = (None if prompt_output is None
              else np.asarray(prompt_output, np.int32))
        window = self._bucket(len(content)) + 3
        if po is not None:
            if not self.out_buckets:
                raise ValueError(
                    "style-prompted request on an engine built without "
                    "out_buckets — pass out_buckets=(...) at init (the "
                    "content ladder must NOT be reused for the style "
                    "stream: per-slot capacity was sized without it)")
            window += self._bucket(len(po), self.out_buckets)
        if (max_new or self.default_max_new) + window + self.chunk \
                > self.capacity:
            raise ValueError("max_new + packed window exceeds the "
                             "engine's per-slot capacity — raise "
                             "capacity/max_new at init")
        self.queue.append(_Request(rid, content, rng,
                                   max_new or self.default_max_new,
                                   prompt_output=po,
                                   submit_t=time.perf_counter()))
        return rid

    def _bucket(self, n: int, ladder=None) -> int:
        # NB: `ladder if ... is not None`, NOT `ladder or` — an empty
        # out_buckets tuple must NOT silently fall back to the content
        # ladder (the engine's per-slot capacity was sized without a
        # style stream; overflowing it clamps K/V writes onto the last
        # cache slot and corrupts tokens silently).
        ladder = self.buckets if ladder is None else ladder
        if not ladder:
            raise ValueError("empty bucket ladder")
        for b in ladder:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds bucket {ladder[-1]}")

    def _admit(self, slot_idx: int, req: _Request) -> None:
        lb = self._bucket(len(req.content))
        buf = np.zeros((1, lb), np.int32)
        buf[0, :len(req.content)] = req.content
        if req.prompt_output is not None:
            lo = self._bucket(len(req.prompt_output), self.out_buckets)
            pbuf = np.zeros((1, lo), np.int32)
            pbuf[0, :len(req.prompt_output)] = req.prompt_output
            po = jnp.asarray(pbuf)
            polen = jnp.asarray(len(req.prompt_output), jnp.int32)
        else:
            po = polen = None
        (self.caches, self.kv_valid, self.logits, self.done,
         self.cur) = self._admit_fn(
            self.params, self.caches, self.kv_valid, self.logits,
            self.done, self.cur, jnp.asarray(buf),
            jnp.asarray(len(req.content), jnp.int32),
            jnp.asarray(slot_idx, jnp.int32),
            prompt_out=po, prompt_out_len=polen)
        self.rngs = self.rngs.at[slot_idx].set(req.rng)
        req.admit_t = time.perf_counter()
        self.slots[slot_idx] = _Slot(req=req)

    def _retire(self, idx: int, n_keep: int | None = None) -> None:
        s = self.slots[idx]
        toks = s.tokens if n_keep is None else s.tokens[:n_keep]
        self.completed[s.req.rid] = np.asarray(toks, np.int32)
        self.latency_s[s.req.rid] = time.perf_counter() - s.req.submit_t
        self.slots[idx] = _Slot(finished=True)

    # ------------------------------------------ occupancy-adaptive run
    def _rung(self, n_active: int) -> int:
        """Smallest compiled lane count covering n_active (powers of
        two up to S) — the cost of a chunk is ~linear in its lane count
        whether or not lanes hold requests (`_chunk_impl` docstring)."""
        r = 1
        while r < n_active:
            r *= 2
        return min(r, self.S)

    def _chunk_fn_for(self, s_active: int):
        # module-level lru_cache'd jit wrappers (fresh engines must
        # reuse live executables — reloading the big chunk program
        # through the axon tunnel costs ~50 s, measured); one executable
        # per rung, compiled lazily on first use at that occupancy
        return _chunk_jitted(*self._chunk_spec, s_active=s_active)

    def _compact(self) -> None:
        """Move the highest active slot into the lowest free hole until
        active slots form a prefix (admission fills lowest-free first,
        so holes only come from retirement). Row moves are exact copies
        — the moved request's stream continues bit-identically."""
        while True:
            act = [i for i, s in enumerate(self.slots)
                   if s.req is not None]
            if not act:
                return
            holes = [i for i in range(act[-1]) if self.slots[i].req is None]
            if not holes:
                return
            src, dst = act[-1], holes[0]
            (self.caches, self.kv_valid, self.logits, self.rngs,
             self.done, self.cur) = _move_slot_jit(
                self.caches, self.kv_valid, self.logits, self.rngs,
                self.done, self.cur, jnp.asarray(src, jnp.int32),
                jnp.asarray(dst, jnp.int32))
            self.slots[dst] = self.slots[src]
            self.slots[src] = _Slot(finished=True)

    def step_chunk(self) -> list[int]:
        """Admit queued requests, decode one chunk, retire finished
        slots. Returns the rids completed this call. Per-slot cursors
        mean a free slot is ALWAYS admissible — no capacity gate."""
        for i in range(self.S):
            if self.slots[i].req is None and self.queue:
                self._admit(i, self.queue.pop(0))

        n_active = sum(s.req is not None for s in self.slots)
        if n_active == 0:
            return []
        self._compact()  # active slots -> prefix [0, n_active)
        s_run = self.last_rung = self._rung(n_active)

        (self.caches, self.logits, self.rngs, self.done, self.cur,
         packed) = self._chunk_fn_for(s_run)(
            self.params, self.caches, self.kv_valid, self.logits,
            self.rngs, self.done, self.cur)
        packed = np.asarray(packed)  # the chunk's ONE host fetch
        toks = packed[:, :self.chunk]
        dones = packed[:, self.chunk:].astype(bool)  # done AFTER each step
        done = dones[:, -1]

        finished = []
        cap_frozen: list[int] = []
        for i, s in enumerate(self.slots[:s_run]):
            if s.req is None:
                continue
            # steps where the slot was already frozen emit placeholder 0s
            # (ragged-decode `gen_len` convention: the EOS step itself is
            # not counted) — count only pre-EOS steps as real tokens
            n_prev = len(s.tokens)
            s.tokens.extend(int(t) for t in toks[i])
            n_real = n_prev + int(np.sum(~dones[i]))
            if done[i]:
                finished.append(s.req.rid)
                # the cap still binds even when EOS fires in the chunk
                # where the cap is crossed (max_new not chunk-aligned):
                # a solo stream truncated at its own cap must match
                self._retire(i, min(s.req.max_new, n_real))
            elif len(s.tokens) >= s.req.max_new:
                finished.append(s.req.rid)
                self._retire(i, min(s.req.max_new, n_real))
                # freeze the device-side flag too: without it a
                # cap-retired slot keeps sampling+stepping at full rate
                # every chunk until readmission (wasted decode compute
                # at partial occupancy, and its cursor keeps climbing so
                # stats()['cursors'] misleads). EOS-retired slots froze
                # themselves inside the chunk; do the same here.
                cap_frozen.append(i)
        if cap_frozen:
            mask = np.zeros((self.S,), bool)
            mask[cap_frozen] = True
            self.done = self.done | jnp.asarray(mask)  # fixed (S,) shape
        return finished

    def run(self, max_chunks: int = 10_000) -> dict[int, np.ndarray]:
        """Drive until queue and slots drain; returns {rid: tokens}."""
        for _ in range(max_chunks):
            if not self.queue and all(s.req is None for s in self.slots):
                break
            self.step_chunk()
        return dict(self.completed)

    # --------------------------------------------------------- metrics
    def stats(self) -> dict:
        lats = sorted(self.latency_s.values())

        def pct(p):
            return lats[min(len(lats) - 1,
                            int(p / 100 * len(lats)))] if lats else 0.0

        return {"completed": len(self.completed),
                "queued": len(self.queue),
                "active": sum(s.req is not None for s in self.slots),
                "last_rung": self.last_rung,
                "cursors": np.asarray(self.cur).tolist(),
                "p50_s": pct(50), "p95_s": pct(95), "p99_s": pct(99)}


class ContinuousValleBatcher(ContinuousARBatcher):
    """Continuous batching over `VALLE`'s AR (codebook-0) stage.

    Same per-slot-cursor mechanics as the base engine (which this
    inherits wholesale — `step_chunk`/`run`/`stats` are family-
    agnostic); only admission differs: a request is ``(phones, prompt
    codebook-0 tokens)`` and the packed window is the right-aligned
    ``[pad | phones_i | prompt_i]`` of `VALLE.ar_prefill_ragged` (ref
    `valle.py:371-436` ragged decode — the one-shot comparator these
    slot streams are token-identical to). NAR refinement + codec decode
    are single forward passes, not weight-streaming loops, so they run
    OUTSIDE the engine per completed request
    (`serving/continuous_service.py`)."""

    def __init__(self, model, params, *, slots: int = 4,
                 capacity: int | None = None, chunk: int = 16,
                 phone_buckets: tuple[int, ...] = (64, 128, 256),
                 prompt_buckets: tuple[int, ...] = (128, 256),
                 max_new: int = 768, temperature: float = 1.0,
                 top_k: int = 50, top_p: float = 1.0,
                 compute_dtype: str = "bfloat16"):
        from amphion_tpu.models.tts.valle import valle as _valle
        from amphion_tpu.models.tts.valle.valle import VALLE

        model, dt = _valle._decode_model_dtype(model, compute_dtype)
        params, self._int4_storage = _prep_engine_params(
            _valle._decode_params, params, compute_dtype)
        self.model, self.params = model, params
        self.S, self.chunk = slots, chunk
        self.buckets = tuple(sorted(phone_buckets))
        self.out_buckets = tuple(sorted(prompt_buckets))
        self.base = self.buckets[-1] + self.out_buckets[-1]
        need = self.base + max_new + chunk
        self.capacity = max(capacity or 0, need)
        self.default_max_new = max_new
        self._chunk_spec = (model, VALLE.ar_step, model.cfg.eos_id,
                            temperature, top_k, top_p, chunk,
                            self._int4_storage)
        self._admit_fn = _admit_valle_jitted(model, self._int4_storage)
        self.caches = LlamaDecoder(model.cfg.llama(False)).init_cache(
            slots, self.capacity, dtype=dt)
        self.kv_valid = (jnp.zeros((slots, self.capacity), bool)
                         .at[:, 0].set(True))
        self.logits = jnp.zeros((slots, model.cfg.audio_vocab + 1),
                                jnp.float32)
        self.rngs = jax.random.split(jax.random.key(0), slots)
        self.done = jnp.ones((slots,), bool)
        self.cur = jnp.ones((slots,), jnp.int32)
        self.slots = [_Slot(finished=True) for _ in range(slots)]
        self.queue: list[_Request] = []
        self._next_rid = 0
        self.completed: dict[int, np.ndarray] = {}
        self.latency_s: dict[int, float] = {}

    def submit(self, phones: np.ndarray, prompt_tokens: np.ndarray,
               rng: jax.Array, max_new: int | None = None) -> int:
        """Enqueue (phones, codebook-0 prompt tokens). The prompt stream
        is REQUIRED (zero-shot VALL-E always enrolls a prompt; pass a
        length-1 array for promptless smoke tests)."""
        rid = self._next_rid
        self._next_rid += 1
        phones = np.asarray(phones, np.int32)
        prompt = np.asarray(prompt_tokens, np.int32)
        window = (self._bucket(len(phones))
                  + self._bucket(len(prompt), self.out_buckets))
        if (max_new or self.default_max_new) + window + self.chunk \
                > self.capacity:
            raise ValueError("max_new + packed window exceeds the "
                             "engine's per-slot capacity — raise "
                             "capacity/max_new at init")
        self.queue.append(_Request(rid, phones, rng,
                                   max_new or self.default_max_new,
                                   prompt_output=prompt,
                                   submit_t=time.perf_counter()))
        return rid

    def _admit(self, slot_idx: int, req: _Request) -> None:
        lb = self._bucket(len(req.content))
        lo = self._bucket(len(req.prompt_output), self.out_buckets)
        pbuf = np.zeros((1, lb), np.int32)
        pbuf[0, :len(req.content)] = req.content
        tbuf = np.zeros((1, lo), np.int32)
        tbuf[0, :len(req.prompt_output)] = req.prompt_output
        (self.caches, self.kv_valid, self.logits, self.done,
         self.cur) = self._admit_fn(
            self.params, self.caches, self.kv_valid, self.logits,
            self.done, self.cur, jnp.asarray(pbuf),
            jnp.asarray(len(req.content), jnp.int32), jnp.asarray(tbuf),
            jnp.asarray(len(req.prompt_output), jnp.int32),
            jnp.asarray(slot_idx, jnp.int32))
        self.rngs = self.rngs.at[slot_idx].set(req.rng)
        req.admit_t = time.perf_counter()
        self.slots[slot_idx] = _Slot(req=req)
