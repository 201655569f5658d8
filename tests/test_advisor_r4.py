"""Regression tests for the round-4 advisor findings (ADVICE.md).

1. (medium) `ContinuousARBatcher.submit` must REJECT a style-prompted
   request on an engine built without `out_buckets` — the old
   `ladder or self.buckets` fallback silently bucketed the style stream
   on the content ladder, overflowing the per-slot capacity the engine
   was sized for (clamped K/V writes -> silently wrong tokens).
2. (low) The cap binds even when max_new is not chunk-aligned and EOS
   fires in the chunk where the cap is crossed: the returned stream is
   always the solo stream truncated at its own cap.
3. (low) Cap-retired slots freeze on-device like EOS-retired ones:
   their cursor stops advancing in subsequent chunks (stats truthful,
   no clamped writes at capacity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.models.vc.ar_transformer import (
    ARTransformer,
    ARTransformerConfig,
    ar_transformer_generate_ragged,
)
from amphion_tpu.serving.continuous import ContinuousARBatcher

CFG = ARTransformerConfig(
    input_vocab=8, output_vocab=16, hidden=32, intermediate=64,
    num_layers=2, num_heads=2, max_position=512)


@pytest.fixture(scope="module")
def ar_setup():
    model = ARTransformer(CFG)
    toks = jnp.zeros((1, 6), jnp.int32)
    m = jnp.ones((1, 6), jnp.float32)
    params = model.init(jax.random.key(0), toks, m, toks, m,
                        method=ARTransformer.loss)["params"]
    return model, params


def _engine(model, params, **kw):
    args = dict(slots=2, capacity=256, chunk=8, buckets=(8, 16),
                max_new=32, top_k=4, compute_dtype="float32")
    args.update(kw)
    return ContinuousARBatcher(model, params, **args)


def _oracle(model, params, content, key, max_new):
    toks, n = ar_transformer_generate_ragged(
        model, params, content[None], jnp.asarray([len(content)]),
        key[None], max_new=max_new, top_k=4, compute_dtype="float32")
    return np.asarray(toks[0])[:int(n[0])]


def test_style_prompt_without_out_buckets_rejected(ar_setup):
    """Advisor-r4 medium: no silent content-ladder fallback."""
    model, params = ar_setup
    eng = _engine(model, params)  # out_buckets=() default
    content = (np.arange(5) % CFG.input_vocab).astype(np.int32)
    po = (np.arange(6) % CFG.output_vocab).astype(np.int32)
    with pytest.raises(ValueError, match="out_buckets"):
        eng.submit(content, jax.random.key(0), max_new=8, prompt_output=po)
    # and nothing was enqueued — the engine is still clean
    assert not eng.queue


def test_overlong_content_rejected_at_submit(ar_setup):
    model, params = ar_setup
    eng = _engine(model, params)
    content = np.zeros(17, np.int32)  # > largest bucket (16)
    with pytest.raises(ValueError, match="exceeds bucket"):
        eng.submit(content, jax.random.key(0))
    assert not eng.queue


def test_cap_binds_when_not_chunk_aligned(ar_setup):
    """Advisor-r4 low #1: max_new NOT a multiple of chunk — the stream
    must still be the solo stream truncated at exactly max_new, whether
    retirement happens via the cap branch or via EOS firing after the
    cap was crossed inside the same chunk."""
    model, params = ar_setup
    content = (np.arange(6) % CFG.input_vocab).astype(np.int32)
    for seed in (11, 12, 13, 14):
        key = jax.random.key(seed)
        eng = _engine(model, params, chunk=8)
        rid = eng.submit(content, key, max_new=5)  # crosses mid-chunk
        got = eng.run()[rid]
        want = _oracle(model, params, content, key, max_new=32)[:5]
        np.testing.assert_array_equal(got, want, err_msg=f"seed {seed}")
        assert len(got) <= 5


def test_cap_retired_slot_freezes_on_device(ar_setup):
    """Advisor-r4 low #2: after a cap retirement the slot's device done
    flag is set and its cursor stops advancing in later chunks."""
    model, params = ar_setup
    c1 = (np.arange(4) % CFG.input_vocab).astype(np.int32)
    c2 = (np.arange(6) % CFG.input_vocab).astype(np.int32)
    eng = _engine(model, params, chunk=4)
    r1 = eng.submit(c1, jax.random.key(21), max_new=4)   # retires chunk 1
    eng.submit(c2, jax.random.key(22), max_new=32)  # keeps running
    eng.step_chunk()
    assert r1 in eng.completed  # retired in chunk 1 (cap or early EOS)
    # after retirement + compaction the live request occupies lane 0 and
    # the VACATED lane 1 must be device-frozen: flag set, cursor parked
    eng.step_chunk()  # triggers compaction before the chunk
    assert eng.slots[1].req is None
    assert bool(np.asarray(eng.done)[1])
    cur_after = int(np.asarray(eng.cur)[1])
    eng.step_chunk()
    eng.step_chunk()
    assert int(np.asarray(eng.cur)[1]) == cur_after, \
        "freed lane's cursor kept advancing"


def test_frozen_cursor_preserves_exactness(ar_setup):
    """The cursor-freeze change to the chunk body must not perturb
    active lanes: staggered admissions stay token-exact vs solo."""
    model, params = ar_setup
    rng = np.random.default_rng(7)
    contents = [rng.integers(0, CFG.input_vocab, size=int(rng.integers(3, 14)))
                .astype(np.int32) for _ in range(3)]
    keys = [jax.random.key(500 + i) for i in range(3)]
    eng = _engine(model, params)
    rids = [eng.submit(contents[0], keys[0], max_new=12),
            eng.submit(contents[1], keys[1], max_new=7)]
    eng.step_chunk()
    rids.append(eng.submit(contents[2], keys[2], max_new=12))
    done = eng.run()
    for rid, content, key, cap in zip(rids, contents, keys, (12, 7, 12)):
        want = _oracle(model, params, content, key, 32)[:cap]
        np.testing.assert_array_equal(done[rid], want,
                                      err_msg=f"request {rid}")
