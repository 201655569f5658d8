"""Continuous batching engine (`serving/continuous.py`).

Contracts:
- a request decoded through the continuous engine is TOKEN-IDENTICAL to
  the one-shot ragged decode (`ar_transformer_generate_ragged`, itself
  solo-exact per tests/test_ragged_vevo.py), regardless of when it was
  admitted relative to other requests (mid-flight admission, slot reuse,
  epoch rollover);
- EOS freezing and per-request caps produce the ragged `gen_len`
  semantics;
- the engine drains an arbitrary arrival schedule.
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


def _oracle(model, params, content, key, max_new):
    toks, n = ar_transformer_generate_ragged(
        model, params, content[None], jnp.asarray([len(content)]),
        key[None], max_new=max_new, top_k=4, compute_dtype="float32")
    n = int(n[0])
    return np.asarray(toks[0])[:n]


def _engine(model, params, **kw):
    args = dict(slots=2, capacity=256, chunk=8, buckets=(8, 16),
                max_new=32, top_k=4, compute_dtype="float32")
    args.update(kw)
    return ContinuousARBatcher(model, params, **args)


def _contents(rng, n, lo=3, hi=14):
    out = []
    for i in range(n):
        ln = int(rng.integers(lo, hi))
        out.append(rng.integers(0, CFG.input_vocab, size=ln).astype(np.int32))
    return out


def test_single_request_matches_ragged(ar_setup):
    model, params = ar_setup
    content = np.arange(5, dtype=np.int32) % CFG.input_vocab
    key = jax.random.key(7)
    eng = _engine(model, params)
    rid = eng.submit(content, key, max_new=32)
    done = eng.run()
    want = _oracle(model, params, content, key, 32)
    got = done[rid]
    np.testing.assert_array_equal(got, want)


def test_staggered_admissions_are_exact(ar_setup):
    """Requests joining mid-flight (slot reuse, different lengths) each
    reproduce their solo decode bit-for-bit."""
    model, params = ar_setup
    rng = np.random.default_rng(0)
    contents = _contents(rng, 5)
    keys = [jax.random.key(100 + i) for i in range(5)]
    eng = _engine(model, params)

    # two in, decode a bit, then drip the rest in while decoding
    rids = [eng.submit(contents[0], keys[0]), eng.submit(contents[1], keys[1])]
    eng.step_chunk()
    rids.append(eng.submit(contents[2], keys[2]))
    eng.step_chunk()
    eng.step_chunk()
    rids.append(eng.submit(contents[3], keys[3]))
    rids.append(eng.submit(contents[4], keys[4]))
    done = eng.run()

    assert sorted(done) == sorted(rids)
    for rid, content, key in zip(rids, contents, keys):
        want = _oracle(model, params, content, key, 32)
        np.testing.assert_array_equal(
            done[rid], want, err_msg=f"request {rid} diverged")


def test_epoch_rollover_exact(ar_setup):
    """A capacity too small for the whole workload forces drain-and-reset
    epochs; requests decoded after the reset are still exact."""
    model, params = ar_setup
    rng = np.random.default_rng(1)
    contents = _contents(rng, 6)
    keys = [jax.random.key(200 + i) for i in range(6)]
    # capacity fits ~2 requests' worth of cursor per epoch
    eng = _engine(model, params, capacity=64, max_new=24, buckets=(16,))
    rids = [eng.submit(c, k, max_new=24) for c, k in zip(contents, keys)]
    done = eng.run()
    assert sorted(done) == sorted(rids)
    for rid, content, key in zip(rids, contents, keys):
        want = _oracle(model, params, content, key, 24)
        np.testing.assert_array_equal(
            done[rid], want, err_msg=f"request {rid} diverged")


def test_per_request_caps(ar_setup):
    """max_new differs per request; each stream is the solo stream
    truncated at its own cap."""
    model, params = ar_setup
    content = (np.arange(6) % CFG.input_vocab).astype(np.int32)
    keys = [jax.random.key(301), jax.random.key(302)]
    eng = _engine(model, params)
    r1 = eng.submit(content, keys[0], max_new=8)
    r2 = eng.submit(content, keys[1], max_new=24)
    done = eng.run()
    w1 = _oracle(model, params, content, keys[0], 8)
    w2 = _oracle(model, params, content, keys[1], 24)
    np.testing.assert_array_equal(done[r1], w1)
    np.testing.assert_array_equal(done[r2], w2)


def test_style_prompted_requests_exact(ar_setup):
    """Vevo-Voice protocol: requests carrying an output-stream style
    prompt decode token-identically to the prompted ragged decode, mixed
    in the same slots with unprompted requests."""
    model, params = ar_setup
    rng = np.random.default_rng(3)
    c1, c2 = _contents(rng, 2)
    po = rng.integers(0, CFG.output_vocab, size=6).astype(np.int32)
    k1, k2 = jax.random.key(401), jax.random.key(402)
    eng = _engine(model, params, out_buckets=(8,))
    r1 = eng.submit(c1, k1, max_new=16, prompt_output=po)
    r2 = eng.submit(c2, k2, max_new=16)  # unprompted, same engine
    done = eng.run()

    toks, n = ar_transformer_generate_ragged(
        model, params, c1[None], jnp.asarray([len(c1)]), k1[None],
        max_new=16, top_k=4, compute_dtype="float32",
        prompt_output_tokens=po[None],
        prompt_output_len=jnp.asarray([len(po)]))
    want1 = np.asarray(toks[0])[:int(n[0])]
    np.testing.assert_array_equal(done[r1], want1)
    want2 = _oracle(model, params, c2, k2, 16)
    np.testing.assert_array_equal(done[r2], want2)


def test_greedy_mode(ar_setup):
    """temperature<=0 decodes greedily (rng-independent) — the mode the
    exactness story of speculative decode and serving replays rely on."""
    model, params = ar_setup
    content = (np.arange(4) % CFG.input_vocab).astype(np.int32)
    eng = _engine(model, params, temperature=0.0)
    rid = eng.submit(content, jax.random.key(0), max_new=16)
    a = eng.run()[rid]
    eng2 = _engine(model, params, temperature=0.0)
    rid2 = eng2.submit(content, jax.random.key(999), max_new=16)
    b = eng2.run()[rid2]
    np.testing.assert_array_equal(a, b)


VALLE_CFG = None  # built lazily — import cost


@pytest.fixture(scope="module")
def valle_setup():
    from amphion_tpu.models.tts.valle.valle import VALLE, VALLEConfig

    cfg = VALLEConfig(num_phones=16, audio_vocab=32, num_quantizers=2,
                      hidden=32, num_layers=2, num_heads=2,
                      max_position=512)
    model = VALLE(cfg)
    phones = jnp.zeros((1, 6), jnp.int32)
    toks = jnp.zeros((1, 2, 8), jnp.int32)
    params = model.init(jax.random.key(0), phones,
                        jnp.ones((1, 6), jnp.float32), toks,
                        jnp.ones((1, 8), jnp.float32), jax.random.key(1),
                        method=VALLE.train_loss)["params"]
    return model, params, cfg


def test_valle_continuous_matches_ragged(valle_setup):
    """`ContinuousValleBatcher` slot streams are token-identical to
    `ar_generate_ragged` (VALL-E's one-shot comparator), including
    mid-flight admission."""
    from amphion_tpu.models.tts.valle.valle import ar_generate_ragged
    from amphion_tpu.serving.continuous import ContinuousValleBatcher

    model, params, cfg = valle_setup
    rng = np.random.default_rng(5)
    phs = [rng.integers(0, cfg.num_phones, size=int(rng.integers(3, 8)))
           .astype(np.int32) for _ in range(3)]
    prompts = [rng.integers(0, cfg.audio_vocab,
                            size=int(rng.integers(2, 7))).astype(np.int32)
               for _ in range(3)]
    keys = [jax.random.key(600 + i) for i in range(3)]

    eng = ContinuousValleBatcher(
        model, params, slots=2, capacity=256, chunk=8,
        phone_buckets=(8,), prompt_buckets=(8,), max_new=24,
        top_k=8, compute_dtype="float32")
    rids = [eng.submit(phs[0], prompts[0], keys[0]),
            eng.submit(phs[1], prompts[1], keys[1])]
    eng.step_chunk()
    rids.append(eng.submit(phs[2], prompts[2], keys[2]))
    done = eng.run()

    for rid, ph, pr, key in zip(rids, phs, prompts, keys):
        lb, lo = 8, 8
        phones = np.zeros((1, lb), np.int32)
        phones[0, :len(ph)] = ph
        prompt = np.zeros((1, lo), np.int32)
        prompt[0, :len(pr)] = pr
        toks, n = ar_generate_ragged(
            model, params, phones, np.asarray([len(ph)], np.int32),
            prompt, np.asarray([len(pr)], np.int32), key[None],
            max_new=24, top_k=8, compute_dtype="float32")
        want = np.asarray(toks[0])[:int(n[0])]
        np.testing.assert_array_equal(done[rid], want,
                                      err_msg=f"request {rid} diverged")


def test_stats_shape(ar_setup):
    model, params = ar_setup
    eng = _engine(model, params)
    content = (np.arange(4) % CFG.input_vocab).astype(np.int32)
    eng.submit(content, jax.random.key(5), max_new=8)
    eng.run()
    st = eng.stats()
    assert st["completed"] == 1 and st["queued"] == 0
    assert st["p50_s"] > 0 and st["p99_s"] >= st["p50_s"]


def test_occupancy_adaptive_rungs_and_compaction_exact(ar_setup):
    """Round 5: the chunk runs the smallest lane rung covering the
    active slots, compacting holes left by retirement — and every
    stream stays token-exact through lane MOVES and rung changes."""
    model, params = ar_setup
    rng = np.random.default_rng(11)
    contents = _contents(rng, 5)
    keys = [jax.random.key(700 + i) for i in range(5)]
    caps = [6, 28, 28, 20, 12]  # r0 retires early -> hole at lane 0
    eng = _engine(model, params, slots=4, chunk=4)
    rids = [eng.submit(contents[i], keys[i], max_new=caps[i])
            for i in range(3)]
    eng.step_chunk()
    assert eng.last_rung == 4  # 3 active -> rung 4
    # drive until the short request retires, leaving a hole
    while rids[0] not in eng.completed:
        eng.step_chunk()
    eng.step_chunk()
    assert eng.last_rung == 2  # 2 active after compaction
    rids.append(eng.submit(contents[3], keys[3], max_new=caps[3]))
    rids.append(eng.submit(contents[4], keys[4], max_new=caps[4]))
    done = eng.run()
    assert eng.last_rung >= 1
    for rid, content, key, cap in zip(rids, contents, keys, caps):
        want = _oracle(model, params, content, key, 32)[:cap]
        np.testing.assert_array_equal(done[rid], want,
                                      err_msg=f"request {rid} diverged")


def test_single_request_runs_one_lane(ar_setup):
    """A solo request must run the 1-lane rung (the low-occupancy cost
    fix: one lane ~= one-shot B=1 step cost)."""
    model, params = ar_setup
    eng = _engine(model, params)
    eng.submit((np.arange(5) % CFG.input_vocab).astype(np.int32),
               jax.random.key(3), max_new=8)
    eng.step_chunk()
    assert eng.last_rung == 1
