import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from amphion_tpu.models.vc.ar_transformer import (
    ARTransformer,
    ARTransformerConfig,
    ar_transformer_generate,
)
from amphion_tpu.models.vc.flow_matching_transformer import (
    FlowMatchingTransformer,
    FMTConfig,
    fmt_inference,
)
from amphion_tpu.models.vocoders.vocos import VocosConfig, VocosGenerator

AR_TINY = ARTransformerConfig(
    input_vocab=8, output_vocab=16, hidden=32, num_layers=2, num_heads=4,
    max_position=128, use_global_timbre=True,
)
FMT_TINY = FMTConfig(
    token_vocab=16, n_mel=8, hidden=32, num_layers=2, num_heads=4,
    max_position=128,
)


def test_vocos_generator(rng):
    cfg = VocosConfig(n_mel=16, dim=32, intermediate_dim=64, num_layers=2,
                      n_fft=64, hop_size=16)
    gen = VocosGenerator(cfg)
    mel = jnp.asarray(rng.standard_normal((2, 20, 16)).astype(np.float32))
    params = gen.init(jax.random.key(0), mel)["params"]
    wav = gen.apply({"params": params}, mel)
    assert wav.shape == (2, 20 * 16)
    assert np.isfinite(np.asarray(wav)).all()


def test_ar_transformer_loss_and_generate(rng):
    model = ARTransformer(AR_TINY)
    inp = jnp.asarray(rng.integers(0, 8, (2, 6)))
    out = jnp.asarray(rng.integers(0, 16, (2, 10)))
    imask = jnp.ones((2, 6), jnp.float32)
    omask = jnp.ones((2, 10), jnp.float32)
    ref_mel = jnp.asarray(rng.standard_normal((2, 16, 80)).astype(np.float32))
    params = model.init(
        jax.random.key(0), inp, imask, out, omask, ref_mel,
        method=ARTransformer.loss,
    )["params"]
    loss, aux = model.apply(
        {"params": params}, inp, imask, out, omask, ref_mel,
        method=ARTransformer.loss,
    )
    assert np.isfinite(float(loss))
    # random init → CE near log(total unified vocab) (ref ar_model.py:69)
    assert abs(float(loss) - np.log(AR_TINY.total_vocab)) < 1.0

    toks, lens = ar_transformer_generate(
        model, params, inp, jax.random.key(1), max_new=8, top_k=5, ref_mel=ref_mel
    )
    assert toks.shape == (2, 8)
    assert (np.asarray(toks) < AR_TINY.total_vocab).all()


def test_ar_transformer_generate_int8_runs(rng):
    """compute_dtype="int8": weight-only-quantized Vevo AR decode produces
    valid unified-vocab tokens (Pallas kernel in interpret mode on CPU)."""
    model = ARTransformer(AR_TINY)
    inp = jnp.asarray(rng.integers(0, 8, (1, 6)))
    out = jnp.asarray(rng.integers(0, 16, (1, 10)))
    ref_mel = jnp.asarray(rng.standard_normal((1, 16, 80)).astype(np.float32))
    params = model.init(
        jax.random.key(0), inp, jnp.ones((1, 6)), out, jnp.ones((1, 10)),
        ref_mel, method=ARTransformer.loss,
    )["params"]
    toks, lens = ar_transformer_generate(
        model, params, inp, jax.random.key(1), max_new=4, top_k=5,
        ref_mel=ref_mel, compute_dtype="int8",
    )
    assert toks.shape == (1, 4)
    assert (np.asarray(toks) < AR_TINY.total_vocab).all()


def test_fmt_loss_overfit_and_inference(rng):
    model = FlowMatchingTransformer(FMT_TINY)
    b, t = 2, 12
    mel = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, 16, (b, t)))
    pmask = jnp.asarray(
        np.stack([np.r_[np.ones(4), np.zeros(8)], np.zeros(12)])
    ).astype(jnp.float32)
    xmask = jnp.ones((b, t), jnp.float32)
    params = model.init(
        jax.random.key(0), mel, tokens, pmask, xmask, jax.random.key(1),
        method=FlowMatchingTransformer.loss,
    )["params"]

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rng):
        def loss_fn(p):
            return model.apply(
                {"params": p}, mel, tokens, pmask, xmask, rng,
                method=FlowMatchingTransformer.loss,
            )

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    losses = [float(step(params, opt, jax.random.key(i))[2]) for i in range(1)]
    for i in range(25):
        params, opt, loss = step(params, opt, jax.random.key(i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    # inference: clean prompt prefix (first 4 frames), generate the rest
    out = fmt_inference(
        model, params, tokens, mel[:, :4], jax.random.key(9), num_steps=8,
        cfg_scale=0.7,
    )
    assert out.shape == (b, t - 4, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_fmt_midpoint_solver_convergence(rng):
    """solver="midpoint" (explicit RK2, 2 estimator evals/step) must
    converge to the same ODE terminal as the reference's midpoint-sampled
    Euler and beat it at a MATCHED eval budget (second- vs first-order):
    with fixed x_0, error vs a 256-step Euler reference must shrink with
    step count, and midpoint@8 (16 evals) must beat Euler@16 (16 evals)."""
    model = FlowMatchingTransformer(FMT_TINY)
    b, t = 2, 12
    mel = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, 16, (b, t)))
    pmask = jnp.asarray(
        np.stack([np.r_[np.ones(4), np.zeros(8)], np.zeros(12)])
    ).astype(jnp.float32)
    xmask = jnp.ones((b, t), jnp.float32)
    params = model.init(
        jax.random.key(0), mel, tokens, pmask, xmask, jax.random.key(1),
        method=FlowMatchingTransformer.loss,
    )["params"]
    noise = jnp.asarray(rng.standard_normal((b, t - 4, 8)).astype(np.float32))

    def run(n, solver):
        return np.asarray(fmt_inference(
            model, params, tokens, mel[:, :4], jax.random.key(9),
            num_steps=n, cfg_scale=0.7, noise=noise, solver=solver))

    ref = run(256, "euler")

    def err(n, solver):
        return float(np.sqrt(np.mean((run(n, solver) - ref) ** 2)))

    assert np.isfinite(ref).all()
    # convergence in step count for the new solver
    assert err(16, "midpoint") < err(4, "midpoint")
    # matched eval budget: RK2 @ n beats Euler @ 2n (measured ~4x here)
    assert err(8, "midpoint") < err(16, "euler")
    """flow_eval_fused (one batch-2B estimator call per ODE step) must
    reproduce the reference two-pass CFG math of flow_eval exactly — the
    uncond row is right-padded under an attention mask, so valid positions
    see identical attention."""
    model = FlowMatchingTransformer(FMT_TINY)
    b, lp, lt = 2, 4, 9
    xt = jnp.asarray(rng.standard_normal((b, lt, 8)).astype(np.float32))
    prompt = jnp.asarray(rng.standard_normal((b, lp, 8)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, 16, (b, lp + lt)))
    t = jnp.asarray([0.3, 0.8], jnp.float32)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((b, lp + lt, 8)), tokens,
        jnp.zeros((b, lp + lt)), jnp.ones((b, lp + lt)), jax.random.key(1),
        method=FlowMatchingTransformer.loss,
    )["params"]
    for cfg in (0.0, 1.0):
        two = model.apply({"params": params}, xt, t, tokens, prompt, cfg,
                          0.75, method=FlowMatchingTransformer.flow_eval)
        fused = model.apply(
            {"params": params}, xt, t, tokens, prompt, cfg, 0.75,
            method=FlowMatchingTransformer.flow_eval_fused)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(two),
                                   atol=2e-5, rtol=1e-4)


def test_ar_transformer_generate_int4_runs(rng):
    """compute_dtype="int4": group-wise int4 weight-only decode produces
    valid unified-vocab tokens (Pallas kernel in interpret mode on CPU)."""
    model = ARTransformer(AR_TINY)
    inp = jnp.asarray(rng.integers(0, 8, (1, 6)))
    out = jnp.asarray(rng.integers(0, 16, (1, 10)))
    ref_mel = jnp.asarray(rng.standard_normal((1, 16, 80)).astype(np.float32))
    params = model.init(
        jax.random.key(0), inp, jnp.ones((1, 6)), out, jnp.ones((1, 10)),
        ref_mel, method=ARTransformer.loss,
    )["params"]
    toks, lens = ar_transformer_generate(
        model, params, inp, jax.random.key(1), max_new=4, top_k=5,
        ref_mel=ref_mel, compute_dtype="int4",
    )
    assert toks.shape == (1, 4)
    assert (np.asarray(toks) < AR_TINY.total_vocab).all()
