"""Real-speech-free QUALITY harness for the model-based aux stages
(VERDICT r2 #9): not architecture mechanics but asserted quality numbers
on constructed (harder-than-before) synthetic tasks.

- diarization: 3-speaker mixtures with OVERLAPPING turns + background
  noise → DER bound (previous tests: clean 2-speaker, no overlap);
- MDX separation: SI-SNR improvement of the separated source after a
  short training run on a synthetic vocals/instrumental task;
- speaker verification: EER on a constructed multi-speaker verification
  set, before vs after GE2E-style training — training must drive EER
  down to a bounded value.

All thresholds have margin over measured values so the suite stays
stable across seeds/platform numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SR = 24000


def _voice(dur_s, f0, formants, tilt=1.0, breath=0.0, seed=0, sr=SR):
    """Speech-like voiced signal: harmonic stack shaped by 'formants'
    with spectral tilt, optional breathiness, jitter + syllabic AM —
    distinct (f0, formants, tilt, breath) = distinct synthetic
    speaker."""
    rng = np.random.default_rng(seed)
    n = int(dur_s * sr)
    t = np.arange(n) / sr
    jitter = 1.0 + 0.02 * np.sin(2 * np.pi * rng.uniform(2, 5) * t)
    x = np.zeros(n)
    for k in range(1, 60):
        f = f0 * k
        if f > 9000:
            break
        a = k ** (-tilt)
        for fm in formants:
            if abs(f - fm) < 250:
                a *= 3.0
        x += a * np.sin(2 * np.pi * f * t * jitter
                        + rng.uniform(0, 2 * np.pi))
    if breath > 0:
        no = rng.standard_normal(n)
        sp = np.fft.rfft(no)
        fr = np.fft.rfftfreq(n, 1 / sr)
        sp *= np.clip(fr / 4000.0, 0, 1.2)
        br = np.fft.irfft(sp, n)
        x += breath * br / np.abs(br).max() * np.abs(x).max()
    x *= 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(2.5, 4.5) * t)
    return (x / np.abs(x).max()).astype(np.float32)


SPEAKERS = {
    "spk0": dict(f0=110, formants=(400, 900, 2000), tilt=1.8),
    "spk1": dict(f0=230, formants=(900, 2000, 3400), tilt=0.6, breath=0.1),
    "spk2": dict(f0=160, formants=(600, 2800, 4500), tilt=1.0, breath=0.5),
}


# ---------------------------------------------------------------------------
# 1. Diarization under overlap + noise
# ---------------------------------------------------------------------------


def test_der_overlapping_turns_with_noise():
    """3 speakers, every turn boundary overlapped by 0.3 s of the next
    speaker, plus 20 dB background noise: DER must stay < 0.30 and all
    three speakers must be found (frame-DER scores overlap regions
    against the later speaker — the scoring convention of our
    frame-based DER)."""
    from amphion_tpu.data.emilia.stages import (
        _mel_embed,
        diarization_error_rate,
        neural_diarizer,
    )

    rng = np.random.default_rng(3)
    turn_s, overlap_s = 2.0, 0.3
    order = ["spk0", "spk1", "spk2", "spk0", "spk2", "spk1"]
    total = turn_s * len(order)
    x = np.zeros(int(total * SR), np.float32)
    ref_turns = []
    for i, spk in enumerate(order):
        seg = _voice(turn_s + overlap_s, seed=10 + i, **SPEAKERS[spk])
        s = int(i * turn_s * SR)
        e = min(s + len(seg), len(x))
        x[s:e] += seg[: e - s]
        ref_turns.append((i * turn_s, min((i + 1) * turn_s + overlap_s,
                                          total), spk))
    x += 0.1 * np.sqrt(np.mean(x ** 2)) * rng.standard_normal(
        len(x)).astype(np.float32)  # ~20 dB SNR

    def embedder(audio, sr):
        e, _, _ = _mel_embed(np.asarray(audio, np.float32), sr,
                             win_s=len(audio) / sr, hop_s=len(audio) / sr)
        return e[0]

    hyp = neural_diarizer(x, SR, embedder=embedder, win_s=1.0, hop_s=0.25)
    n_spk = len({s for _, _, s in hyp})
    assert n_spk == 3, f"found {n_spk} speakers"
    der = diarization_error_rate(ref_turns, hyp, total)
    assert der < 0.30, f"DER {der:.3f}"


# ---------------------------------------------------------------------------
# 2. MDX separation: SI-SNR improvement after training
# ---------------------------------------------------------------------------


def test_mdx_sisnr_improvement_after_training():
    """A tiny ConvTDFNet trained for a few dozen steps on harmonic
    'vocals' + filtered-noise 'instrumental' mixtures must improve the
    separated target's SI-SNR over the mixture by > 3 dB on held-out
    mixtures (SI-SNRi — the separation quality number)."""
    import optax

    from amphion_tpu.evaluation.metrics.spectrogram import si_snr
    from amphion_tpu.models.mdx_net import (
        ConvTDFNet,
        MDXConfig,
        mdx_istft,
        mdx_stft,
        mdx_train_step,
    )

    cfg = MDXConfig(n_fft=256, hop=64, dim_f=96, dim_t_log2=5,
                    num_blocks=3, conv_depth=1, growth=8, bottleneck=4)
    sr = 8000

    def batch(seed, b=4):
        r = np.random.default_rng(seed)
        mixes, targets = [], []
        for i in range(b):
            f0 = r.uniform(120, 300)
            t = np.arange(cfg.chunk_size) / sr
            voc = sum(np.sin(2 * np.pi * f0 * k * t
                             + r.uniform(0, 2 * np.pi)) / k
                      for k in range(1, 6))
            voc = (voc / np.abs(voc).max() * 0.5).astype(np.float32)
            noise = r.standard_normal(cfg.chunk_size).astype(np.float32)
            spec = np.fft.rfft(noise)
            f = np.fft.rfftfreq(cfg.chunk_size, 1 / sr)
            spec *= np.exp(-f / 600.0)  # low-passed "instrumental"
            inst = np.fft.irfft(spec, cfg.chunk_size).astype(np.float32)
            inst *= 0.5 / max(np.abs(inst).max(), 1e-9)
            mixes.append(np.stack([voc + inst] * 2))
            targets.append(np.stack([voc] * 2))
        return (np.stack(mixes, 0).astype(np.float32),
                np.stack(targets, 0).astype(np.float32))

    model = ConvTDFNet(cfg)
    mix0, tgt0 = batch(1)
    variables = model.init(jax.random.key(0), mdx_stft(mix0, cfg),
                           train=True)
    params, stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(3e-3)
    step = mdx_train_step(model, opt)
    opt_state = opt.init(params)

    def separate(params, stats, mix):
        spec = mdx_stft(mix, cfg)
        pred = model.apply({"params": params, "batch_stats": stats}, spec)
        return np.asarray(mdx_istft(pred, cfg))

    test_mix, test_tgt = batch(99)
    def sisnri(params, stats):
        est = separate(params, stats, test_mix)
        vals = []
        for i in range(len(test_mix)):
            ref = test_tgt[i, 0]
            vals.append(si_snr(ref, est[i, 0]) - si_snr(ref, test_mix[i, 0]))
        return float(np.mean(vals))

    before = sisnri(params, stats)
    for i in range(150):
        mix, tgt = batch(100 + i)
        params, stats, opt_state, loss = step(params, stats, opt_state,
                                              mix, tgt)
    after = sisnri(params, stats)
    # measured: -34.5 dB (random init) -> +5.6 dB after 150 steps
    assert after > before + 20.0, (before, after)
    assert after > 3.0, (before, after)


# ---------------------------------------------------------------------------
# 3. Speaker-embedder EER before/after training
# ---------------------------------------------------------------------------


def _eer(scores_same, scores_diff):
    """Equal error rate from genuine/impostor similarity scores."""
    thr = np.sort(np.concatenate([scores_same, scores_diff]))
    best = 1.0
    for t in thr:
        frr = float(np.mean(scores_same < t))
        far = float(np.mean(scores_diff >= t))
        if abs(frr - far) < best:
            best, eer = abs(frr - far), (frr + far) / 2
    return eer


def test_ge2e_eer_improves_with_training():
    """GE2E d-vectors on a constructed 4-speaker verification set: a
    short GE2E-softmax training run must drive EER down (< 0.15 after,
    and strictly better than the random-init embedder)."""
    import optax

    from amphion_tpu.models.ge2e import GE2EConfig, GE2EEncoder, ge2e_mel

    cfg = GE2EConfig(n_mel=40, hidden=64, num_layers=2, embed_dim=64)
    model = GE2EEncoder(cfg)
    sr = 16000
    spks = {
        "a": (110, (450, 1000, 2200)),
        "b": (240, (800, 1800, 3000)),
        "c": (160, (600, 1300, 2500)),
        "d": (300, (900, 2000, 3300)),
    }

    def utt_mel(spk, seed):
        f0, fm = spks[spk]
        w = _voice(1.7, f0, fm, seed=seed, sr=sr)
        m = np.asarray(ge2e_mel(jnp.asarray(w)[None], cfg))[0]
        return m[: cfg.partial_frames]

    # train/test utterance banks (disjoint seeds)
    train = {s: np.stack([utt_mel(s, 10 * i + j) for j in range(10)])
             for i, s in enumerate(spks)}
    test = {s: [utt_mel(s, 1000 + 10 * i + j) for j in range(4)]
            for i, s in enumerate(spks)}

    params = model.init(jax.random.key(0),
                        jnp.zeros((1, cfg.partial_frames, cfg.n_mel))
                        )["params"]

    names = list(spks)
    stacked = jnp.asarray(np.stack([train[s] for s in names]))  # (S,U,T,M)
    S, U = stacked.shape[:2]

    mstd = float(jnp.std(stacked))

    def ge2e_loss(params, rng):
        # mel-noise augmentation: without it the tiny LSTM keys on
        # per-utterance episodic detail and test EER plateaus ~0.17
        noisy = stacked + 0.3 * mstd * jax.random.normal(rng, stacked.shape)
        e = model.apply({"params": params},
                        noisy.reshape(S * U, *stacked.shape[2:]))
        e = e.reshape(S, U, -1)
        cent = e.mean(axis=1)
        cent = cent / jnp.linalg.norm(cent, axis=-1, keepdims=True)
        # exclusive centroid for the own-speaker similarity
        cent_ex = (e.sum(axis=1, keepdims=True) - e) / (U - 1)
        cent_ex = cent_ex / jnp.linalg.norm(cent_ex, axis=-1, keepdims=True)
        sim = jnp.einsum("sud,kd->suk", e, cent) * 10.0
        own = jnp.einsum("sud,sud->su", e, cent_ex) * 10.0
        idx = jnp.arange(S)
        sim = sim.at[idx, :, idx].set(own)
        logp = jax.nn.log_softmax(sim, axis=-1)
        return -jnp.mean(logp[idx, :, idx])

    n_steps = 200
    opt = optax.adam(optax.cosine_decay_schedule(3e-3, n_steps, alpha=0.02))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, rng):
        loss, g = jax.value_and_grad(ge2e_loss)(params, rng)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    def eer_of(params):
        embs = {s: [np.asarray(model.apply({"params": params},
                                           jnp.asarray(m)[None]))[0]
                    for m in test[s]] for s in spks}
        same, diff = [], []
        for s in spks:
            es = embs[s]
            for i in range(len(es)):
                for j in range(i + 1, len(es)):
                    same.append(float(es[i] @ es[j]))
            for s2 in spks:
                if s2 <= s:
                    continue
                for ea in embs[s]:
                    for eb in embs[s2]:
                        diff.append(float(ea @ eb))
        return _eer(np.asarray(same), np.asarray(diff))

    eer_before = eer_of(params)
    for i in range(n_steps):
        params, opt_state, loss = train_step(params, opt_state,
                                             jax.random.key(i))
    eer_after = eer_of(params)
    # measured: 0.46 at random init -> 0.083 after training
    assert eer_after < 0.15, (eer_before, eer_after)
    assert eer_after <= eer_before, (eer_before, eer_after)
