"""Native constant-Q transform (ops/cqt.py) + MS-SB-CQT discriminator.

The CQT itself is pinned by the analytic properties that define a
constant-Q transform (nnAudio is not installable offline, so there is no
library oracle): pure tones peak at their own bin, magnitude is invariant
across octaves (the multi-octave downsampling chain preserves scale),
and the transform is linear. The discriminator's learnable stack is
oracle-verified against the reference torch module in
test_weight_conversion.py::TestMSSBCQTDiscriminatorRoundTrip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.ops.cqt import cqt


SR, HOP, BPO, NOCT = 48000, 256, 24, 9
NBINS = BPO * NOCT
FMIN = 32.70


def _tone(freq: float, secs: float = 1.0, amp: float = 1.0) -> jnp.ndarray:
    t = np.arange(int(SR * secs)) / SR
    return jnp.asarray(amp * np.sin(2 * np.pi * freq * t, dtype=np.float64),
                       jnp.float32)[None]


@pytest.fixture(scope="module")
def cqt_fn():
    return jax.jit(lambda x: cqt(x, SR, HOP, FMIN, NBINS, BPO))


def _mag(z):
    return np.sqrt((np.asarray(z) ** 2).sum(-1))


def test_tone_peaks_at_own_bin(cqt_fn):
    for k in (10, 52, 100, 148, 205):
        f = FMIN * 2.0 ** (k / BPO)
        m = _mag(cqt_fn(_tone(f)))[0]
        mid = m[:, m.shape[1] // 2]
        assert int(mid.argmax()) == k, (k, int(mid.argmax()))


def test_octave_invariant_magnitude(cqt_fn):
    """Same within-octave position in different octaves → same magnitude
    (the per-octave ÷2 chain must not change scale)."""
    mags = []
    for k in (4 + BPO * o for o in range(1, NOCT)):
        f = FMIN * 2.0 ** (k / BPO)
        m = _mag(cqt_fn(_tone(f)))[0]
        mags.append(m[k, m.shape[1] // 2])
    mags = np.asarray(mags)
    np.testing.assert_allclose(mags, mags.mean(), rtol=2e-3)


def test_linearity(cqt_fn):
    x1, x2 = _tone(440.0), _tone(1234.5, amp=0.5)
    z = np.asarray(cqt_fn(x1 + x2))
    z1, z2 = np.asarray(cqt_fn(x1)), np.asarray(cqt_fn(x2))
    np.testing.assert_allclose(z, z1 + z2, atol=1e-3)


def test_constant_q_bandwidth(cqt_fn):
    """-3 dB bandwidth measured in bins is frequency-independent
    (constant Q ⇒ constant log-frequency resolution)."""
    widths = []
    for k in (60, 110, 160):
        f = FMIN * 2.0 ** (k / BPO)
        m = _mag(cqt_fn(_tone(f)))[0][:, 90]
        half = m[k] / 2.0
        widths.append(int((m > half).sum()))
    assert max(widths) - min(widths) <= 1, widths


def test_output_geometry(cqt_fn):
    z = cqt_fn(_tone(440.0, secs=0.5))
    assert z.shape[0] == 1 and z.shape[1] == NBINS and z.shape[3] == 2
    # ~T/hop frames (±1 from the per-octave decimation chain)
    assert abs(z.shape[2] - int(0.5 * SR) // HOP) <= 1


def test_magnitude_output_mode():
    x = _tone(440.0, secs=0.25)
    zc = cqt(x, SR, HOP, FMIN, NBINS, BPO, output="complex")
    zm = cqt(x, SR, HOP, FMIN, NBINS, BPO, output="magnitude")
    np.testing.assert_allclose(np.asarray(zm), _mag(zc), atol=1e-5)


def test_hop_divisibility_guard():
    with pytest.raises(ValueError):
        cqt(_tone(100.0, secs=0.1), SR, 100, FMIN, NBINS, BPO)


def test_discriminator_shapes(rng=jax.random.key(0)):
    from amphion_tpu.models.vocoders.discriminators import (
        MultiScaleSubBandCQTDiscriminator,
    )

    d = MultiScaleSubBandCQTDiscriminator(
        sample_rate=24000, hops=(512, 256), n_octaves=(9, 9),
        bins_per_octaves=(24, 36))
    x = jax.random.normal(rng, (2, 4096)) * 0.1
    params = d.init(rng, x)["params"]
    logits, fmaps = d.apply({"params": params}, x)
    assert len(logits) == 2 and len(fmaps) == 2
    for lo, fm in zip(logits, fmaps):
        assert lo.shape[0] == 2 and lo.ndim == 2
        assert len(fm) == 5  # ref mssbcqtd.py:139-143 — one per conv in convs
        assert all(np.isfinite(np.asarray(f)).all() for f in fm)
