"""Energy metrics (reference: `evaluation/metrics/energy/`)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from amphion_tpu.ops.energy import energy_from_waveform


def _energies(ref, gen, win_size=1024, hop_size=256):
    t = min(len(ref), len(gen))
    t = t // hop_size * hop_size
    e_r = np.asarray(energy_from_waveform(jnp.asarray(ref[:t]), win_size, hop_size))[0]
    e_g = np.asarray(energy_from_waveform(jnp.asarray(gen[:t]), win_size, hop_size))[0]
    return e_r, e_g


def energy_rmse(ref, gen, win_size=1024, hop_size=256) -> float:
    e_r, e_g = _energies(ref, gen, win_size, hop_size)
    return float(np.sqrt(np.mean((e_r - e_g) ** 2)))


def energy_pearson_coefficients(ref, gen, win_size=1024, hop_size=256) -> float:
    e_r, e_g = _energies(ref, gen, win_size, hop_size)
    if e_r.std() < 1e-8 or e_g.std() < 1e-8:
        return 0.0
    return float(np.corrcoef(e_r, e_g)[0, 1])
