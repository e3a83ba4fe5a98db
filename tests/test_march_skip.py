"""One-shot march: selection modes (first vs spread), window continuation
aux, dt calibration under subsampling, and miss handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.common import MIN_CONE_STEPSIZE
from nerfshop_tpu.ops import march


def _slab_occ(lo=96, hi=103):
    occ = np.zeros((1, 128, 128, 128), bool)
    occ[0, lo:hi, :, :] = True
    return jnp.asarray(occ)


def test_spread_matches_first_when_under_budget():
    """≤ K occupied candidates → spread reduces exactly to first-K."""
    occ = _slab_occ(96, 99)  # thin slab: few occupied candidates
    o = jnp.asarray([[-0.5, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    s1 = march.march_rays(o, d, occ, jnp.zeros(3), jnp.ones(3), jnp.zeros(()), k_samples=64)
    s2 = march.march_rays(
        o, d, occ, jnp.zeros(3), jnp.ones(3), jnp.zeros(()),
        k_samples=64, selection="spread",
    )
    assert int(s1.n[0]) == int(s2.n[0]) > 0
    n = int(s1.n[0])
    np.testing.assert_allclose(np.asarray(s1.t[0, :n]), np.asarray(s2.t[0, :n]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.dt[0, :n]), np.asarray(s2.dt[0, :n]), rtol=1e-5)


def test_spread_covers_full_ray_with_calibrated_dt():
    """Dense occupancy (warm-up): spread samples span the whole AABB path and
    Σdt equals the occupied path length — no budget cliff."""
    occ = jnp.ones((1, 128, 128, 128), jnp.bool_)
    o = jnp.asarray([[-0.5, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    K = 256  # stride cap 4 → K must span the path: 256·4·√3/1024 ≈ 1.7
    s = march.march_rays(
        o, d, occ, jnp.zeros(3), jnp.ones(3), jnp.zeros(()),
        k_samples=K, selection="spread",
    )
    assert int(s.n[0]) == K
    ts = np.asarray(s.t[0])
    # covers (almost) the full unit path, not just a 0.05-unit shell
    assert ts.max() - ts.min() > 0.8, ts
    # optical-depth calibration: strided dt sums to the traversed length
    total = float(np.asarray(s.dt[0]).sum())
    assert abs(total - 1.0) < 0.15, total


def test_first_selection_in_slab():
    occ = _slab_occ()
    o = jnp.asarray([[-0.5, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    s = march.march_rays(o, d, occ, jnp.zeros(3), jnp.ones(3), jnp.zeros(()), k_samples=64)
    n = int(s.n[0])
    assert n > 0
    t = np.asarray(s.t[0, :n])
    assert t.min() - 0.5 >= 0.74 and t.max() - 0.5 <= 0.81
    np.testing.assert_allclose(np.diff(t), MIN_CONE_STEPSIZE, rtol=1e-4)


def test_window_continuation_aux():
    """Aux reports exhaustion and t_last continues past the first window."""
    occ = jnp.ones((1, 128, 128, 128), jnp.bool_)
    o = jnp.asarray([[-0.5, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    s, aux = march.march_rays(
        o, d, occ, jnp.zeros(3), jnp.ones(3), jnp.zeros(()),
        k_samples=16, with_aux=True,
    )
    assert bool(aux.exhausted[0])
    t_last = float(aux.t_last[0])
    # second window starts where the first ended
    s2 = march.march_rays(
        o, d, occ, jnp.zeros(3), jnp.ones(3), jnp.zeros(()),
        k_samples=16, t_start=aux.t_last,
    )
    assert float(s2.t[0, 0]) >= t_last - 1e-5
    assert float(s2.t[0, 0]) > float(s.t[0, -1])


def test_march_miss():
    occ = jnp.ones((1, 128, 128, 128), jnp.bool_)
    o = jnp.asarray([[-0.5, 5.0, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    s = march.march_rays(o, d, occ, jnp.zeros(3), jnp.ones(3), jnp.zeros(()), k_samples=16)
    assert int(s.n[0]) == 0


def test_grid_early_stop_saturation():
    """A dense high-density grid saturates the transmittance proxy — the
    march reports saturation and stops emitting far samples."""
    occ = jnp.ones((1, 128, 128, 128), jnp.bool_)
    dens = jnp.full((1, 128, 128, 128), 1000.0)
    o = jnp.asarray([[-0.5, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    s, aux = march.march_rays(
        o, d, occ, jnp.zeros(3), jnp.ones(3), jnp.zeros(()),
        k_samples=64, density_grid=dens, use_grid_early_stop=True, with_aux=True,
    )
    assert bool(aux.saturated[0])
    n = int(s.n[0])
    assert 0 < n < 64  # stopped early, not the full budget
