"""Skip-field march vs the one-shot march (same sampling semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.common import MIN_CONE_STEPSIZE
from nerfshop_tpu.ops import grid as grid_lib
from nerfshop_tpu.ops import march


def test_skip_field_values():
    occ = np.zeros((1, 128, 128, 128), bool)
    occ[0, 64, 64, 64] = True
    sk = np.asarray(grid_lib.skip_field_from_occupancy(jnp.asarray(occ)))
    assert sk[0, 64, 64, 64] == 0
    assert sk[0, 65, 64, 64] == 1
    assert sk[0, 64, 66, 65] == 2  # chebyshev
    assert sk[0, 0, 0, 0] == grid_lib.MAX_SKIP


def test_skip_march_matches_oneshot_in_slab():
    occ = np.zeros((1, 128, 128, 128), bool)
    occ[0, 96:103, :, :] = True
    occ_j = jnp.asarray(occ)
    skip = grid_lib.skip_field_from_occupancy(occ_j)
    o = jnp.asarray([[-0.5, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    s1 = march.march_rays(o, d, occ_j, jnp.zeros(3), jnp.ones(3), jnp.zeros(()), k_samples=64)
    s2 = march.march_rays_skip(o, d, skip, jnp.zeros(3), jnp.ones(3), jnp.zeros(()), k_samples=64, n_steps=256)
    n1, n2 = int(s1.n[0]), int(s2.n[0])
    assert n2 > 0
    t1 = np.asarray(s1.t[0, :n1])
    t2 = np.asarray(s2.t[0, :n2])
    # both confined to the slab
    assert t2.min() - 0.5 >= 0.74 and t2.max() - 0.5 <= 0.81
    # sample counts comparable (skip march may start the ladder differently)
    assert abs(n1 - n2) <= max(3, n1 // 4), (n1, n2)


def test_skip_march_full_occupancy():
    occ = jnp.ones((1, 128, 128, 128), jnp.bool_)
    skip = grid_lib.skip_field_from_occupancy(occ)
    o = jnp.asarray([[-0.5, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    s = march.march_rays_skip(o, d, skip, jnp.zeros(3), jnp.ones(3), jnp.zeros(()), k_samples=32, n_steps=64)
    assert int(s.n[0]) == 32
    ts = np.asarray(s.t[0])
    np.testing.assert_allclose(np.diff(ts), MIN_CONE_STEPSIZE, rtol=1e-4)


def test_skip_march_miss():
    occ = jnp.ones((1, 128, 128, 128), jnp.bool_)
    skip = grid_lib.skip_field_from_occupancy(occ)
    o = jnp.asarray([[-0.5, 5.0, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    s = march.march_rays_skip(o, d, skip, jnp.zeros(3), jnp.ones(3), jnp.zeros(()), k_samples=16)
    assert int(s.n[0]) == 0
