"""March + composite against analytic oracles (SURVEY §4: constant-density
box has closed-form transmittance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.common import MIN_CONE_STEPSIZE
from nerfshop_tpu.ops import composite as comp
from nerfshop_tpu.ops import grid as grid_lib
from nerfshop_tpu.ops import march
from nerfshop_tpu.ops.coords import BoundingBox


def _center_ray(n=1):
    o = jnp.tile(jnp.asarray([[-0.5, 0.5, 0.5]]), (n, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    return o, d


def test_march_full_occupancy_uniform_steps():
    occ = jnp.ones((1, 128, 128, 128), jnp.bool_)
    o, d = _center_ray()
    s = march.march_rays(
        o, d, occ, jnp.zeros(3), jnp.ones(3), jnp.zeros(()),
        k_samples=64,
    )
    n = int(s.n[0])
    assert n == 64  # fully occupied: fills all slots
    ts = np.asarray(s.t[0, :n])
    dts = np.asarray(s.dt[0, :n])
    # entry at t=0.5 (box starts at x=0), uniform fine steps
    assert ts[0] == pytest.approx(0.5, abs=1e-4)
    np.testing.assert_allclose(np.diff(ts), MIN_CONE_STEPSIZE, rtol=1e-4)
    np.testing.assert_allclose(dts, MIN_CONE_STEPSIZE, rtol=1e-5)


def test_march_skips_empty_space():
    """Occupancy only in a slab x∈[0.75, 0.8] → samples confined there."""
    occ = np.zeros((1, 128, 128, 128), bool)
    occ[0, 96:103, :, :] = True  # cells 96..102 ≈ x in [0.75, 0.8]
    o, d = _center_ray()
    s = march.march_rays(
        o, d, jnp.asarray(occ), jnp.zeros(3), jnp.ones(3), jnp.zeros(()),
        k_samples=64,
    )
    n = int(s.n[0])
    assert n > 0
    ts = np.asarray(s.t[0, :n])
    x = ts - 0.5  # ray param → x coordinate
    assert x.min() >= 0.74
    assert x.max() <= 0.81


def test_march_miss_and_outside():
    occ = jnp.ones((1, 128, 128, 128), jnp.bool_)
    o = jnp.asarray([[-0.5, 5.0, 0.5]])  # passes above the box
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    s = march.march_rays(o, d, occ, jnp.zeros(3), jnp.ones(3), jnp.zeros(()), k_samples=16)
    assert int(s.n[0]) == 0
    assert not bool(s.valid.any())


def test_composite_constant_density_matches_analytic():
    """σ constant over [a,b] → opacity = 1 − exp(−σ(b−a))."""
    K = 64
    sigma = 7.0
    dt = 0.01
    ts = jnp.arange(K, dtype=jnp.float32)[None] * dt + 0.3
    res = comp.composite(
        sigmas=jnp.full((1, K), sigma),
        rgbs=jnp.ones((1, K, 3)) * 0.7,
        dts=jnp.full((1, K), dt),
        ts=ts,
        valid=jnp.ones((1, K), bool),
        min_transmittance=0.0,
    )
    expect_op = 1 - np.exp(-sigma * dt * K)
    assert float(res.opacity[0]) == pytest.approx(expect_op, rel=1e-5)
    # constant radiance → composited rgb = radiance · opacity
    np.testing.assert_allclose(np.asarray(res.rgb[0]), 0.7 * expect_op, rtol=1e-5)


def test_composite_early_out_masks_far_samples():
    K = 32
    sigmas = jnp.full((1, K), 1000.0)  # opaque immediately
    res = comp.composite(
        sigmas=sigmas,
        rgbs=jnp.ones((1, K, 3)),
        dts=jnp.full((1, K), 0.01),
        ts=jnp.arange(K, dtype=jnp.float32)[None] * 0.01,
        valid=jnp.ones((1, K), bool),
        min_transmittance=1e-4,
    )
    assert int(res.n_used[0]) <= 2
    assert float(res.weights[0, 5]) == 0.0


def test_composite_invalid_slots_ignored():
    K = 8
    valid = jnp.asarray([[True, True, False, False, False, False, False, False]])
    res = comp.composite(
        sigmas=jnp.full((1, K), 5.0),
        rgbs=jnp.ones((1, K, 3)),
        dts=jnp.full((1, K), 0.1),
        ts=jnp.arange(K, dtype=jnp.float32)[None] * 0.1,
        valid=valid,
        min_transmittance=0.0,
    )
    expect = 1 - np.exp(-5.0 * 0.1 * 2)
    assert float(res.opacity[0]) == pytest.approx(expect, rel=1e-5)


def test_composite_is_differentiable():
    K = 16

    def loss(sigmas):
        res = comp.composite(
            sigmas=sigmas,
            rgbs=jnp.ones((2, K, 3)) * 0.5,
            dts=jnp.full((2, K), 0.05),
            ts=jnp.arange(K, dtype=jnp.float32)[None].repeat(2, 0) * 0.05,
            valid=jnp.ones((2, K), bool),
        )
        return jnp.sum((comp.composite_with_background(res, jnp.zeros(3)) - 0.3) ** 2)

    g = jax.grad(loss)(jnp.full((2, K), 1.0))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_march_respects_cascades():
    """Content outside the unit cube lands in coarser cascades."""
    occ = np.zeros((3, 128, 128, 128), bool)
    occ[2, :, :, :] = True  # only cascade 2 (covers side-4 cube) occupied
    aabb_lo = jnp.full(3, 0.5 - 2.0)
    aabb_hi = jnp.full(3, 0.5 + 2.0)
    o = jnp.asarray([[0.5, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    s = march.march_rays(
        o, d, jnp.asarray(occ), aabb_lo, aabb_hi, jnp.asarray(1.0 / 256),
        k_samples=32,
    )
    # samples exist only at t where pos is outside cascades 0/1 (|x-0.5|>1)
    ts = np.asarray(s.t[0])[np.asarray(s.valid[0])]
    assert len(ts) > 0
    assert (ts > 0.95).all()
