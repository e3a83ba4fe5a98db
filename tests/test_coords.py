import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.ops import coords


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    xyz = rng.integers(0, 128, (1000, 3)).astype(np.uint32)
    code = coords.morton3d(jnp.asarray(xyz[:, 0]), jnp.asarray(xyz[:, 1]), jnp.asarray(xyz[:, 2]))
    x, y, z = coords.morton3d_invert(code)
    np.testing.assert_array_equal(np.asarray(x), xyz[:, 0])
    np.testing.assert_array_equal(np.asarray(y), xyz[:, 1])
    np.testing.assert_array_equal(np.asarray(z), xyz[:, 2])


def test_morton_known_values():
    # interleaved bits: (1,0,0)->1, (0,1,0)->2, (0,0,1)->4, (7,7,7)->511
    assert int(coords.morton3d(jnp.uint32(1), jnp.uint32(0), jnp.uint32(0))) == 1
    assert int(coords.morton3d(jnp.uint32(0), jnp.uint32(1), jnp.uint32(0))) == 2
    assert int(coords.morton3d(jnp.uint32(0), jnp.uint32(0), jnp.uint32(1))) == 4
    assert int(coords.morton3d(jnp.uint32(7), jnp.uint32(7), jnp.uint32(7))) == 511


def test_dense_morton_roundtrip():
    rng = np.random.default_rng(1)
    dense = jnp.asarray(rng.standard_normal((128, 128, 128)).astype(np.float32))
    flat = coords.dense_grid_to_morton(dense)
    back = coords.morton_to_dense_grid(flat)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(dense))


def test_warp_roundtrip():
    aabb = coords.BoundingBox.from_aabb_scale(4)
    pos = jnp.asarray(np.random.default_rng(2).uniform(-1.5, 2.5, (100, 3)).astype(np.float32))
    w = coords.warp_position(pos, aabb)
    back = coords.unwarp_position(w, aabb)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pos), atol=1e-5)

    d = jnp.asarray(np.random.default_rng(3).normal(size=(100, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(coords.unwarp_direction(coords.warp_direction(d))), np.asarray(d), atol=1e-6
    )


def test_mip_from_pos():
    # cascade k covers a cube of side 2^k centered at 0.5
    assert int(coords.mip_from_pos(jnp.asarray([0.5, 0.5, 0.9]), 5)) == 0
    assert int(coords.mip_from_pos(jnp.asarray([0.5, 0.5, 1.1]), 5)) == 1
    assert int(coords.mip_from_pos(jnp.asarray([0.5, 0.5, 2.1]), 5)) == 2
    assert int(coords.mip_from_pos(jnp.asarray([7.9, 0.5, 0.5]), 5)) == 4  # clamped


def test_ray_aabb_intersect():
    aabb = coords.BoundingBox.unit()
    o = jnp.asarray([[-1.0, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    tmin, tmax = aabb.ray_intersect(o, d)
    np.testing.assert_allclose(np.asarray(tmin), [1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tmax), [2.0], atol=1e-5)

    d_miss = jnp.asarray([[0.0, 1.0, 0.0]])
    tmin, tmax = aabb.ray_intersect(o, d_miss)
    assert float(tmin[0]) > float(tmax[0])


def test_cascaded_grid_coords():
    pos = jnp.asarray([[0.5, 0.5, 0.5]])
    cell = coords.cascaded_grid_coords(pos, jnp.asarray([0]))
    np.testing.assert_array_equal(np.asarray(cell[0]), [64, 64, 64])
    # mip 1: same world pos maps to the center as well
    cell1 = coords.cascaded_grid_coords(pos, jnp.asarray([1]))
    np.testing.assert_array_equal(np.asarray(cell1[0]), [64, 64, 64])
    # pos 0.75 in mip1 grid → (0.75-0.5)*0.5+0.5 = 0.625 → cell 80
    cell2 = coords.cascaded_grid_coords(jnp.asarray([[0.75, 0.5, 0.5]]), jnp.asarray([1]))
    np.testing.assert_array_equal(np.asarray(cell2[0]), [80, 64, 64])


def test_calc_dt_clamps():
    from nerfshop_tpu.common import MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE

    assert float(coords.calc_dt(jnp.asarray(0.0), jnp.asarray(0.0))) == pytest.approx(MIN_CONE_STEPSIZE)
    assert float(coords.calc_dt(jnp.asarray(1e9), jnp.asarray(1.0))) == pytest.approx(MAX_CONE_STEPSIZE)
