import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.models import encodings as enc


def test_hashgrid_shapes_and_determinism(rng):
    e = enc.GridEncoding(n_input_dims=3, n_levels=8, log2_hashmap_size=15, base_resolution=16, per_level_scale=1.5)
    params = e.init(rng)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = e.apply(params, x)
    assert out.shape == (64, 16)
    out2 = e.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_hashgrid_interpolation_continuity(rng):
    """Trilinear interpolation → tiny input perturbations → tiny output deltas."""
    e = enc.GridEncoding(n_input_dims=3, n_levels=4, log2_hashmap_size=14, base_resolution=16, per_level_scale=2.0)
    params = e.init(rng)
    x = jnp.asarray([[0.3, 0.4, 0.5]])
    eps = 1e-5
    a = e.apply(params, x)
    b = e.apply(params, x + eps)
    assert float(jnp.abs(a - b).max()) < 1e-5


def test_hashgrid_dense_levels_exact():
    """Coarse levels are dense: a lookup at a grid corner returns the table
    entry exactly (no hashing collisions)."""
    e = enc.GridEncoding(n_input_dims=3, n_levels=1, log2_hashmap_size=19, base_resolution=4, per_level_scale=2.0)
    params = e.init(jax.random.PRNGKey(0))
    res = e.level_res[0]
    scale = e.level_scales[0]
    # choose x so x*scale + 0.5 is integer k → zero fractional part
    k = 2
    x = jnp.full((1, 3), (k - 0.5) / scale)
    out = e.apply(params, x)
    expect = params["table"][k + res * (k + res * k)]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(expect), rtol=1e-5)


def test_hashgrid_gradients_flow(rng):
    e = enc.GridEncoding(n_input_dims=3, n_levels=4, log2_hashmap_size=12, base_resolution=8)
    params = e.init(rng)
    x = jax.random.uniform(jax.random.PRNGKey(2), (32, 3))

    def loss(p):
        return jnp.sum(e.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["table"]).sum()) > 0


def test_hashgrid_2d():
    e = enc.GridEncoding(n_input_dims=2, n_levels=4, log2_hashmap_size=12, base_resolution=8)
    params = e.init(jax.random.PRNGKey(0))
    out = e.apply(params, jax.random.uniform(jax.random.PRNGKey(1), (16, 2)))
    assert out.shape == (16, 8)


def test_sh_encoding_partition():
    """SH l=0 term is constant; output has degree² coeffs; matches analytic
    Y_1 values for canonical directions."""
    e = enc.SphericalHarmonicsEncoding(degree=4)
    d = jnp.asarray([[0.0, 0.0, 1.0]])  # unwarped dir (0,0,1): warped (.5,.5,1)
    out = e.apply((), (d + 1) / 2)
    assert out.shape == (1, 16)
    np.testing.assert_allclose(float(out[0, 0]), 0.28209479, rtol=1e-5)
    # dir=+z: Y_1^0 ∝ z → coeff index 2
    np.testing.assert_allclose(float(out[0, 2]), 0.48860251, rtol=1e-5)
    np.testing.assert_allclose(float(out[0, 1]), 0.0, atol=1e-6)


def test_frequency_encoding():
    e = enc.FrequencyEncoding(n_input_dims=2, n_frequencies=3)
    out = e.apply((), jnp.asarray([[0.0, 0.25]]))
    assert out.shape == (1, 12)
    # x=0 → sin terms 0, cos terms 1
    np.testing.assert_allclose(np.asarray(out[0, 0:6:2]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 1:6:2]), 1.0, atol=1e-6)


def test_composite_encoding(rng):
    e = enc.CompositeEncoding(
        nested=[
            enc.SphericalHarmonicsEncoding(degree=4),
            enc.IdentityEncoding(n_input_dims=2),
        ]
    )
    assert e.n_input_dims == 5
    assert e.n_output_dims == 18
    params = e.init(rng)
    out = e.apply(params, jax.random.uniform(jax.random.PRNGKey(3), (8, 5)))
    assert out.shape == (8, 18)


def test_build_encoding_from_config():
    cfg = {
        "otype": "Composite",
        "nested": [
            {"n_dims_to_encode": 3, "otype": "SphericalHarmonics", "degree": 4},
            {"otype": "Identity"},
        ],
    }
    e = enc.build_encoding(cfg, 3)
    assert e.n_output_dims == 16  # identity gets 0 dims → dropped
    e5 = enc.build_encoding(cfg, 5)
    assert e5.n_output_dims == 18
