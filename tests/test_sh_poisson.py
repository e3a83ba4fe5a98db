"""SH9 projection/evaluation + membrane residual plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.ops import sh as sh_lib


def test_sh_basis_orthonormal():
    """Monte-Carlo check: ⟨Y_i, Y_j⟩ ≈ δ_ij over uniform sphere samples."""
    dirs = sh_lib.stratified_sphere_directions(jax.random.PRNGKey(0), 64, 64)
    b = np.asarray(sh_lib.sh9_basis(dirs))  # [N, 9]
    gram = 4 * np.pi / len(b) * (b.T @ b)
    np.testing.assert_allclose(gram, np.eye(9), atol=0.02)


def test_project_then_evaluate_recovers_band_limited():
    """A function that IS an SH9 expansion projects and evaluates exactly."""
    rng = np.random.default_rng(0)
    coeffs = jnp.asarray(rng.normal(size=(9, 3)).astype(np.float32))
    dirs = sh_lib.stratified_sphere_directions(jax.random.PRNGKey(1), 48, 48)
    vals = sh_lib.evaluate_sh9(jnp.broadcast_to(coeffs, (dirs.shape[0], 9, 3)), dirs)
    recovered = sh_lib.project_sh9(dirs, vals)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(coeffs), atol=0.03)


def test_stratified_directions_uniform():
    dirs = np.asarray(sh_lib.stratified_sphere_directions(jax.random.PRNGKey(2), 32, 32))
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-5)
    assert np.abs(dirs.mean(0)).max() < 0.05  # centered


def test_membrane_residuals_shapes():
    from nerfshop_tpu.editing.poisson import MembraneData, membrane_residuals_at

    Nt, N = 10, 7
    rng = np.random.default_rng(1)
    mem = MembraneData(
        density=jnp.asarray(rng.uniform(0, 1, (Nt, 4)).astype(np.float32)),
        outside_density=jnp.asarray(rng.uniform(0.5, 2, (Nt, 4)).astype(np.float32)),
        sh=jnp.asarray(rng.normal(size=(Nt, 4, 9, 3)).astype(np.float32)),
        amplitude=jnp.asarray(2.0),
    )
    tet = jnp.asarray(rng.integers(0, Nt, N).astype(np.int32))
    bary = jnp.asarray(np.full((N, 4), 0.25, np.float32))
    in_t = jnp.asarray([True, True, False, True, False, True, True])
    d = jnp.asarray(np.tile([[0, 0, 1.0]], (N, 1)).astype(np.float32))
    rs, ro, rc = membrane_residuals_at(mem, tet, bary, in_t, d)
    assert rs.shape == (N,) and ro.shape == (N,)
    assert rc.shape == (N, 3)
    assert float(rs[2]) == 0.0 and float(ro[2]) == 0.0 and float(jnp.abs(rc[2]).sum()) == 0.0
    assert float(rs[0]) > 0.0 and float(ro[0]) > 0.0
