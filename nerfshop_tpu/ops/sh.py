"""Real spherical harmonics, degree 3 (9 coefficients) — evaluation,
projection, rotation. Counterpart of the reference's SH9 utilities
(editing/tools/sh_utils.{h,cu}: project_sh9, evaluate_sh9, rotate_sh9) used
by the membrane correction.

All functions are batched jnp ops; an SH9 color field is [..., 9, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# normalization constants of the real SH basis l ≤ 2
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, 1.0925484305920792, 0.31539156525252005, 1.0925484305920792, 0.5462742152960396)


def sh9_basis(direction: jnp.ndarray) -> jnp.ndarray:
    """unit directions [..., 3] → basis values [..., 9]."""
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    return jnp.stack(
        [
            jnp.full_like(x, _C0),
            -_C1 * y,
            _C1 * z,
            -_C1 * x,
            _C2[0] * x * y,
            -_C2[1] * y * z,
            _C2[2] * (3.0 * z * z - 1.0),
            -_C2[3] * x * z,
            _C2[4] * (x * x - y * y),
        ],
        axis=-1,
    )


def evaluate_sh9(coeffs: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """coeffs [..., 9, C], direction [..., 3] → [..., C]."""
    b = sh9_basis(direction)  # [..., 9]
    return jnp.einsum("...k,...kc->...c", b, coeffs)


def project_sh9(directions: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Monte-Carlo projection: directions [N,3] (uniform on sphere),
    values [N, C] → coefficients [9, C].

    ⟨f, Y_k⟩ ≈ 4π/N Σ f(ω_i) Y_k(ω_i)."""
    b = sh9_basis(directions)  # [N, 9]
    n = directions.shape[0]
    return (4.0 * jnp.pi / n) * jnp.einsum("nk,nc->kc", b, values)


def stratified_sphere_directions(rng: jax.Array, n_theta: int = 10, n_phi: int = 10) -> jnp.ndarray:
    """Stratified uniform directions on S² (the reference uses a 10×10
    stratification for membrane boundary sampling)."""
    u = (jnp.arange(n_theta)[:, None] + jax.random.uniform(rng, (n_theta, n_phi))) / n_theta
    k2 = jax.random.fold_in(rng, 1)
    v = (jnp.arange(n_phi)[None, :] + jax.random.uniform(k2, (n_theta, n_phi))) / n_phi
    z = 1.0 - 2.0 * u.reshape(-1)
    phi = 2.0 * jnp.pi * v.reshape(-1)
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
