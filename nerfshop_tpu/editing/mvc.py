"""Mean value coordinates for closed triangle meshes (Ju, Schaefer, Warren
2005) — the interpolation core of NeRFshop's cage deformation (reference:
include/neural-graphics-primitives/editing/datastructures/mvc.h (390 LoC
QMVC-derived CUDA) and Cage::compute_mvc, cage.cu:7-36).

Re-implemented from the published algorithm as batched JAX: weights for P
query points w.r.t. a cage of V vertices / F triangles in one vectorized
pass (P×F). Supports the γ-sharpened variant the reference uses for
membrane interpolation (weights ∝ mvc^γ, renormalized).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-10


@partial(jax.jit, static_argnames=())
def mvc_weights(points: jnp.ndarray, cage_v: jnp.ndarray, cage_f: jnp.ndarray) -> jnp.ndarray:
    """points [P,3], cage_v [V,3], cage_f [F,3] → weights [P,V] (normalized,
    partition of unity; linear precision inside the cage)."""
    P = points.shape[0]
    V = cage_v.shape[0]

    d = cage_v[None, :, :] - points[:, None, :]  # [P, V, 3]
    r = jnp.linalg.norm(d, axis=-1)  # [P, V]
    r_safe = jnp.maximum(r, _EPS)
    u = d / r_safe[..., None]  # [P, V, 3] unit vectors

    # on-vertex special case handled by weight saturation at the end
    tri = cage_f  # [F, 3]
    u0 = u[:, tri[:, 0]]  # [P, F, 3]
    u1 = u[:, tri[:, 1]]
    u2 = u[:, tri[:, 2]]
    r0 = r_safe[:, tri[:, 0]]  # [P, F]
    r1 = r_safe[:, tri[:, 1]]
    r2 = r_safe[:, tri[:, 2]]

    # edge lengths on the unit sphere → arc angles
    l0 = jnp.linalg.norm(u1 - u2, axis=-1)
    l1 = jnp.linalg.norm(u2 - u0, axis=-1)
    l2 = jnp.linalg.norm(u0 - u1, axis=-1)
    th0 = 2.0 * jnp.arcsin(jnp.clip(l0 / 2, 0.0, 1.0))
    th1 = 2.0 * jnp.arcsin(jnp.clip(l1 / 2, 0.0, 1.0))
    th2 = 2.0 * jnp.arcsin(jnp.clip(l2 / 2, 0.0, 1.0))
    h = (th0 + th1 + th2) / 2

    sin_h = jnp.sin(h)
    c0 = 2 * sin_h * jnp.sin(h - th0) / jnp.maximum(jnp.sin(th1) * jnp.sin(th2), _EPS) - 1
    c1 = 2 * sin_h * jnp.sin(h - th1) / jnp.maximum(jnp.sin(th2) * jnp.sin(th0), _EPS) - 1
    c2 = 2 * sin_h * jnp.sin(h - th2) / jnp.maximum(jnp.sin(th0) * jnp.sin(th1), _EPS) - 1
    c0 = jnp.clip(c0, -1.0, 1.0)
    c1 = jnp.clip(c1, -1.0, 1.0)
    c2 = jnp.clip(c2, -1.0, 1.0)

    det = jnp.einsum("pfi,pfi->pf", u0, jnp.cross(u1, u2))
    sgn = jnp.sign(det)
    s0 = sgn * jnp.sqrt(jnp.maximum(1 - c0 * c0, 0.0))
    s1 = sgn * jnp.sqrt(jnp.maximum(1 - c1 * c1, 0.0))
    s2 = sgn * jnp.sqrt(jnp.maximum(1 - c2 * c2, 0.0))

    # x inside the triangle's plane but outside the triangle → contribution 0
    coplanar_out = (jnp.abs(s0) <= 1e-6) | (jnp.abs(s1) <= 1e-6) | (jnp.abs(s2) <= 1e-6)

    def safe_div(num, den):
        # sign-preserving: s_i is NEGATIVE for triangles seen back-facing
        # (any concave cage) — clamping the denominator to +eps destroys the
        # sign and with it MVC's linear precision off convex cages
        mag = jnp.maximum(jnp.abs(den), _EPS)
        return num / (jnp.where(den < 0, -mag, mag))

    w0 = safe_div(th0 - c1 * th2 - c2 * th1, r0 * jnp.sin(th1) * s2)
    w1 = safe_div(th1 - c2 * th0 - c0 * th2, r1 * jnp.sin(th2) * s0)
    w2 = safe_div(th2 - c0 * th1 - c1 * th0, r2 * jnp.sin(th0) * s1)

    # x lying ON the triangle → barycentric interpolation of just that tri
    on_tri = (jnp.pi - h) < 1e-5
    b0 = jnp.sin(th0) * r1 * r2
    b1 = jnp.sin(th1) * r2 * r0
    b2 = jnp.sin(th2) * r0 * r1

    w0 = jnp.where(coplanar_out, 0.0, w0)
    w1 = jnp.where(coplanar_out, 0.0, w1)
    w2 = jnp.where(coplanar_out, 0.0, w2)

    any_on = jnp.any(on_tri, axis=1)  # [P]
    w0 = jnp.where(on_tri, b0, jnp.where(any_on[:, None], 0.0, w0))
    w1 = jnp.where(on_tri, b1, jnp.where(any_on[:, None], 0.0, w1))
    w2 = jnp.where(on_tri, b2, jnp.where(any_on[:, None], 0.0, w2))

    # accumulate per-vertex (segment-sum over triangle corners)
    weights = jnp.zeros((P, V), points.dtype)
    weights = weights.at[:, tri[:, 0]].add(w0)
    weights = weights.at[:, tri[:, 1]].add(w1)
    weights = weights.at[:, tri[:, 2]].add(w2)

    # on-vertex saturation: if x coincides with a cage vertex, weight → δ
    on_vertex = r < 1e-7  # [P, V]
    any_on_v = jnp.any(on_vertex, axis=1)
    weights = jnp.where(any_on_v[:, None], on_vertex.astype(points.dtype), weights)

    total = jnp.sum(weights, axis=1, keepdims=True)
    return weights / jnp.where(jnp.abs(total) < _EPS, 1.0, total)


def mvc_gamma_weights(points, cage_v, cage_f, gamma: float = 1.0) -> jnp.ndarray:
    """γ-sharpened MVC (reference's membrane weighting): |w|^γ·sign preserved
    then renormalized; γ>1 localizes the interpolation near the closest
    cage vertices."""
    w = mvc_weights(points, cage_v, cage_f)
    if gamma == 1.0:
        return w
    wg = jnp.sign(w) * jnp.abs(w) ** gamma
    total = jnp.sum(wg, axis=1, keepdims=True)
    return wg / jnp.where(jnp.abs(total) < _EPS, 1.0, total)


def interpolate_with_mvc(weights: jnp.ndarray, cage_values: jnp.ndarray) -> jnp.ndarray:
    """[P,V] weights × [V,D] cage attributes → [P,D] (positions, SH, …)."""
    return weights @ cage_values
