"""Membrane (Poisson) seam correction for cage edits.

Reference pipeline (E11, SURVEY §2.4): sample the NeRF's rgb/σ on a sphere
of directions at every cage vertex — at its ORIGINAL position (the content
being moved, queried in canonical space) and at its DEFORMED position (the
scene surrounding the new location) — project radiance to SH9 per vertex
(compute_poisson_boundary growing_selection.cu:2220-2348, project_sh9
sh_utils.cu), interpolate to tet vertices with γ-sharpened MVC
(interpolate_poisson_boundary 2350-2409), and at render time add the
barycentrically-interpolated residual density & SH color difference to
samples inside the deformed region (compute_poisson_full_residuals
cage_deformation.cu:431-541; composite blend testbed_nerf.cu:770-805).

Simplification vs the CUDA composite: the reference mixes network and
residual colors by an α-ratio with a target clamp; we add the residual
density σ += clamp(σ_out − σ_in, 0) · amplitude and the SH color delta
rgb += eval_sh9(sh_out − sh_in, dir), clamped to ≥ 0 — the same
boundary-matching signal in a fused-friendly form.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.editing import mvc as mvc_lib
from nerfshop_tpu.ops import coords, sh as sh_lib


def sample_boundary_at(model, params, centers: jnp.ndarray, aabb, rng, n_dirs: int = 100, radius: float = 0.0):
    """Query the field around each center over stratified sphere directions.

    → (sh9 radiance [V, 9, 3], mean density [V])."""
    V = centers.shape[0]
    dirs = sh_lib.stratified_sphere_directions(rng, 10, max(n_dirs // 10, 1))  # [D, 3]
    D = dirs.shape[0]
    pos = centers[:, None, :] + radius * dirs[None, :, :]  # [V, D, 3]
    pos_w = jnp.clip(coords.warp_position(pos.reshape(-1, 3), aabb), 0.0, 1.0)
    dir_w = coords.warp_direction(jnp.tile(dirs, (V, 1)))
    rgb, sigma = model(params, pos_w, dir_w)
    rgb = rgb.reshape(V, D, 3)
    sigma = sigma.reshape(V, D)
    sh = jax.vmap(lambda v: sh_lib.project_sh9(dirs, v))(rgb)  # [V, 9, 3]
    return sh, jnp.mean(sigma, axis=1)


class MembraneData(NamedTuple):
    """Per-tet-corner membrane residuals consumed by the render warp."""

    density: jnp.ndarray  # [Nt, 4] residual density (≥ 0)
    sh: jnp.ndarray  # [Nt, 4, 9, 3] SH color difference (outside − inside)
    amplitude: jnp.ndarray  # [] user slider


def compute_membrane(
    model,
    params,
    cage,
    tet_mesh,
    aabb,
    rng,
    gamma: float = 4.0,
    amplitude: float = 1.0,
) -> MembraneData:
    """Build membrane residuals for the current cage deformation."""
    k1, k2 = jax.random.split(rng)
    cv_orig = jnp.asarray(cage.vertices_original)
    cv_def = jnp.asarray(cage.vertices_deformed)

    # inside: the content being moved, at its canonical (original) location
    sh_in, dens_in = sample_boundary_at(model, params, cv_orig, aabb, k1)
    # outside: the receiving scene, at the deformed location
    sh_out, dens_out = sample_boundary_at(model, params, cv_def, aabb, k2)

    # γ-MVC interpolation of cage-vertex values onto tet vertices
    w = mvc_lib.mvc_gamma_weights(
        jnp.asarray(tet_mesh.vertices_original),
        cv_orig,
        jnp.asarray(cage.faces),
        gamma=gamma,
    )  # [T, V]
    resid_d_v = jnp.maximum(w @ (dens_out - dens_in), 0.0)  # [T]
    sh_diff_v = jnp.einsum("tv,vkc->tkc", w, sh_out - sh_in)  # [T, 9, 3]

    tets = jnp.asarray(tet_mesh.tets)
    return MembraneData(
        density=resid_d_v[tets],  # [Nt, 4]
        sh=sh_diff_v[tets],  # [Nt, 4, 9, 3]
        amplitude=jnp.asarray(amplitude, jnp.float32),
    )


def membrane_residuals_at(
    membrane: MembraneData,
    tet: jnp.ndarray,  # [N] containing tet ids
    bary: jnp.ndarray,  # [N, 4]
    in_target: jnp.ndarray,  # [N]
    direction: jnp.ndarray,  # [N, 3] unwarped view dirs (canonical space)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (residual σ [N], residual rgb [N,3]) for samples in the deformed
    region (compute_poisson_full_residuals, cage_deformation.cu:431-541).

    2D-only shapes: a [N,4,9,3] gather tile-pads its (9,3) minor dims ~57×
    on TPU — at a render chunk's N it blew HBM at COMPILE time. Per-corner
    [N,27] row-gathers + a strided-slice SH evaluation stay dense."""
    dens4 = jnp.take(membrane.density, tet, axis=0)  # [N, 4]
    resid_sigma = jnp.sum(bary * dens4, axis=1)
    msh = membrane.sh.reshape(membrane.sh.shape[0], 4, 27)
    sh27 = None
    for k in range(4):
        rows = jnp.take(msh[:, k, :], tet, axis=0)  # [N, 27]
        term = bary[:, k : k + 1] * rows
        sh27 = term if sh27 is None else sh27 + term
    basis = sh_lib.sh9_basis(direction)  # [N, 9]
    resid_rgb = jnp.stack(
        [jnp.sum(basis * sh27[:, c::3], axis=1) for c in range(3)], axis=-1
    )
    amp = membrane.amplitude
    z = jnp.zeros_like(resid_sigma)
    return (
        jnp.where(in_target, resid_sigma * amp, z),
        jnp.where(in_target[:, None], resid_rgb * amp, jnp.zeros_like(resid_rgb)),
    )
