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

Reference semantics (round-4 parity; the round-3 simplification — adding
the raw SH difference — rendered a dark shell wherever the deformed region
overlapped occupied space):

* per cage vertex: σ_in/SH_in at the ORIGINAL position (σ_in zeroed where
  the occupancy grid is empty — ``filter_empty``), σ_out/SH_out at the
  DEFORMED position;
* per tet vertex (interpolate_poisson_boundary growing_selection.cu:2360):
  - sh   = Σⱼ γMVCⱼ·α_outⱼ·(SH_outⱼ − min(α_inⱼ/α_outⱼ,1)·SH_inⱼ)
           / (Σⱼ γMVCⱼ·α_outⱼ + 1e−6)       with α = 1−exp(−σ·Δmin)
  - outside_density  = Σⱼ γMVCⱼ·σ_outⱼ
  - residual_density = max(Σⱼ γMVCⱼ·(σ_outⱼ − σ_inⱼ), 0)
* per render sample (compute_residual_poisson_kernel cage_deformation.cu:431
  + composite testbed_nerf.cu:770-805): the GATE and the α-ratio weight use
  the OUTSIDE density (×amplitude); the residual density (×amplitude) only
  bounds the σ clamp; rgb = w_N·rgb_src + w_R·eval_sh9(sh, dir).
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
    """Per-tet-corner membrane boundary values consumed by the render warp
    (the reference's tet_interpolation_mesh boundary_* arrays)."""

    density: jnp.ndarray  # [Nt, 4] residual density max(σ_out − σ_in, 0)
    outside_density: jnp.ndarray  # [Nt, 4] receiving-scene density σ_out
    sh: jnp.ndarray  # [Nt, 4, 9, 3] α-weighted SH correction
    amplitude: jnp.ndarray  # [] user slider


def _occupied_at(grid, pos: jnp.ndarray) -> jnp.ndarray:
    """pos [N,3] world → bool occupancy at the finest covering cascade
    (the reference's density_grid_occupied_at in filter_empty)."""
    from nerfshop_tpu.ops import march as march_lib

    n_casc = grid.occupancy.shape[0]
    flat = march_lib._candidate_cells(
        pos, jnp.zeros_like(pos), jnp.zeros((pos.shape[0], 1)),
        jnp.zeros((pos.shape[0], 1)), n_casc,
    )
    return jnp.take(grid.occupancy.reshape(-1), flat[:, 0], axis=0)


def compute_membrane(
    model,
    params,
    cage,
    tet_mesh,
    aabb,
    rng,
    gamma: float = 4.0,
    amplitude: float = 1.0,
    grid=None,
) -> MembraneData:
    """Build membrane boundary values for the current cage deformation.

    ``grid``: optional OccupancyGrid — inside densities at grid-empty cage
    vertices are zeroed like the reference's filter_empty pass
    (growing_selection.cu:2304), so stray fog outside the surface doesn't
    fake a content boundary."""
    from nerfshop_tpu.common import MIN_CONE_STEPSIZE

    k1, k2 = jax.random.split(rng)
    cv_orig = jnp.asarray(cage.vertices_original)
    cv_def = jnp.asarray(cage.vertices_deformed)

    # inside: the content being moved, at its canonical (original) location
    sh_in, dens_in = sample_boundary_at(model, params, cv_orig, aabb, k1)
    # outside: the receiving scene, at the deformed location
    sh_out, dens_out = sample_boundary_at(model, params, cv_def, aabb, k2)
    if grid is not None:
        dens_in = jnp.where(_occupied_at(grid, cv_orig), dens_in, 0.0)

    # per-vertex α-weighted SH correction (interpolate_poisson_boundary,
    # growing_selection.cu:2373-2394): "outside always takes the lead" —
    # the inside term is scaled by min(α_in/α_out, 1)
    a_out = 1.0 - jnp.exp(-dens_out * MIN_CONE_STEPSIZE)
    a_in = 1.0 - jnp.exp(-dens_in * MIN_CONE_STEPSIZE)
    w_inside = jnp.minimum(a_in / jnp.maximum(a_out, 1e-9), 1.0)
    sh_diff = sh_out - w_inside[:, None, None] * sh_in  # [V, 9, 3]

    # γ-MVC interpolation of cage-vertex values onto tet vertices
    w = mvc_lib.mvc_gamma_weights(
        jnp.asarray(tet_mesh.vertices_original),
        cv_orig,
        jnp.asarray(cage.faces),
        gamma=gamma,
    )  # [T, V]
    denom = w @ a_out + 1e-6  # [T]
    sh_tet = jnp.einsum("tv,v,vkc->tkc", w, a_out, sh_diff) / denom[:, None, None]
    out_d_v = w @ dens_out  # [T]
    resid_d_v = jnp.maximum(w @ (dens_out - dens_in), 0.0)  # [T]

    tets = jnp.asarray(tet_mesh.tets)
    return MembraneData(
        density=resid_d_v[tets],  # [Nt, 4]
        outside_density=out_d_v[tets],  # [Nt, 4]
        sh=sh_tet[tets],  # [Nt, 4, 9, 3]
        amplitude=jnp.asarray(amplitude, jnp.float32),
    )


def membrane_residuals_at(
    membrane: MembraneData,
    tet: jnp.ndarray,  # [N] containing tet ids
    bary: jnp.ndarray,  # [N, 4]
    in_target: jnp.ndarray,  # [N]
    direction: jnp.ndarray,  # [N, 3] unwarped view dirs (canonical space)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ (residual σ, outside σ, residual rgb) per sample in the deformed
    region (compute_residual_poisson_kernel, cage_deformation.cu:431-541).
    The OUTSIDE density gates the blend and weights α_R; the residual
    density bounds the σ clamp; both are ×amplitude like the reference.

    2D-only shapes: a [N,4,9,3] gather tile-pads its (9,3) minor dims ~57×
    on TPU — at a render chunk's N it blew HBM at COMPILE time. Per-corner
    [N,27] row-gathers + a strided-slice SH evaluation stay dense."""
    dens4 = jnp.take(membrane.density, tet, axis=0)  # [N, 4]
    resid_sigma = jnp.sum(bary * dens4, axis=1)
    out4 = jnp.take(membrane.outside_density, tet, axis=0)  # [N, 4]
    outside_sigma = jnp.sum(bary * out4, axis=1)
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
        jnp.where(in_target, outside_sigma * amp, z),
        jnp.where(in_target[:, None], resid_rgb, jnp.zeros_like(resid_rgb)),
    )
