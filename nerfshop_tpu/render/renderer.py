"""Frame rendering: the TPU-native counterpart of render_nerf / NerfTracer
(src/testbed_nerf.cu:3066, 2772).

Design divergence from CUDA (deliberate, XLA-first): instead of the
double-buffered alive-ray compaction loop with a host-synced alive counter
every iteration (testbed_nerf.cu:2827), each pixel chunk runs ONE one-shot
occupancy-guided sampler (ops/march.py — fixed K slots, zero loops, zero
host syncs) followed by ONE batched network evaluation and a cumulative-sum
composite. Early termination appears as (a) the sampler's density-grid
transmittance proxy and (b) the composite's hard transmittance cutoff,
instead of per-iteration ray retirement. The network eval is a dense
[chunk·K, ·] matmul slab on the MXU.

The whole frame is ONE jitted program: ``lax.map`` over pixel chunks keeps
per-dispatch overhead (and host round-trips) out of the frame loop, and the
chunk size bounds peak memory (chunk × k_samples ≤ ~2^18 network inputs per
map step, vs. the reference's ~1M-sample trace batches).

Render modes supported: Shade, Depth, Positions, Normals (autodiff of the
density field — the analog of network.input_gradient at 2924), Cost
(samples/ray; ERenderMode::Cost), AO (opacity).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.common import (
    MIN_TRANSMITTANCE_RENDER,
    RenderMode,
)
from nerfshop_tpu.models.nerf_network import NerfNetwork
from nerfshop_tpu.ops import composite as comp
from nerfshop_tpu.ops import coords, march, rays as rays_lib

NEAR_DISTANCE_RENDER = 0.05  # NERF_RENDERING_NEAR_DISTANCE (common_nerf.h:24)


@dataclass(frozen=True)
class RenderOptions:
    k_samples: int = 32
    #: march candidate budget per window (reference: 1024 steps/ray,
    #: common_nerf.h:25)
    n_candidates: int = 1024
    #: extra march+eval windows for rays whose K budget filled before the
    #: transmittance cutoff (the analog of the reference's compaction
    #: rounds); each window restarts the ladder at the previous window's end
    n_windows: int = 2
    cone_angle: float = 0.0
    aabb_scale: int = 1
    min_transmittance: float = MIN_TRANSMITTANCE_RENDER
    chunk: int = 1 << 13
    mode: RenderMode = RenderMode.Shade
    use_grid_early_stop: bool = True
    background: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    #: network evaluation runs only on VALID samples, compacted into a slab
    #: of ``compact_frac · chunk · k_samples`` rows. 0 (default) disables:
    #: the compaction is a scatter, and TPU scatters run at ~12 M rows/s —
    #: slower than just field-evaluating the invalid rows. Tile culling
    #: (render_frame_tiled) is the TPU-native replacement: skip work at
    #: 8×8-pixel granularity on the host instead of per-sample on device.
    compact_frac: float = 0.0
    #: eval sub-slab width (tiled path): each field-eval dispatch processes
    #: ``chunk/ (tile²) · tile² · eval_slab`` samples per sub-slab, and tiles
    #: bucket by march count at this granularity. 16 puts each sub-slab at
    #: the measured v5e rate peak (batch 2^17: 14.6 M samples/s vs 13.5 at
    #: 2^18, probe_field_rate) and lets shallow tiles ship 16/48-slot
    #: buckets instead of rounding up to 32/64.
    eval_slab: int = 16
    #: view-aligned slice distance for RenderMode.Slice (m_slice_plane_z)
    slice_z: float = 0.5
    #: membrane seam-correction blend: "target" = the reference's α-ratio
    #: color mix + density clamp min(max(σ_target, σ_src), σ_src+σ_resid)
    #: (composite_kernel_nerf testbed_nerf.cu:770-805, poisson_target=true);
    #: "additive" = σ+=resid, rgb+=SHdelta (round-2 simplification)
    membrane_mode: str = "target"
    #: number of edit operators baked into the compiled chunk fn (operators
    #: themselves are traced arguments; only the count/type is static)
    n_edit_operators: int = 0
    #: optional render crop box ((lo3), (hi3)) in world coords — marching is
    #: clipped to it (reference: m_render_aabb, testbed.h / render crop GUI)
    render_aabb: Optional[Tuple[Tuple[float, float, float], Tuple[float, float, float]]] = None
    #: depth-of-field: lens aperture radius (world units) + focus distance
    #: (reference: m_dof / m_scale-based focus, pixel_to_ray DoF sampling)
    aperture: float = 0.0
    focus_z: float = 1.0


class FrameOutput(NamedTuple):
    rgba: jnp.ndarray  # [H, W, 4]
    depth: jnp.ndarray  # [H, W]


def _compacted_field_eval(field_fn, pos: jnp.ndarray, dirs: jnp.ndarray, valid: jnp.ndarray, budget: int):
    """Evaluate ``field_fn(pos, dirs) → (rgb, σ)`` only on rows where
    ``valid``, through a fixed-size compaction slab.

    Rank-compaction is scatter/gather of ~N rows (≈0.1 G rows/s on TPU) —
    far cheaper than field-evaluating the invalid rows it removes. Valid
    rows beyond the budget (rare: busy chunks) read σ=0.
    """
    n = pos.shape[0]
    ranks = jnp.cumsum(valid.astype(jnp.int32))  # inclusive [N]
    slot = jnp.minimum(ranks - 1, budget - 1)
    dest = jnp.where(valid & (ranks <= budget), slot, budget)  # budget = dump row
    pos_c = jnp.zeros((budget + 1, 3), pos.dtype).at[dest].set(pos, mode="drop")
    dir_c = jnp.zeros((budget + 1, 3), dirs.dtype).at[dest].set(dirs, mode="drop")
    rgb_c, sig_c = field_fn(pos_c[:budget], dir_c[:budget])
    ok = valid & (ranks <= budget)
    sigma = jnp.where(ok, jnp.take(sig_c, slot, axis=0), 0.0)
    rgb = jnp.where(ok[:, None], jnp.take(rgb_c, slot, axis=0), 0.0)
    return rgb, sigma


def _eval_window(
    model: NerfNetwork,
    params,
    samples: march.SampleBatch,
    origins,
    directions,
    opts: RenderOptions,
    aabb,
    operators: tuple,
    extra: "Optional[jnp.ndarray]" = None,  # [E] per-frame extra dims (light dir)
):
    """Network evaluation + per-sample edit warp for one march window.
    → (sigma [R,K], rgb [R,K,3])."""
    R, K = samples.t.shape
    empty_mask = None
    resid_sigma = resid_rgb = resid_out = None
    if operators:
        from nerfshop_tpu.editing import operators as op_lib

        pos_world = origins[:, None, :] + samples.t[..., None] * directions[:, None, :]
        dirs_world = jnp.broadcast_to(directions[:, None, :], pos_world.shape)
        p, dvec, empty, rs, ro, rc = op_lib.map_samples_through_stack_full(
            list(operators), pos_world.reshape(-1, 3), dirs_world.reshape(-1, 3)
        )
        pos_w = jnp.clip(coords.warp_position(p.reshape(R, K, 3), aabb), 0.0, 1.0)
        dir_w = coords.warp_direction(dvec.reshape(R, K, 3))
        empty_mask = empty.reshape(R, K)
        resid_sigma = rs.reshape(R, K)
        resid_out = ro.reshape(R, K)
        resid_rgb = rc.reshape(R, K, 3)
    else:
        pos_w, dir_w = march.samples_to_network_inputs(samples, origins, directions, aabb)
    flat_pos = pos_w.reshape(R * K, 3)
    flat_dir = dir_w.reshape(R * K, 3)

    if opts.mode == RenderMode.Normals:
        def density_sum(p):
            return jnp.sum(model.density(params, p))

        grads = jax.grad(density_sum)(flat_pos)
        normals = -grads / (jnp.linalg.norm(grads, axis=-1, keepdims=True) + 1e-9)
        rgb_s = (normals * 0.5 + 0.5).reshape(R, K, 3)
        sigma = model.density(params, flat_pos).reshape(R, K)
    elif opts.mode == RenderMode.Positions:
        rgb_s = flat_pos.reshape(R, K, 3)
        sigma = model.density(params, flat_pos).reshape(R, K)
    else:
        budget = int(R * K * opts.compact_frac)
        budget = -(-budget // 256) * 256 if budget > 0 else 0
        ex = None
        if extra is not None and getattr(model, "n_extra_dims", 0):
            ex = jnp.broadcast_to(extra[None, :], (R * K, extra.shape[-1]))
        if ex is not None:
            field = lambda p, d: model(
                params, p, d,
                extra=jnp.broadcast_to(extra[None, :], (p.shape[0], extra.shape[-1])),
            )
        else:
            field = lambda p, d: model(params, p, d)
        if 0 < budget < R * K:
            rgb, sigma = _compacted_field_eval(
                field, flat_pos, flat_dir, samples.valid.reshape(-1), budget
            )
        else:
            rgb, sigma = field(flat_pos, flat_dir)
        rgb_s = rgb.reshape(R, K, 3)
        sigma = sigma.reshape(R, K)

    if empty_mask is not None:
        # emptying enforced per-sample at composite time (α=0 via empty_mask;
        # reference: composite_kernel_nerf 764-767)
        sigma = jnp.where(empty_mask, 0.0, sigma)
    if resid_sigma is not None:
        # reference parity (composite_kernel_nerf testbed_nerf.cu:770-805,
        # compute_residual_poisson_kernel cage_deformation.cu:431): the GATE
        # and the α-ratio weight use the receiving scene's OUTSIDE density
        # (×amplitude); the residual density only bounds the σ clamp; rgb is
        # mixed with eval_sh9 of the α-weighted SH correction in BOTH modes:
        #   target:   σ = min(max(σ_target, σ_src), σ_src + σ_resid)
        #   additive: σ = σ_src + σ_resid
        #   rgb = w_N·rgb_src + w_R·rgb_sh,  w_R = α_R/(α_N+α_R), α_R from
        #   the outside density.
        # empty_mask has ABSOLUTE priority (the α=0 branch comes first,
        # residual logic lives in the else): a vacated sample stays σ=0.
        on = resid_out > 1e-9
        if empty_mask is not None:
            on = on & ~empty_mask
        dt = samples.dt
        alpha_n = 1.0 - jnp.exp(-sigma * dt)
        alpha_r = 1.0 - jnp.exp(-resid_out * dt)
        den = alpha_n + alpha_r
        w_n = jnp.where(den > 1e-12, alpha_n / jnp.maximum(den, 1e-12), 1.0)
        rgb_mix = w_n[..., None] * rgb_s + (1.0 - w_n)[..., None] * resid_rgb
        if opts.membrane_mode == "target":
            # σ_target = the receiving scene's own density at the sample
            # (the field at the UNWARPED position)
            tgt_pos_w = jnp.clip(
                coords.warp_position(pos_world.reshape(-1, 3), aabb), 0.0, 1.0
            )
            sigma_tgt = model.density(params, tgt_pos_w).reshape(R, K)
            sigma_new = jnp.minimum(
                jnp.maximum(sigma_tgt, sigma), sigma + resid_sigma
            )
        else:
            sigma_new = sigma + resid_sigma
        sigma = jnp.where(on, sigma_new, sigma)
        rgb_s = jnp.where(on[..., None], rgb_mix, rgb_s)
    return sigma, rgb_s


def _render_chunk(
    model: NerfNetwork,
    params,
    grid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    opts: RenderOptions,
    bg: jnp.ndarray,
    operators: tuple = (),
    envmap: Optional[jnp.ndarray] = None,
    extra: Optional[jnp.ndarray] = None,
):
    aabb = coords.BoundingBox.from_aabb_scale(opts.aabb_scale)
    # render crop: marching clipped to the crop box (reference m_render_aabb);
    # field coords still warp by the FULL aabb so the network sees unchanged
    # positions — the crop only bounds which t-window gets sampled
    if opts.render_aabb is not None:
        lo, hi = opts.render_aabb
        march_box = coords.BoundingBox(jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32))
    else:
        march_box = aabb
    R = origins.shape[0]
    # one march with the FULL sample budget (k_samples × n_windows): the
    # two-stage march prices extra K slots at ~zero additional gathers, so
    # re-marching per window (the round-1 design) just doubled the march —
    # the grid early-stop already invalidates post-saturation samples and
    # the compacted eval skips them
    K = opts.k_samples * max(1, opts.n_windows)
    samples, aux = march.march_rays(
        origins,
        directions,
        grid.occupancy,
        march_box.min,
        march_box.max,
        jnp.asarray(opts.cone_angle),
        t_start_min=NEAR_DISTANCE_RENDER,
        k_samples=K,
        n_candidates=opts.n_candidates,
        density_grid=grid.density,
        use_grid_early_stop=opts.use_grid_early_stop,
        selection="first",
        with_aux=True,
    )
    sigma, rgb_s = _eval_window(model, params, samples, origins, directions, opts, aabb, operators, extra)
    res = comp.composite(
        sigma, rgb_s, samples.dt, samples.t, samples.valid, opts.min_transmittance
    )
    acc_rgb = res.rgb
    depth = res.depth
    acc_opacity = res.opacity
    trans = res.transmittance
    n_used = res.n_used

    if opts.mode == RenderMode.Slice:
        # density slice on the view-aligned plane at t = slice_z (reference:
        # ERenderMode::Slice + m_slice_plane_z): one field sample per pixel
        t_s = jnp.full((R,), opts.slice_z)
        p = origins + t_s[:, None] * directions
        pw = jnp.clip(coords.warp_position(p, aabb), 0.0, 1.0)
        rgb_sl, sig_sl = model(params, pw, coords.warp_direction(directions))
        a = 1.0 - jnp.exp(-sig_sl * 0.01)
        return jnp.concatenate([rgb_sl * a[:, None], a[:, None]], -1), t_s

    if opts.mode in (RenderMode.Depth, RenderMode.Distance):
        # t is already euclidean distance along the unit-norm ray
        v = depth[:, None] * jnp.ones((1, 3))
        rgba = jnp.concatenate([v, acc_opacity[:, None]], -1)
    elif opts.mode == RenderMode.Stepsize:
        # first valid sample's dt relative to the base step
        from nerfshop_tpu.common import MIN_CONE_STEPSIZE

        dt0 = jnp.where(samples.valid[:, 0], samples.dt[:, 0], 0.0) / MIN_CONE_STEPSIZE
        v = dt0[:, None] * jnp.ones((1, 3))
        rgba = jnp.concatenate([v, jnp.ones_like(v[:, :1])], -1)
    elif opts.mode == RenderMode.Cost:
        v = (n_used.astype(jnp.float32) / K)[:, None] * jnp.ones((1, 3))
        rgba = jnp.concatenate([v, jnp.ones_like(v[:, :1])], -1)
    elif opts.mode == RenderMode.AO:
        v = acc_opacity[:, None] * jnp.ones((1, 3))
        rgba = jnp.concatenate([v, acc_opacity[:, None]], -1)
    else:
        if envmap is not None:
            # envmap background behind transparent pixels (reference:
            # envmap bg in init_rays, testbed_nerf.cu:2512 + composite)
            em = jnp.asarray(envmap)
            from nerfshop_tpu.ops import envmap as envmap_lib

            bg_ray = envmap_lib.sample_envmap(em, directions)
            rgb_out = acc_rgb + trans[:, None] * bg_ray[:, :3]
            alpha = acc_opacity + trans * jnp.ones_like(trans)
        else:
            rgb_out = acc_rgb + trans[:, None] * bg[:3]
            alpha = acc_opacity + trans * bg[3]
        rgba = jnp.concatenate([rgb_out, alpha[:, None]], -1)
    return rgba, depth


def _tile_pixel_rays(
    sel: jnp.ndarray,  # [Tc] tile indices into the Wt×Ht tile grid
    Wt: int,
    tile: int,
    resolution,  # (Wp, Hp) padded full-res
    xform,
    focal,
    principal,
    distortion,
):
    """Member + center rays for the SELECTED tiles only, computed
    arithmetically from tile ids — no full-frame [H·W, 3] ray arrays (whose
    tile-major transpose alone cost ~0.9 s/frame at 1080p on TPU)."""
    Wp, Hp = resolution
    tx = (sel % Wt).astype(jnp.float32)
    ty = (sel // Wt).astype(jnp.float32)
    oy, ox = jnp.meshgrid(jnp.arange(tile, dtype=jnp.float32), jnp.arange(tile, dtype=jnp.float32), indexing="ij")
    px = tx[:, None] * tile + ox.reshape(-1)[None]  # [Tc, P]
    py = ty[:, None] * tile + oy.reshape(-1)[None]
    pix = jnp.stack([px, py], -1)
    res = jnp.asarray([Wp, Hp], jnp.float32)
    b = rays_lib.pixel_to_ray(pix, xform, focal, principal, res, distortion, None)
    # tile-center ray ≡ full-res ray through the tile's center pixel
    pix_c = jnp.stack([tx * tile + tile / 2 - 0.5, ty * tile + tile / 2 - 0.5], -1)
    bc = rays_lib.pixel_to_ray(pix_c, xform, focal, principal, res, distortion, None)
    return b.origins, b.directions, bc.origins, bc.directions


def _march_tile_chunk(
    coarse5: jnp.ndarray,
    fine_dil: jnp.ndarray,
    n_cascades: int,
    c_origins: jnp.ndarray,  # [Tc, 3]
    c_directions: jnp.ndarray,  # [Tc, 3]
    opts: RenderOptions,
    fine_undil: Optional[jnp.ndarray] = None,
):
    """March phase of the tiled renderer: one shared two-stage march per
    tile → (t, dt, valid [Tc,K], n [Tc]). ~27× cheaper than the eval phase,
    so it runs for every coarse-cull survivor and its ``n`` prunes the eval
    set exactly (a tile with n==0 is PROVABLY empty — the march fields are
    dilated conservatively for the tile frustum)."""
    aabb = coords.BoundingBox.from_aabb_scale(opts.aabb_scale)
    K_total = opts.k_samples * max(1, opts.n_windows)
    return march.march_tiles(
        c_origins, c_directions, coarse5, fine_dil,
        aabb.min, aabb.max, jnp.asarray(opts.cone_angle),
        n_cascades=n_cascades, t_start_min=NEAR_DISTANCE_RENDER,
        k_slots=K_total, n_candidates=opts.n_candidates,
        n_segments=max(32, K_total // 2),
        fine_undilated=fine_undil,
    )


def _eval_tile_chunk(
    model: NerfNetwork,
    params,
    origins: jnp.ndarray,  # [Tc, P, 3] member rays
    directions: jnp.ndarray,  # [Tc, P, 3]
    t_slots: jnp.ndarray,  # [Tc, K_total] shared tile march
    dt_slots: jnp.ndarray,
    slot_valid: jnp.ndarray,
    opts: RenderOptions,
    bg: jnp.ndarray,
    operators: tuple = (),
    envmap: Optional[jnp.ndarray] = None,
    extra: Optional[jnp.ndarray] = None,  # [E] per-frame extra dims
):
    """Eval phase: slab-wise field evaluation over the shared tile slots
    with front-to-back carry so saturated rays invalidate later slabs (the
    analog of the reference's 8-evals-between-compactions loop,
    testbed_nerf.cu:2827 — slabs instead of compaction rounds)."""
    aabb = coords.BoundingBox.from_aabb_scale(opts.aabb_scale)
    Tc, P = origins.shape[:2]
    # sub-slab width: eval_slab (≤ the march slab k_samples) — smaller
    # sub-slabs ride the faster small-batch gather regime and give the
    # front-to-back carry finer early-out granularity
    K_slab = max(1, min(opts.eval_slab or opts.k_samples, t_slots.shape[1]))
    # the caller may pass a TRUNCATED slot budget (phase-3 bucketing:
    # shallow tiles ship only the slots their march produced)
    n_slabs = max(1, -(-t_slots.shape[1] // K_slab))
    K_total = K_slab * n_slabs

    R = Tc * P
    o_flat = origins.reshape(R, 3)
    d_flat = directions.reshape(R, 3)
    tmin_r, tmax_r = aabb.ray_intersect(o_flat, d_flat)
    tmin_r = jnp.maximum(tmin_r, NEAR_DISTANCE_RENDER)
    ray_hit = tmin_r < tmax_r

    acc_rgb = jnp.zeros((R, 3))
    acc_opacity = jnp.zeros((R,))
    trans = jnp.ones((R,))
    depth = jnp.zeros((R,))
    n_used = jnp.zeros((R,), jnp.int32)
    samples = None
    for s in range(n_slabs):
        sl = slice(s * K_slab, (s + 1) * K_slab)
        t_r = jnp.broadcast_to(t_slots[:, None, sl], (Tc, P, K_slab)).reshape(R, K_slab)
        dt_r = jnp.broadcast_to(dt_slots[:, None, sl], (Tc, P, K_slab)).reshape(R, K_slab)
        v_r = jnp.broadcast_to(slot_valid[:, None, sl], (Tc, P, K_slab)).reshape(R, K_slab)
        live = ray_hit & (trans > opts.min_transmittance)
        v_r = v_r & (t_r >= tmin_r[:, None]) & (t_r < tmax_r[:, None]) & live[:, None]
        samples = march.SampleBatch(
            t=jnp.where(v_r, t_r, 0.0), dt=jnp.where(v_r, dt_r, 0.0),
            valid=v_r, n=jnp.sum(v_r.astype(jnp.int32), axis=1),
        )
        sigma, rgb_s = _eval_window(model, params, samples, o_flat, d_flat, opts, aabb, operators, extra)
        res = comp.composite(sigma, rgb_s, samples.dt, samples.t, samples.valid, opts.min_transmittance)
        acc_rgb = acc_rgb + trans[:, None] * res.rgb
        depth = jnp.where(acc_opacity > 0, depth, res.depth)
        acc_opacity = acc_opacity + trans * res.opacity
        trans = trans * res.transmittance
        n_used = n_used + res.n_used

    if opts.mode in (RenderMode.Depth, RenderMode.Distance):
        v = depth[:, None] * jnp.ones((1, 3))
        rgba = jnp.concatenate([v, acc_opacity[:, None]], -1)
    elif opts.mode == RenderMode.Cost:
        v = (n_used.astype(jnp.float32) / K_total)[:, None] * jnp.ones((1, 3))
        rgba = jnp.concatenate([v, jnp.ones_like(v[:, :1])], -1)
    elif opts.mode == RenderMode.AO:
        v = acc_opacity[:, None] * jnp.ones((1, 3))
        rgba = jnp.concatenate([v, acc_opacity[:, None]], -1)
    else:
        if envmap is not None:
            from nerfshop_tpu.ops import envmap as envmap_lib

            bg_ray = envmap_lib.sample_envmap(jnp.asarray(envmap), d_flat)
            rgb_out = acc_rgb + trans[:, None] * bg_ray[:, :3]
            alpha = acc_opacity + trans
        else:
            rgb_out = acc_rgb + trans[:, None] * bg[:3]
            alpha = acc_opacity + trans * bg[3]
        rgba = jnp.concatenate([rgb_out, alpha[:, None]], -1)
    return rgba.reshape(Tc, P, 4), depth.reshape(Tc, P)


#: render modes the tiled fast path supports; others fall back to per-ray
TILED_MODES = (
    RenderMode.Shade, RenderMode.Depth, RenderMode.Distance,
    RenderMode.AO, RenderMode.Cost,
)


def _make_tiled_fields_fn():
    @jax.jit
    def fields(occupancy, density):
        coarse5 = march.build_coarse_occupancy(occupancy, dilation=2).reshape(-1)
        masked = march.masked_density_field(occupancy, density)
        fine = march.dilate_field(masked, 2).reshape(-1)
        # undilated copy feeds the early-stop tau proxy (dilated values
        # overestimate optical depth for silhouette-grazing rays)
        return coarse5, fine, masked.reshape(-1)

    return fields


_TILED_FIELDS_FN = None
_TILED_FIELDS_CACHE: dict = {}
_CULL_FN_CACHE: dict = {}


def _pad_pow2_chunks(n: int, tc: int) -> int:
    """Smallest tc·2^k ≥ n — pads dynamic host-side selection lengths into a
    log-bounded family of static program shapes (a handful of compiles per
    resolution instead of one per frame)."""
    m = max(1, -(-n // tc))
    return tc * (1 << (m - 1).bit_length())


def _render_tiles_fused(
    model, params, grid, resolution, xform, focal, principal, distortion,
    opts: RenderOptions, operators: tuple, envmap, tile: int,
    bg: jnp.ndarray, op_kinds: tuple,
) -> FrameOutput:
    """Fused-phase tiled renderer: the same cull → shared-tile-march →
    bucketed-slab-eval pipeline as the multi-dispatch path below, but each
    phase is ONE AOT program with its chunk loop (``lax.map``), row gathers,
    and scatters INSIDE the executable. The multi-dispatch form made ~40
    device round-trips per 1080p frame (takes/concats/scatters/reshapes are
    each a dispatch when issued eagerly); at ~30 ms per round-trip through
    the serving relay that was ~70% of the frame time. Host syncs remain
    only where the host genuinely decides (cull mask → survivor list, march
    counts → bucket membership) — the analog of the reference's single
    alive-counter readback per compaction round (testbed_nerf.cu:2827)."""
    W, H = resolution
    Wt, Ht = -(-W // tile), -(-H // tile)
    Wp, Hp = Wt * tile, Ht * tile
    P = tile * tile
    n_tiles = Wt * Ht
    tc = max(1, opts.chunk // P)
    n_casc = grid.occupancy.shape[0]
    aabb = coords.BoundingBox.from_aabb_scale(opts.aabb_scale)
    K_total = opts.k_samples * max(1, opts.n_windows)

    # --- derived march fields, cached per grid (see render_frame_tiled)
    global _TILED_FIELDS_FN
    if _TILED_FIELDS_FN is None:
        _TILED_FIELDS_FN = _make_tiled_fields_fn()
    fkey = (id(grid.occupancy), id(grid.density))
    hit = _TILED_FIELDS_CACHE.get(fkey)
    if hit is not None and (hit[0] is not grid.occupancy or hit[1] is not grid.density):
        hit = None
    if hit is None:
        hit = _TILED_FIELDS_CACHE[fkey] = (
            grid.occupancy,
            grid.density,
            _TILED_FIELDS_FN(grid.occupancy, grid.density),
        )
        if len(_TILED_FIELDS_CACHE) > 4:
            _TILED_FIELDS_CACHE.pop(next(iter(_TILED_FIELDS_CACHE)))
    coarse5, fine_dil, fine_undil = hit[2]

    # --- phase 1: center rays + coarse cull, ONE program → bool mask
    ckey = ("fused-cull", Wt, Ht, tile, opts.aabb_scale, float(opts.cone_angle),
            opts.n_candidates, n_casc, distortion is not None)
    cull_fn = _CULL_FN_CACHE.get(ckey)
    if cull_fn is None:
        def _cull(xf, f, pp, dist, coarse5):
            b = rays_lib.rays_for_image((Wt, Ht), xf, f / tile, pp, dist, None)
            cell = float(2 ** (n_casc - 1)) / 128.0
            return march.coarse_any_hit(
                b.origins, b.directions, coarse5, aabb.min, aabb.max,
                jnp.asarray(opts.cone_angle), n_cascades=n_casc,
                t_start_min=NEAR_DISTANCE_RENDER,
                n_candidates=opts.n_candidates, intersect_margin=2 * cell,
            )

        cull_fn = _AotOnFirstCall(_cull)
        _CULL_FN_CACHE[ckey] = cull_fn
    occ_mask = np.asarray(cull_fn(xform, focal, principal, distortion, coarse5))
    if envmap is not None:
        occ_mask = np.ones_like(occ_mask)  # envmap bg varies per pixel
    sel0 = np.nonzero(occ_mask)[0]

    buckets = []  # (sel_ids [Sk] np, rgba [Sk,P,4], depth [Sk,P], n_valid)
    if len(sel0):
        # --- phase 2: shared tile march, ONE program (lax.map over chunks;
        # tile-center rays recomputed arithmetically inside from tile ids)
        S = _pad_pow2_chunks(len(sel0), tc)
        sel0_pad = np.concatenate([sel0, np.full(S - len(sel0), sel0[-1], sel0.dtype)])
        sel0_j = jnp.asarray(sel0_pad.astype(np.int32))
        mkey = (opts, tc, n_casc, Wt, Wp, Hp, tile, distortion is not None, S, "fused-march")
        march_fn = _CHUNK_FN_CACHE.get(mkey)
        if march_fn is None:
            def _mfn(coarse5, fine_dil, fine_undil, sel_pad, xf, f, pp, dist):
                def body(sel_c):
                    _, _, co_c, cd_c = _tile_pixel_rays(
                        sel_c, Wt, tile, (Wp, Hp), xf, f, pp, dist
                    )
                    return _march_tile_chunk(
                        coarse5, fine_dil, n_casc, co_c, cd_c, opts, fine_undil
                    )

                t, dt, v, n = jax.lax.map(body, sel_pad.reshape(-1, tc))
                Kt = t.shape[-1]
                return (t.reshape(S, Kt), dt.reshape(S, Kt),
                        v.reshape(S, Kt), n.reshape(S))

            march_fn = _AotOnFirstCall(_mfn)
            _chunk_cache_put(mkey, march_fn)
        t_all, dt_all, v_all, n_dev = march_fn(
            coarse5, fine_dil, fine_undil, sel0_j, xform, focal, principal, distortion
        )
        n_all = np.asarray(n_dev)
        if envmap is None:
            keep = np.nonzero(n_all[: len(sel0)] > 0)[0]
        else:
            keep = np.arange(len(sel0))

        # --- phase 3: field eval, ONE program per sample-count bucket (row
        # gathers from the march output + member-ray generation inside)
        # bucket granularity = eval_slab (16 by default): a tile whose march
        # produced n slots evaluates ceil(n/eval_slab) sub-slabs, not the
        # full 32/64 rounding of the old k_samples-granular buckets
        es = max(1, min(opts.eval_slab or opts.k_samples, K_total))
        slabs = [es * (w + 1) for w in range(-(-K_total // es))]
        n_keep = n_all[keep]
        lo = 0
        for bs in slabs:
            sub = keep[(n_keep > lo) & (n_keep <= bs)] if bs != slabs[-1] else keep[n_keep > lo]
            if bs == slabs[0] and envmap is not None:
                sub = keep[(n_keep <= bs)] if len(slabs) > 1 else keep
            lo = bs
            if not len(sub):
                continue
            Sk = _pad_pow2_chunks(len(sub), tc)
            sub_pad = np.concatenate([sub, np.full(Sk - len(sub), sub[-1], sub.dtype)])
            keep_j = jnp.asarray(sub_pad.astype(np.int32))
            ekey = (_model_key(model), opts, tc, P, op_kinds, envmap is not None, n_casc,
                    Wt, Wp, Hp, distortion is not None, "fused-eval", bs, S, Sk)
            eval_fn = _CHUNK_FN_CACHE.get(ekey)
            if eval_fn is None:
                def _efn(params, t_all, dt_all, v_all, sel_pad, keep_idx,
                         xf, f, pp, dist, bg, operators, envmap, _bs=bs, _Sk=Sk):
                    sel_ids = jnp.take(sel_pad, keep_idx, axis=0)
                    t_k = jnp.take(t_all, keep_idx, axis=0)[:, :_bs]
                    dt_k = jnp.take(dt_all, keep_idx, axis=0)[:, :_bs]
                    v_k = jnp.take(v_all, keep_idx, axis=0)[:, :_bs]

                    def body(args):
                        sel_c, t_c, dt_c, v_c = args
                        o, d, _, _ = _tile_pixel_rays(
                            sel_c, Wt, tile, (Wp, Hp), xf, f, pp, dist
                        )
                        return _eval_tile_chunk(
                            model, params, o, d, t_c, dt_c, v_c, opts, bg,
                            operators, envmap,
                        )

                    rgba_b, depth_b = jax.lax.map(
                        body,
                        (sel_ids.reshape(-1, tc), t_k.reshape(-1, tc, _bs),
                         dt_k.reshape(-1, tc, _bs), v_k.reshape(-1, tc, _bs)),
                    )
                    return rgba_b.reshape(_Sk, P, 4), depth_b.reshape(_Sk, P)

                eval_fn = _AotOnFirstCall(_efn)
                _chunk_cache_put(ekey, eval_fn)
            rgba_b, depth_b = eval_fn(
                params, t_all, dt_all, v_all, sel0_j, keep_j, xform, focal,
                principal, distortion, bg, operators, envmap,
            )
            buckets.append((sel0_pad[sub_pad], rgba_b, depth_b))

    # --- phase 4: assemble, ONE program (sky fill + scatters + de-tiling)
    akey = ("fused-assemble", Wt, Ht, tile, W, H,
            tuple(b[1].shape for b in buckets))
    asm_fn = _CHUNK_FN_CACHE.get(akey)
    if asm_fn is None:
        def _afn(bg, *parts):
            sky_rgba = jnp.concatenate([bg[:3], bg[3:4]])
            rgba = jnp.broadcast_to(sky_rgba, (n_tiles, P, 4))
            depth = jnp.zeros((n_tiles, P))
            for ids, r, d in zip(parts[0::3], parts[1::3], parts[2::3]):
                rgba = rgba.at[ids].set(r)
                depth = depth.at[ids].set(d)
            rgba = rgba.reshape(Ht, Wt, tile, tile, 4)
            rgba = rgba.transpose(0, 2, 1, 3, 4).reshape(Hp, Wp, 4)[:H, :W]
            depth = depth.reshape(Ht, Wt, tile, tile)
            depth = depth.transpose(0, 2, 1, 3).reshape(Hp, Wp)[:H, :W]
            return rgba, depth

        asm_fn = _AotOnFirstCall(_afn)
        _chunk_cache_put(akey, asm_fn)
    flat = []
    for ids, r, d in buckets:
        flat += [jnp.asarray(ids.astype(np.int32)), r, d]
    rgba, depth = asm_fn(bg, *flat)
    return FrameOutput(rgba, depth)


def render_frame_tiled(
    model: NerfNetwork,
    params,
    grid,
    resolution: Tuple[int, int],
    xform: jnp.ndarray,
    focal: jnp.ndarray,
    principal: jnp.ndarray = None,
    distortion: Optional[jnp.ndarray] = None,
    opts: RenderOptions = RenderOptions(),
    subpixel_jitter: Optional[jnp.ndarray] = None,
    operators: tuple = (),
    envmap: Optional[jnp.ndarray] = None,
    tile: int = 8,
) -> FrameOutput:
    """Tiled fast-path renderer: one shared march per ``tile``×``tile`` pixel
    block (conservative via field dilation sized to the tile frustum's world
    footprint), slab-wise evaluation. Falls back to :func:`render_frame` for
    modes that need per-sample machinery the tile path doesn't carry.

    The dilation radius (2 fine cells) covers the frustum footprint of an
    8×8-pixel tile at focal lengths ≥ ~0.6·H — for wider-angle/lower-res
    frames the footprint grows, so callers should shrink ``tile`` (the
    Testbed picks tile size from the focal length).
    """
    if opts.mode not in TILED_MODES or subpixel_jitter is not None:
        # (subpixel jitter needs per-pixel offsets the arithmetic tile ray
        # generator doesn't carry — spp accumulation uses the exact path)
        return render_frame(
            model, params, grid, resolution, xform, focal, principal,
            distortion, opts, subpixel_jitter, operators, envmap,
        )
    W, H = resolution
    principal = jnp.asarray([0.5, 0.5]) if principal is None else principal
    bg = jnp.asarray(opts.background, jnp.float32)
    operators = tuple(operators)
    op_kinds = tuple(type(op).__name__ for op in operators)
    # NOTE: brick-table prebuild injection (_prepare_render_params) helps
    # bake_volume 12x but REGRESSED the tiled eval 2.4x on v5e (gathers
    # from large argument buffers lose the fusion the in-program build
    # gets) — measured, so only the baker injects.
    Wt, Ht = -(-W // tile), -(-H // tile)
    Wp, Hp = Wt * tile, Ht * tile
    P = tile * tile
    n_tiles = Wt * Ht
    tc = max(1, opts.chunk // P)
    n_casc = grid.occupancy.shape[0]
    aabb = coords.BoundingBox.from_aabb_scale(opts.aabb_scale)
    K_total = opts.k_samples * max(1, opts.n_windows)

    # Default OFF: the fused-phase path measured 0.176 fps vs 0.651 fps for
    # the multi-dispatch path on the chip (judge A/B round 4, 5 stable frames
    # each, pixel-identical outputs) — the lax.map chunk loops serialize work
    # the independent dispatches overlap. Kept behind the env knob as a
    # recorded negative result; never flip without a committed steady-state
    # on-chip A/B.
    if os.environ.get("NERFSHOP_TILED_FUSED", "0") == "1":
        return _render_tiles_fused(
            model, params, grid, resolution, xform, focal, principal,
            distortion, opts, operators, envmap, tile, bg, op_kinds,
        )

    # --- phase 0: derived march fields, cached per grid. Entries hold
    # strong refs to the source arrays and hits verify identity (`is`):
    # id() alone can alias a new grid whose buffers reused a freed id.
    global _TILED_FIELDS_FN
    if _TILED_FIELDS_FN is None:
        _TILED_FIELDS_FN = _make_tiled_fields_fn()
    fkey = (id(grid.occupancy), id(grid.density))
    hit = _TILED_FIELDS_CACHE.get(fkey)
    if hit is not None and (hit[0] is not grid.occupancy or hit[1] is not grid.density):
        hit = None
    if hit is None:
        hit = _TILED_FIELDS_CACHE[fkey] = (
            grid.occupancy,
            grid.density,
            _TILED_FIELDS_FN(grid.occupancy, grid.density),
        )
        if len(_TILED_FIELDS_CACHE) > 4:
            _TILED_FIELDS_CACHE.pop(next(iter(_TILED_FIELDS_CACHE)))
    coarse5, fine_dil, fine_undil = hit[2]

    # --- phase 1: coarse cull over ALL tile centers (mini-frame rays)
    rkey = ("tiled-centers", Wt, Ht, tile, distortion is not None)
    center_fn = _RAYS_FN_CACHE.get(rkey)
    if center_fn is None:
        def _centers(xf, f, pp, dist):
            b = rays_lib.rays_for_image((Wt, Ht), xf, f / tile, pp, dist, None)
            return b.origins, b.directions

        center_fn = _AotOnFirstCall(_centers)
        _RAYS_FN_CACHE[rkey] = center_fn
    co, cd = center_fn(xform, focal, principal, distortion)

    ckey_cull = (opts.aabb_scale, float(opts.cone_angle), opts.n_candidates, n_casc)
    cull_fn = _CULL_FN_CACHE.get(ckey_cull)
    if cull_fn is None:
        def _cull(co, cd, coarse5):
            cell = float(2 ** (n_casc - 1)) / 128.0
            return march.coarse_any_hit(
                co, cd, coarse5, aabb.min, aabb.max, jnp.asarray(opts.cone_angle),
                n_cascades=n_casc, t_start_min=NEAR_DISTANCE_RENDER,
                n_candidates=opts.n_candidates, intersect_margin=2 * cell,
            )

        cull_fn = _AotOnFirstCall(_cull)
        _CULL_FN_CACHE[ckey_cull] = cull_fn
    occ_mask = np.asarray(cull_fn(co, cd, coarse5))
    if envmap is not None:
        # envmap background varies per pixel — don't cull those tiles
        occ_mask = np.ones_like(occ_mask)

    # same formula the eval path applies to a fully-transparent ray
    # (rgb = bg.rgb, alpha = bg.a — non-premultiplied), so culled and
    # evaluated sky tiles agree for any background alpha
    sky_rgba = jnp.concatenate([bg[:3], bg[3:4]])
    rgba = jnp.broadcast_to(sky_rgba, (n_tiles, P, 4))
    depth = jnp.zeros((n_tiles, P))
    sel0 = np.nonzero(occ_mask)[0]

    if len(sel0):
        # --- phase 2: shared tile march for cull survivors (~27× cheaper
        # than eval); its exact n==0 verdict prunes the eval set. ONE
        # dispatch over all survivors (pow2-padded shape family): the march
        # per tile is a few hundred narrow gathers, so at 1080p the old
        # tc-chunked loop was 22 dispatches whose ~30 ms relay overhead
        # dominated the whole phase (probe_render_phases r5: 689 ms march
        # wall, ≥600 ms of it dispatch)
        # march dispatch granularity: 0 = ONE dispatch over all survivors
        # (pow2-padded); else fixed-size chunks of N tiles. The relay adds
        # ~30 ms/dispatch but OVERLAPS independent dispatches, so the best
        # grain is measured, not derived (probe_render_ab sweeps this)
        # default 512: measured best at 1080p (r5 sweep: grain 512 = 0.642
        # fps vs one-dispatch 0.627 — the relay overlaps small dispatches
        # well enough that the single big march program loses)
        mgrain = int(os.environ.get("NERFSHOP_MARCH_CHUNK", "512"))
        if mgrain <= 0:
            S = _pad_pow2_chunks(len(sel0), tc)
            mkey = (opts, n_casc, S, "tile-march")
            march_fn = _CHUNK_FN_CACHE.get(mkey)
            if march_fn is None:
                def _mfn(coarse5, fine_dil, fine_undil, c_o, c_d):
                    return _march_tile_chunk(
                        coarse5, fine_dil, n_casc, c_o, c_d, opts, fine_undil
                    )

                march_fn = _AotOnFirstCall(_mfn)
                _chunk_cache_put(mkey, march_fn)

            sel0_pad = np.concatenate([sel0, np.full(S - len(sel0), sel0[-1], sel0.dtype)])
            sel0_j = jnp.asarray(sel0_pad)
            co_s, cd_s = jnp.take(co, sel0_j, axis=0), jnp.take(cd, sel0_j, axis=0)
            t_all, dt_all, v_all, n_dev = march_fn(coarse5, fine_dil, fine_undil, co_s, cd_s)
            n_all = np.asarray(n_dev)
        else:
            mkey = (opts, mgrain, n_casc, "tile-march")
            march_fn = _CHUNK_FN_CACHE.get(mkey)
            if march_fn is None:
                def _mfn(coarse5, fine_dil, fine_undil, c_o, c_d):
                    return _march_tile_chunk(
                        coarse5, fine_dil, n_casc, c_o, c_d, opts, fine_undil
                    )

                march_fn = _AotOnFirstCall(_mfn)
                _chunk_cache_put(mkey, march_fn)

            sel0_pad = np.concatenate(
                [sel0, np.full((-len(sel0)) % mgrain, sel0[-1], sel0.dtype)]
            )
            sel0_j = jnp.asarray(sel0_pad)
            co_s, cd_s = jnp.take(co, sel0_j, axis=0), jnp.take(cd, sel0_j, axis=0)
            parts = [
                march_fn(
                    coarse5, fine_dil, fine_undil,
                    co_s[i * mgrain : (i + 1) * mgrain],
                    cd_s[i * mgrain : (i + 1) * mgrain],
                )
                for i in range(len(sel0_pad) // mgrain)
            ]
            t_all = jnp.concatenate([p[0] for p in parts])
            dt_all = jnp.concatenate([p[1] for p in parts])
            v_all = jnp.concatenate([p[2] for p in parts])
            n_all = np.asarray(jnp.concatenate([p[3] for p in parts]))
        if envmap is None:
            keep = np.nonzero(n_all[: len(sel0)] > 0)[0]
        else:
            # every tile still composites the per-pixel envmap background
            keep = np.arange(len(sel0))
    else:
        keep = np.empty((0,), np.int64)

    if len(keep):
        # --- phase 3: field eval only for tiles with actual march samples,
        # BUCKETED by sample count: a tile whose march produced n slots only
        # needs the smallest ceil(n / k_samples) window slab (slots are
        # front-packed ascending), so shallow tiles — the majority once the
        # grid early-stop saturates — evaluate 32 slots instead of 64.
        # The n_all host sync already exists; bucketing costs nothing extra.
        def _eval_bucket(keep_b, bs):
            ekey = (_model_key(model), opts, tc, P, op_kinds, envmap is not None, n_casc,
                    Wt, Wp, Hp, distortion is not None, "tile-eval", bs)
            eval_fn = _CHUNK_FN_CACHE.get(ekey)
            if eval_fn is None:
                def _efn(params, sel_chunk, xf, f, pp, dist, t_c, dt_c, v_c, bg, operators, envmap):
                    o, d, _, _ = _tile_pixel_rays(sel_chunk, Wt, tile, (Wp, Hp), xf, f, pp, dist)
                    return _eval_tile_chunk(
                        model, params, o, d, t_c, dt_c, v_c, opts, bg, operators, envmap
                    )

                eval_fn = _AotOnFirstCall(_efn)
                _chunk_cache_put(ekey, eval_fn)

            keep_pad = np.concatenate(
                [keep_b, np.full((-len(keep_b)) % tc, keep_b[-1], keep_b.dtype)]
            )
            keep_j = jnp.asarray(keep_pad)
            sel1_j = jnp.asarray(sel0_pad)[keep_j]  # tile ids in the full grid
            t_s = jnp.take(t_all, keep_j, axis=0)[:, :bs]
            dt_s = jnp.take(dt_all, keep_j, axis=0)[:, :bs]
            v_s = jnp.take(v_all, keep_j, axis=0)[:, :bs]
            rgba_chunks, depth_chunks = [], []
            for i in range(len(keep_pad) // tc):
                s = slice(i * tc, (i + 1) * tc)
                rgba_c, depth_c = eval_fn(
                    params, sel1_j[s], xform, focal, principal, distortion,
                    t_s[s], dt_s[s], v_s[s], bg, operators, envmap,
                )
                rgba_chunks.append(rgba_c)
                depth_chunks.append(depth_c)
            return sel1_j, jnp.concatenate(rgba_chunks)[: len(keep_pad)], jnp.concatenate(
                depth_chunks
            )[: len(keep_pad)]

        # bucket granularity = eval_slab (16 by default): a tile whose march
        # produced n slots evaluates ceil(n/eval_slab) sub-slabs, not the
        # full 32/64 rounding of the old k_samples-granular buckets
        es = max(1, min(opts.eval_slab or opts.k_samples, K_total))
        slabs = [es * (w + 1) for w in range(-(-K_total // es))]
        n_keep = n_all[keep]
        lo = 0
        for bs in slabs:
            sub = keep[(n_keep > lo) & (n_keep <= bs)] if bs != slabs[-1] else keep[n_keep > lo]
            if bs == slabs[0] and envmap is not None:
                # envmap tiles with n == 0 still composite the background
                sub = keep[(n_keep <= bs)] if len(slabs) > 1 else keep
            lo = bs
            if not len(sub):
                continue
            sel1_j, rgba_b, depth_b = _eval_bucket(sub, bs)
            rgba = rgba.at[sel1_j].set(rgba_b)
            depth = depth.at[sel1_j].set(depth_b)

    rgba = rgba.reshape(Ht, Wt, tile, tile, 4)
    rgba = rgba.transpose(0, 2, 1, 3, 4).reshape(Hp, Wp, 4)[:H, :W]
    depth = depth.reshape(Ht, Wt, tile, tile)
    depth = depth.transpose(0, 2, 1, 3).reshape(Hp, Wp)[:H, :W]
    return FrameOutput(rgba, depth)


class _AotOnFirstCall:
    """jit wrapper that AOT-compiles on first invocation and then calls the
    Compiled executable directly. Plain jit dispatch (tracing-cache lookup,
    arg canonicalization, pytree checks in Python) costs ~10-20 ms per call
    on a 1-core host — a 1080p frame makes 40-250 chunk calls, so dispatch
    alone was multiple SECONDS of the exact path's frame time (the same fix
    baked.py:438-446 applies to its frame fn)."""

    def __init__(self, fn):
        self._jit = jax.jit(fn)
        self._compiled = {}

    def __call__(self, *args):
        leaves, treedef = jax.tree_util.tree_flatten(args)
        sig = (
            treedef,
            tuple(
                (getattr(l, "shape", ()), str(getattr(l, "dtype", type(l))))
                for l in leaves
            ),
        )
        compiled = self._compiled.get(sig)
        if compiled is None:
            compiled = self._compiled[sig] = self._jit.lower(*args).compile()
        return compiled(*args)


def _make_chunk_fn(model, opts: RenderOptions):
    """Compiled per-chunk program: rays [chunk] → rgba/depth. One dispatch
    per chunk keeps any single device program bounded (~1 s) — a whole-frame
    ``lax.map`` program at 1080p ran for minutes and tripped the TPU-worker
    watchdog."""

    def chunk_fn(params, grid, origins, dirs, bg, operators, envmap, extra=None):
        return _render_chunk(model, params, grid, origins, dirs, opts, bg, operators, envmap, extra)

    return _AotOnFirstCall(chunk_fn)


def _make_rays_fn(resolution, lens: str = "pinhole", aperture: float = 0.0, focus_z: float = 1.0):
    W, H = resolution

    def rays_fn(xform, focal, principal, distortion, subpixel_jitter, chunk, n_pad,
                ftheta_coeffs=None, dof_uv=None):
        bundle = rays_lib.rays_for_image(
            (W, H), xform, focal, principal, distortion, subpixel_jitter,
            lens=lens, ftheta_coeffs=ftheta_coeffs,
            aperture=aperture, focus_z=focus_z, dof_uv=dof_uv,
        )
        origins = jnp.concatenate([bundle.origins, jnp.zeros((n_pad, 3))])
        dirs = jnp.concatenate(
            [bundle.directions, jnp.ones((n_pad, 3)) * jnp.asarray([0.0, 0.0, 1.0])]
        )
        return origins.reshape(-1, chunk, 3), dirs.reshape(-1, chunk, 3)

    return jax.jit(rays_fn, static_argnames=("chunk", "n_pad"))


#: compiled-fn caches keyed by _model_key(model)/opts/shapes. Models are
#: plain dataclasses; they are immutable in practice.
_CHUNK_FN_CACHE: dict = {}
_RAYS_FN_CACHE: dict = {}
_BRICK_PREP_CACHE: dict = {}
_MODEL_REFS: dict = {}  # id -> model: strong refs so cached ids never alias


def _model_key(model) -> int:
    """id(model) made safe for cache keys: keep a strong reference so the id
    cannot be recycled by a new model while entries keyed on it are live; if
    an id HAS been reused (ref dropped by eviction), purge compiled fns that
    captured the dead model before handing the id out again."""
    k = id(model)
    prev = _MODEL_REFS.get(k)
    if prev is not model:
        if prev is not None:
            for kk in [x for x in _CHUNK_FN_CACHE if isinstance(x, tuple) and x and x[0] == k]:
                _CHUNK_FN_CACHE.pop(kk)
        _MODEL_REFS[k] = model
        while len(_MODEL_REFS) > 8:
            old = next(iter(_MODEL_REFS))
            if old == k:
                break
            _MODEL_REFS.pop(old)
            for kk in [x for x in _CHUNK_FN_CACHE if isinstance(x, tuple) and x and x[0] == old]:
                _CHUNK_FN_CACHE.pop(kk)
    return k


def _chunk_cache_put(key, fn):
    """Size-bounded insert: compiled executables pin device programs, so a
    long interactive session across resolutions/models must not accumulate
    them without end (the fields cache evicts at 4 for the same reason)."""
    _CHUNK_FN_CACHE[key] = fn
    while len(_CHUNK_FN_CACHE) > 64:
        _CHUNK_FN_CACHE.pop(next(iter(_CHUNK_FN_CACHE)))
    return fn


def _prepare_render_params(model, params):
    """Inject prebuilt brick tables for brick-layout hash grids: ONE
    roll+concat build per frame (cached while the table is unchanged)
    instead of one inside every chunk dispatch (~5 ms × 40+ chunks/frame
    at 1080p)."""
    enc = getattr(model, "pos_encoding", None)
    if enc is None or getattr(enc, "layout", None) != "brick":
        return params
    pe = params.get("pos_encoding") if isinstance(params, dict) else None
    if not isinstance(pe, dict) or "brick_tables" in pe or "table" not in pe:
        return params
    entry = _BRICK_PREP_CACHE.get(id(enc))
    table = pe["table"]
    if entry is None or entry[0] is not table:
        fn = entry[2] if entry is not None else jax.jit(enc.build_brick_tables)
        entry = (table, fn(table), fn)
        _BRICK_PREP_CACHE[id(enc)] = entry
        if len(_BRICK_PREP_CACHE) > 4:
            _BRICK_PREP_CACHE.pop(next(iter(_BRICK_PREP_CACHE)))
    pe = dict(pe)
    pe["brick_tables"] = entry[1]
    out = dict(params)
    out["pos_encoding"] = pe
    return out


def render_frame(
    model: NerfNetwork,
    params,
    grid,
    resolution: Tuple[int, int],  # (W, H)
    xform: jnp.ndarray,  # [3,4]
    focal: jnp.ndarray,  # [2] pixels
    principal: jnp.ndarray = None,  # [2] normalized
    distortion: Optional[jnp.ndarray] = None,
    opts: RenderOptions = RenderOptions(),
    subpixel_jitter: Optional[jnp.ndarray] = None,
    operators: tuple = (),
    envmap: Optional[jnp.ndarray] = None,
    lens: str = "pinhole",
    ftheta_coeffs: Optional[jnp.ndarray] = None,
    dof_uv: Optional[jnp.ndarray] = None,  # [H*W, 2] unit-disc lens samples
    extra_dims: Optional[jnp.ndarray] = None,  # [E] e.g. warped light dir
) -> FrameOutput:
    """Render one frame, chunked over pixels; compiled chunk programs are
    cached so arbitrary resolutions reuse the same executable.

    ``lens`` ∈ {'pinhole','ftheta','latlong'} selects the camera projection
    (reference pixel_to_ray lens modes, common_device.cuh:245)."""
    W, H = resolution
    principal = jnp.asarray([0.5, 0.5]) if principal is None else principal
    bg = jnp.asarray(opts.background, jnp.float32)
    operators = tuple(operators)
    op_kinds = tuple(type(op).__name__ for op in operators)

    n = W * H
    chunk = min(opts.chunk, n)
    n_pad = (-n) % chunk

    rkey = (W, H, distortion is not None, subpixel_jitter is not None, lens,
            opts.aperture, opts.focus_z, dof_uv is not None)
    rays_fn = _RAYS_FN_CACHE.get(rkey)
    if rays_fn is None:
        rays_fn = _make_rays_fn((W, H), lens, opts.aperture, opts.focus_z)
        _RAYS_FN_CACHE[rkey] = rays_fn
    fkw = {"ftheta_coeffs": jnp.asarray(ftheta_coeffs)} if lens == "ftheta" else {}
    if dof_uv is not None:
        fkw["dof_uv"] = dof_uv
    origins, dirs = rays_fn(xform, focal, principal, distortion, subpixel_jitter, chunk, n_pad, **fkw)

    ckey = (_model_key(model), opts, chunk, op_kinds, envmap is not None, extra_dims is not None)
    chunk_fn = _CHUNK_FN_CACHE.get(ckey)
    if chunk_fn is None:
        chunk_fn = _make_chunk_fn(model, opts)
        _chunk_cache_put(ckey, chunk_fn)

    rgba_chunks, depth_chunks = [], []
    for i in range((n + n_pad) // chunk):
        rgba_c, depth_c = chunk_fn(params, grid, origins[i], dirs[i], bg, operators, envmap, extra_dims)
        rgba_chunks.append(rgba_c)
        depth_chunks.append(depth_c)
    rgba = jnp.concatenate(rgba_chunks)[:n].reshape(H, W, 4)
    depth = jnp.concatenate(depth_chunks)[:n].reshape(H, W)
    return FrameOutput(rgba, depth)
