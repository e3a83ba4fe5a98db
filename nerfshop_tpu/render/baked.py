"""Baked dense-grid interactive renderer — the TPU-native fast frame path.

The reference reaches interactivity with per-sample CUDA network eval plus
DLSS upscaling and dynamic resolution (src/testbed.cu:1809-1827,
src/dlss.cu).  On a TPU the exact per-sample path is bound by random
hash-table gathers (~2.5e8 rows/s on v5e ⇒ ~1.5e7 field samples/s), which
caps any NGP-style sample-loop renderer far below interactive 1080p.  The
interactive path is therefore redesigned around dense ops only:

1. **Bake** (``bake_volume``): evaluate the (optionally edited) field once
   on a B³ voxel grid — σ and view-baked rgb, edits applied through the
   operator stack exactly like the per-sample renderer (map_samples /
   empty-mask / membrane residuals), so edited scenes bake-and-render at
   full interactive rate (the BASELINE ">15 fps 1080p edited-scene"
   target).  ~0.3-1.5 s once per scene/edit, reused across frames.

2. **Shear-warp frame loop** (``render_baked``, per frame): a
   Lacroute–Levoy style factorization of the view transform —

   * every volume slice along the view-major axis is projected through the
     eye onto a common *base plane*; for axis-aligned slices this
     projection is a per-slice uniform scale+shift, so the resampling is
     SEPARABLE and is evaluated as batched [Bi,B]×[B,B] matmuls on the
     MXU (hat-function interpolation matrices built on the fly);
   * front-to-back compositing is a cumulative-sum of optical depth over
     slices (VPU, dense); per-texel ray obliquity (sec θ) makes the
     quadrature exact for the perspective pencil through the eye;
   * ONE bilinear warp maps the composited base-plane image to screen
     pixels (the only gather in the whole frame: 2·H·W rows via the
     paired-row trick).

   No per-sample network eval, no hash gathers, no host sync in the loop.

Accuracy notes: the baked rgb freezes view-dependent shading at bake time
(direction toward ``camera_pos``); density is exact up to B³ sampling.
The exact per-sample renderer (render/renderer.py) remains the eval path —
``tests/test_baked.py`` gates baked-vs-exact PSNR on a synthetic scene.

Reference behaviors covered: interactive frame loop (testbed.cu:2044),
V7 dynamic resolution analog (fixed-cost frames), DLSS-analog upscale
(the final warp renders at native 1080p from a Bi² base raster).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.ops import coords
from nerfshop_tpu.render.renderer import FrameOutput


class BakedVolume(NamedTuple):
    """Dense field bake. ``fields[m]`` is the (rgb, σ) volume [B,B,B,4]
    bf16 pre-permuted so that world axis ``m`` is the slice axis (k, y, x)
    — the per-frame 3D relayout of a minor-dim-4 array costs ~100 ms on
    v5e (terrible lane tiling), so all three layouts are built once at
    bake time instead."""

    fields: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    aabb_lo: jnp.ndarray  # [3]
    aabb_hi: jnp.ndarray  # [3]
    camera_pos: Optional[jnp.ndarray] = None
    #: canonical [z,y,x,4] bf16 (rgb, σ) — kept so incremental ROI rebakes
    #: (update_volume_region) can patch a sub-box without re-evaluating the
    #: whole field
    canonical: Optional[jnp.ndarray] = None

    @property
    def resolution(self) -> int:
        return self.fields[0].shape[0]

    @property
    def sigma(self) -> jnp.ndarray:
        """[B,B,B] world-space density in the canonical [z,y,x] layout."""
        return self.fields[2][..., 3].astype(jnp.float32)

    @staticmethod
    def from_canonical(rgb, sigma, aabb_lo, aabb_hi, camera_pos=None) -> "BakedVolume":
        """Build from canonical [z,y,x] rgb [B,B,B,3] + σ [B,B,B] arrays."""

        @jax.jit
        def _pack_and_layouts(rgb, sigma):
            field = jnp.concatenate(
                [rgb.astype(jnp.bfloat16), sigma[..., None].astype(jnp.bfloat16)], -1
            )
            return field, _layouts_from_packed(field)

        canonical, fields = _pack_and_layouts(rgb, sigma)
        return BakedVolume(
            fields, jnp.asarray(aabb_lo), jnp.asarray(aabb_hi), camera_pos,
            canonical=canonical,
        )


#: bake row-evaluator cache, keyed (id(model), B, op_kinds, has_cam, rows).
#: params/operators/aabb/cam are TRACED args of ONE cached jitted fn —
#: closing over them (as a fresh per-call ``@jax.jit`` did in round 3) bakes
#: the edit-operator arrays (a cage TetLut is [res³, MT] + per-tet matrices,
#: 100+ MB) into the lowered HLO as dense constants, which overflowed the
#: remote-compile request limit on real hardware (BENCH_r03 `HTTP 413`).
#: Same discipline as renderer._render_chunk and train/distill.py:259-265;
#: tests/test_program_size.py gates the lowered program's constant footprint.
_BAKE_FN_CACHE: dict = {}
_OCC_MASK_FN_CACHE: dict = {}


def _get_bake_fn(model, B: int, op_kinds: tuple, has_cam: bool, rows: int):
    from nerfshop_tpu.render.renderer import _model_key

    key = (_model_key(model), B, op_kinds, has_cam, rows)
    fn = _BAKE_FN_CACHE.get(key)
    if fn is not None:
        return fn

    def eval_rows(params, operators, lo, hi, flo, fhi, cam, kk):
        # kk: [rows] slice indices along array axis 0 (world z); volume
        # layout [z, y, x]: array axis a holds world axis (2 − a)
        g = (jnp.arange(B, dtype=jnp.float32) + 0.5) / B
        zz, yy, xx = jnp.meshgrid((kk + 0.5) / B, g, g, indexing="ij")
        pos = jnp.stack(
            [lo[0] + xx * (hi[0] - lo[0]),
             lo[1] + yy * (hi[1] - lo[1]),
             lo[2] + zz * (hi[2] - lo[2])],
            -1,
        ).reshape(-1, 3)  # world xyz
        if has_cam:
            d = pos - cam
            dirs = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
        else:
            dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), pos.shape)
        resid_sigma = resid_out = resid_rgb = None
        empty = None
        pos0 = pos
        if op_kinds:
            from nerfshop_tpu.editing import operators as op_lib

            pos, dirs, empty, resid_sigma, resid_out, resid_rgb = (
                op_lib.map_samples_through_stack_full(list(operators), pos, dirs)
            )
        # lo/hi define the SAMPLE lattice (possibly a tight occupied-content
        # box); flo/fhi is the FIELD box the network was trained against —
        # warping by the sample box would feed the model wrong coordinates
        bbox = coords.BoundingBox(flo, fhi)
        pw = jnp.clip(coords.warp_position(pos, bbox), 0.0, 1.0)
        dw = coords.warp_direction(dirs)
        rgb, sigma = model(params, pw, dw)
        if empty is not None:
            sigma = jnp.where(empty, 0.0, sigma)
        if resid_sigma is not None:
            # reference 'target' membrane blend (testbed_nerf.cu:770-805);
            # the σ-ratio is the dt→0 limit of the α-ratio; empty wins
            on = (resid_out > 1e-9) & ~empty
            tgt_w = jnp.clip(coords.warp_position(pos0, bbox), 0.0, 1.0)
            sigma_tgt = model.density(params, tgt_w)
            sigma_new = jnp.minimum(jnp.maximum(sigma_tgt, sigma), sigma + resid_sigma)
            den = sigma + resid_out
            w_n = jnp.where(den > 1e-9, sigma / jnp.maximum(den, 1e-9), 1.0)
            rgb_mix = w_n[:, None] * rgb + (1.0 - w_n)[:, None] * resid_rgb
            sigma = jnp.where(on, sigma_new, sigma)
            rgb = jnp.clip(jnp.where(on[:, None], rgb_mix, rgb), 0.0, None)
        return rgb.reshape(rows, B, B, 3), sigma.reshape(rows, B, B)

    fn = jax.jit(eval_rows)
    _BAKE_FN_CACHE[key] = fn
    return fn


def bake_volume(
    model,
    params,
    aabb: coords.BoundingBox,
    resolution: int = 256,
    operators: tuple = (),
    camera_pos: Optional[jnp.ndarray] = None,
    occupancy: Optional[jnp.ndarray] = None,
    chunk: int = 1 << 18,
    field_aabb: Optional[coords.BoundingBox] = None,
) -> BakedVolume:
    """Evaluate the field on a dense grid (σ + rgb), edits applied.

    ``occupancy``: optional [C,128,128,128] grid — σ is zeroed outside
    occupied cells so vanished/empty space stays empty in the bake (the
    same masking the march applies per sample).

    ``field_aabb``: the box the network warps against (training aabb) when
    ``aabb`` is a TIGHT content box — baking a whole aabb-4 scene box at
    256³ gives the subject ~64³ effective cells (measured 5.5 dB
    baked-vs-exact on fox); a tight box restores the bake's resolution.
    """
    from nerfshop_tpu.render.renderer import _prepare_render_params

    params = _prepare_render_params(model, params)
    B = resolution
    lo = jnp.asarray(aabb.min, jnp.float32)
    hi = jnp.asarray(aabb.max, jnp.float32)
    operators = tuple(operators)
    op_kinds = tuple(type(op).__name__ for op in operators)
    has_cam = camera_pos is not None
    cam = jnp.zeros((3,), jnp.float32) if not has_cam else jnp.asarray(camera_pos, jnp.float32)

    fb = field_aabb if field_aabb is not None else aabb
    flo = jnp.asarray(fb.min, jnp.float32)
    fhi = jnp.asarray(fb.max, jnp.float32)
    rows = max(1, min(B, chunk // (B * B)))
    fn = _get_bake_fn(model, B, op_kinds, has_cam, rows)
    rgbs, sigs = [], []
    for k0 in range(0, B, rows):
        n_live = min(rows, B - k0)
        # fixed [rows] shape (pad with the last slice, sliced off below) so
        # every chunk reuses ONE compiled executable
        kk = jnp.minimum(
            jnp.arange(k0, k0 + rows, dtype=jnp.float32), jnp.float32(B - 1)
        )
        r, s = fn(params, operators, lo, hi, flo, fhi, cam, kk)
        rgbs.append(r[:n_live])
        sigs.append(s[:n_live])
    rgb = jnp.concatenate(rgbs).astype(jnp.bfloat16)
    sigma = jnp.concatenate(sigs)

    if occupancy is not None:
        sigma = sigma * _occupancy_mask(occupancy, aabb, B)

    return BakedVolume.from_canonical(rgb, sigma, lo, hi, cam if has_cam else None)


def _occupancy_mask(occupancy: jnp.ndarray, aabb: coords.BoundingBox, B: int) -> jnp.ndarray:
    """[C,R,R,R] bitfield → [B,B,B] {0,1} mask at bake resolution (each bake
    cell reads its position's finest covering cascade, like the march)."""
    n_casc = occupancy.shape[0]
    key = (B, n_casc)
    fn = _OCC_MASK_FN_CACHE.get(key)
    if fn is None:
        def _mask(occupancy, lo, hi):
            from nerfshop_tpu.ops import march as march_lib

            g = (jnp.arange(B, dtype=jnp.float32) + 0.5) / B
            zz, yy, xx = jnp.meshgrid(g, g, g, indexing="ij")
            pos = jnp.stack(
                [lo[0] + xx * (hi[0] - lo[0]), lo[1] + yy * (hi[1] - lo[1]),
                 lo[2] + zz * (hi[2] - lo[2])],
                -1,
            ).reshape(-1, 3)
            dt = jnp.full((pos.shape[0],), 0.0)
            flat = march_lib._candidate_cells(
                pos, jnp.zeros_like(pos), jnp.zeros((pos.shape[0], 1)), dt[:, None], n_casc
            )
            occ = jnp.take(occupancy.reshape(-1).astype(jnp.float32), flat[:, 0], axis=0)
            # pos already absolute: _candidate_cells expects origin+T*dir;
            # T=0 keeps pos
            return occ.reshape(B, B, B)

        fn = _OCC_MASK_FN_CACHE[key] = jax.jit(_mask)
    lo = jnp.asarray(aabb.min, jnp.float32)
    hi = jnp.asarray(aabb.max, jnp.float32)
    return fn(occupancy, lo, hi)


_ROI_FN_CACHE: dict = {}


def _roi_dims(roi_lo, roi_hi, aabb: coords.BoundingBox, B: int, pad_cells: int = 2):
    """World ROI box → (start index [3], bucketed dims (Z, Y, X)).

    Dims are padded to multiples of 32 (min 32) so a dragged cage reuses
    ONE compiled program while it stays in the same size bucket (pow2
    buckets jumped an 81-cell cage ROI to 128 — 2.2× extra field evals, a
    third of the measured 4.2 s rebake); starts are clamped so the padded
    box fits inside the grid."""
    lo = np.asarray(aabb.min, np.float32)
    hi = np.asarray(aabb.max, np.float32)
    scale = B / (hi - lo)
    i0 = np.floor((np.asarray(roi_lo) - lo) * scale).astype(np.int64) - pad_cells
    i1 = np.ceil((np.asarray(roi_hi) - lo) * scale).astype(np.int64) + pad_cells
    i0 = np.clip(i0, 0, B)
    i1 = np.clip(i1, 0, B)
    dims = []
    for a in range(3):
        n = max(1, int(i1[a] - i0[a]))
        m = min(B, max(32, -(-n // 32) * 32))
        dims.append(m)
    # world (x, y, z) extents → array dims (Z, Y, X); clamp starts for pad
    start = np.minimum(i0, B - np.asarray([dims[0], dims[1], dims[2]]))
    start = np.maximum(start, 0)
    return start, (dims[2], dims[1], dims[0])


def update_volume_region(
    prev: BakedVolume,
    model,
    params,
    aabb: coords.BoundingBox,
    roi_lo,
    roi_hi,
    operators: tuple = (),
    camera_pos: Optional[jnp.ndarray] = None,
    occupancy: Optional[jnp.ndarray] = None,
    field_aabb: Optional[coords.BoundingBox] = None,
) -> BakedVolume:
    """Incremental rebake: re-evaluate the field ONLY inside the world-space
    box [roi_lo, roi_hi] (the union of what the changed operators can touch,
    editing/operators.operator_roi_aabb), patch it into the previous bake's
    canonical volume, and rebuild the three shear-warp layouts.

    The reference pays a per-drag tet-grid rebuild + 50-iteration density
    refresh over the SAME local region (src/testbed.cu:1266, tet_mesh.cu:369);
    round 4's full 256³ re-eval cost 14.5 s per drag — the ROI sub-box is
    typically 64³-ish, ~60× fewer field evals (VERDICT r4 ask #5)."""
    from nerfshop_tpu.render.renderer import _prepare_render_params

    assert prev.canonical is not None, "previous bake lacks canonical storage"
    params = _prepare_render_params(model, params)
    B = prev.resolution
    start, (Z, Y, X) = _roi_dims(roi_lo, roi_hi, aabb, B)
    operators = tuple(operators)
    op_kinds = tuple(type(op).__name__ for op in operators)
    has_cam = camera_pos is not None
    cam = jnp.zeros((3,), jnp.float32) if not has_cam else jnp.asarray(camera_pos, jnp.float32)
    has_occ = occupancy is not None
    n_casc = occupancy.shape[0] if has_occ else 0

    from nerfshop_tpu.render.renderer import _model_key

    key = (_model_key(model), B, Z, Y, X, op_kinds, has_cam, has_occ, n_casc)
    fn = _ROI_FN_CACHE.get(key)
    if fn is None:
        def _update(canonical, f0, f1, f2, params, operators, lo, hi, flo, fhi, cam, start_zyx, occupancy):
            # start_zyx: [3] int32 array start indices (z, y, x)
            gz = (start_zyx[0] + jnp.arange(Z, dtype=jnp.float32) + 0.5) / B
            gy = (start_zyx[1] + jnp.arange(Y, dtype=jnp.float32) + 0.5) / B
            gx = (start_zyx[2] + jnp.arange(X, dtype=jnp.float32) + 0.5) / B
            zz, yy, xx = jnp.meshgrid(gz, gy, gx, indexing="ij")
            pos = jnp.stack(
                [lo[0] + xx * (hi[0] - lo[0]),
                 lo[1] + yy * (hi[1] - lo[1]),
                 lo[2] + zz * (hi[2] - lo[2])],
                -1,
            ).reshape(-1, 3)
            if has_cam:
                d = pos - cam
                dirs = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
            else:
                dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), pos.shape)
            pos0 = pos
            empty = resid_sigma = resid_out = resid_rgb = None
            if op_kinds:
                from nerfshop_tpu.editing import operators as op_lib

                pos, dirs, empty, resid_sigma, resid_out, resid_rgb = (
                    op_lib.map_samples_through_stack_full(list(operators), pos, dirs)
                )
            bbox = coords.BoundingBox(flo, fhi)  # field box, not sample box
            pw = jnp.clip(coords.warp_position(pos, bbox), 0.0, 1.0)
            dw = coords.warp_direction(dirs)
            rgb, sigma = model(params, pw, dw)
            if empty is not None:
                sigma = jnp.where(empty, 0.0, sigma)
            if resid_sigma is not None:
                on = (resid_out > 1e-9) & ~empty
                tgt_w = jnp.clip(coords.warp_position(pos0, bbox), 0.0, 1.0)
                sigma_tgt = model.density(params, tgt_w)
                sigma_new = jnp.minimum(jnp.maximum(sigma_tgt, sigma), sigma + resid_sigma)
                den = sigma + resid_out
                w_n = jnp.where(den > 1e-9, sigma / jnp.maximum(den, 1e-9), 1.0)
                rgb_mix = w_n[:, None] * rgb + (1.0 - w_n)[:, None] * resid_rgb
                sigma = jnp.where(on, sigma_new, sigma)
                rgb = jnp.clip(jnp.where(on[:, None], rgb_mix, rgb), 0.0, None)
            if has_occ:
                from nerfshop_tpu.ops import march as march_lib

                flat = march_lib._candidate_cells(
                    pos0, jnp.zeros_like(pos0), jnp.zeros((pos0.shape[0], 1)),
                    jnp.zeros((pos0.shape[0], 1)), n_casc,
                )
                occ = jnp.take(
                    occupancy.reshape(-1).astype(jnp.float32), flat[:, 0], axis=0
                )
                sigma = sigma * occ
            patch = jnp.concatenate(
                [rgb.reshape(Z, Y, X, 3).astype(jnp.bfloat16),
                 sigma.reshape(Z, Y, X, 1).astype(jnp.bfloat16)],
                -1,
            )
            canonical = jax.lax.dynamic_update_slice(
                canonical, patch,
                (start_zyx[0], start_zyx[1], start_zyx[2], jnp.int32(0)),
            )
            # patch the three shear-warp layouts IN PLACE with the
            # transposed patch — a full-volume relayout (3 × 256³×4 bf16
            # transposes) was ~a third of the measured 4.2 s rebake
            fields = []
            for m, f in enumerate((f0, f1, f2)):
                t = tuple(2 - a for a in _AXIS_PERMS[m])
                tp = jnp.transpose(patch, t + (3,))
                st = tuple(start_zyx[a] for a in t) + (jnp.int32(0),)
                fields.append(jax.lax.dynamic_update_slice(f, tp, st))
            return canonical, tuple(fields)

        # donate the previous bake's buffers: the update is a true in-place
        # patch (callers replace their BakedVolume with the result)
        fn = _ROI_FN_CACHE[key] = jax.jit(_update, donate_argnums=(0, 1, 2, 3))
        if len(_ROI_FN_CACHE) > 16:
            _ROI_FN_CACHE.pop(next(iter(_ROI_FN_CACHE)))

    lo = jnp.asarray(aabb.min, jnp.float32)
    hi = jnp.asarray(aabb.max, jnp.float32)
    fb = field_aabb if field_aabb is not None else aabb
    flo = jnp.asarray(fb.min, jnp.float32)
    fhi = jnp.asarray(fb.max, jnp.float32)
    occ_arg = occupancy if has_occ else jnp.zeros((0,), jnp.float32)
    canonical, fields = fn(
        prev.canonical, prev.fields[0], prev.fields[1], prev.fields[2],
        params, operators, lo, hi, flo, fhi, cam,
        jnp.asarray(start[::-1].copy(), jnp.int32), occ_arg,
    )
    return BakedVolume(
        fields, prev.aabb_lo, prev.aabb_hi,
        cam if has_cam else prev.camera_pos, canonical=canonical,
    )


# ---------------------------------------------------------------------------
# Frame rendering
# ---------------------------------------------------------------------------


_AXIS_PERMS = {
    # major world axis → (transpose perm putting that axis first as k, with
    # remaining axes as (y, x)); channels stay last
    0: (0, 1, 2),
    1: (1, 0, 2),
    2: (2, 0, 1),
}


def _layouts_from_packed(field):
    """Canonical [z,y,x,4] packed field → the three per-major-axis layouts
    (traced helper; see BakedVolume.fields docstring)."""
    return tuple(
        jnp.transpose(
            field,
            (2 - _AXIS_PERMS[m][0], 2 - _AXIS_PERMS[m][1], 2 - _AXIS_PERMS[m][2], 3),
        )
        for m in range(3)
    )


def _frame_impl(
    field,  # [B,B,B,4] bf16 (rgb, σ), axes already permuted to (k, y, x)
    e,  # [3] eye in index coords (k, y, x), permuted/flipped
    corners,  # [4, 3] index-space directions of the image corner rays (k,y,x)
    dirs_kyx,  # [H, W, 3] per-pixel ray directions in index space (k, y, x)
    sky,  # [4]
    cell_world,  # [] world units per index step (isotropic cubic aabb)
    B: int,
    Bi: int,
    n_group: int,
    H: int,
    W: int,
    flip: bool = False,  # view k ascends opposite to storage k: remap the
    # pass-1 row base instead of reversing the volume (no relayout)
    with_depth: bool = True,
):
    f32 = jnp.float32
    z0 = 0.5  # base plane: first slice's center
    ez, ey, ex = e[0], e[1], e[2]

    # frustum footprint on the base plane (through the 4 corner rays)
    tz = (z0 - ez) / jnp.where(jnp.abs(corners[:, 0]) < 1e-6, 1e-6, corners[:, 0])
    hit_y = ey + tz * corners[:, 1]
    hit_x = ex + tz * corners[:, 2]
    valid_c = tz > 0
    big = jnp.float32(4 * B)
    by0 = jnp.min(jnp.where(valid_c, hit_y, big))
    by1 = jnp.max(jnp.where(valid_c, hit_y, -big))
    bx0 = jnp.min(jnp.where(valid_c, hit_x, big))
    bx1 = jnp.max(jnp.where(valid_c, hit_x, -big))
    # clamp to the projection hull: content �− its projection through the
    # eye onto z0 lies within hull(e_xy, [0,B])
    by0 = jnp.clip(by0, jnp.minimum(ey, 0.0), jnp.maximum(ey, f32(B)))
    by1 = jnp.clip(by1, jnp.minimum(ey, 0.0), jnp.maximum(ey, f32(B)))
    bx0 = jnp.clip(bx0, jnp.minimum(ex, 0.0), jnp.maximum(ex, f32(B)))
    bx1 = jnp.clip(bx1, jnp.minimum(ex, 0.0), jnp.maximum(ex, f32(B)))
    by1 = jnp.maximum(by1, by0 + 1e-3)
    bx1 = jnp.maximum(bx1, bx0 + 1e-3)

    ii = jnp.arange(Bi, dtype=f32)
    base_y = by0 + (ii + 0.5) * (by1 - by0) / Bi  # [Bi]
    base_x = bx0 + (ii + 0.5) * (bx1 - bx0) / Bi

    # per-texel ray obliquity: ray = (base_pt − e); sec = |ray| / |ray_k|
    dby = base_y[:, None] - ey  # [Bi,1]
    dbx = base_x[None, :] - ex  # [1,Bi]
    dz0 = z0 - ez
    sec = jnp.sqrt(dby * dby + dbx * dbx + dz0 * dz0) / jnp.abs(dz0)  # [Bi,Bi]
    dt_w = cell_world * sec  # world path length per slice

    kk = jnp.arange(B, dtype=f32) + 0.5
    s_all = (z0 - ez) / (kk - ez)  # per-slice projection scale
    front = (kk - ez) > 1e-3  # slices in front of the eye
    # inverse map: base coord → slice coord  q = e + (base − e)/s
    inv_s = jnp.where(front, 1.0 / jnp.where(jnp.abs(s_all) < 1e-6, 1e-6, s_all), 0.0)

    # Per-slice source coordinates depend only on (k, base index) — the
    # separable resample is TWO flat row-gathers with k-only indices (a
    # batched-matmul formulation measured ~500× off MXU peak on v5e, while
    # monotone wide-row takes run at memory speed).
    def src_and_weights(base_coords, e_ax):  # [Bi] → idx0 [B,Bi], frac, valid
        src = (base_coords[None, :] - e_ax) * inv_s[:, None] + e_ax  # [B, Bi]
        src = src - 0.5  # cell-center grid
        q0 = jnp.floor(src)
        frac = (src - q0).astype(jnp.bfloat16)
        q0i = jnp.clip(q0.astype(jnp.int32), 0, B - 2)
        valid = (src >= 0.0) & (src <= f32(B - 1))
        return q0i, frac, valid

    # field layout is [k, y, x, c]; pass 1 resamples Y (row unit = (k, y),
    # row content = [x, c] contiguous), pass 2 resamples X after a
    # transpose. Indices broadcast over the row content.
    y0i, fy_, vy = src_and_weights(base_y, ey)
    x0i, fx_, vx = src_and_weights(base_x, ex)

    flat1 = field.reshape(B * B, B * 4)
    karr = jnp.arange(B, dtype=jnp.int32)
    if flip:
        karr = B - 1 - karr
    rows_a = (karr[:, None] * B + y0i).reshape(-1)
    ra0 = jnp.take(flat1, rows_a, axis=0)
    ra1 = jnp.take(flat1, rows_a + 1, axis=0)
    fy_b = fy_.reshape(-1, 1)
    vy_b = vy.reshape(-1, 1)
    out1 = jnp.where(vy_b, ra0 * (1 - fy_b) + ra1 * fy_b, 0)  # [B*Bi, B*4] bf16
    out1 = out1.reshape(B, Bi, B, 4).transpose(0, 2, 1, 3)  # [k, x, y', c]

    flat2 = out1.reshape(B * B, Bi * 4)
    rows_b = (jnp.arange(B, dtype=jnp.int32)[:, None] * B + x0i).reshape(-1)
    rb0 = jnp.take(flat2, rows_b, axis=0)
    rb1 = jnp.take(flat2, rows_b + 1, axis=0)
    fx_b = fx_.reshape(-1, 1)
    vx_b = vx.reshape(-1, 1)
    out2 = jnp.where(vx_b, rb0 * (1 - fx_b) + rb1 * fx_b, 0)
    r2 = out2.reshape(B, Bi, Bi, 4)  # [k, x', y', (rgb, σ)] bf16 — a full
    # f32 copy here materializes 1 GB + a layout flip; keep bf16 and lift
    # only σ to f32 for the optical-depth accumulation

    # ---- composite over slices (note base raster is [x', y']) -------------
    dt_map = dt_w.T  # sec/dt were built [y', x'] — transpose to [x', y']
    tau = jax.nn.relu(r2[..., 3].astype(f32)) * dt_map[None] * front[:, None, None].astype(f32)
    ctau = jnp.cumsum(tau, axis=0)
    wgt = jnp.exp(-(ctau - tau)) * (1.0 - jnp.exp(-tau))  # [B, Bi, Bi]
    acc = jnp.sum(wgt[..., None] * r2[..., :3].astype(f32), axis=0)  # [Bi, Bi, 3]
    T = jnp.exp(-ctau[-1])
    if with_depth:
        tk = (kk - ez)[:, None, None] * sec.T[None] * cell_world
        depth_acc = jnp.sum(wgt * tk, axis=0)
    else:
        depth_acc = jnp.zeros((Bi, Bi), f32)

    base = jnp.concatenate([acc, 1.0 - T[..., None], depth_acc[..., None]], -1)  # [Bi(x'),Bi(y'),5]

    # ---- final warp: screen → base raster, bilinear via paired rows -------
    dk = dirs_kyx[..., 0]
    t_hit = (z0 - ez) / jnp.where(jnp.abs(dk) < 1e-6, 1e-6, dk)
    hy = ey + t_hit * dirs_kyx[..., 1]
    hx = ex + t_hit * dirs_kyx[..., 2]
    gy = (hy - by0) / (by1 - by0) * Bi - 0.5
    gx = (hx - bx0) / (bx1 - bx0) * Bi - 0.5
    ok = (t_hit > 0) & (gy > -1.0) & (gy < Bi) & (gx > -1.0) & (gx < Bi)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, Bi - 2)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, Bi - 2)
    fy = jnp.clip(gy - y0, 0.0, 1.0)[..., None]
    fx = jnp.clip(gx - x0, 0.0, 1.0)[..., None]
    # pack all 4 bilinear taps into ONE row so the warp costs a single
    # 2M-row gather (gather cost on v5e is row-count-bound ~8e7 rows/s —
    # two takes here were 54 ms of the frame)
    shift_y = jnp.roll(base, -1, axis=1)
    shift_x = jnp.roll(base, -1, axis=0)
    shift_xy = jnp.roll(shift_x, -1, axis=1)
    pack = jnp.concatenate([base, shift_y, shift_x, shift_xy], -1).astype(jnp.bfloat16)
    pack = jax.lax.optimization_barrier(pack.reshape(Bi * Bi, 20))
    i0 = (x0 * Bi + y0).reshape(-1)
    r = jnp.take(pack, i0, axis=0).reshape(H, W, 20).astype(f32)
    left = r[..., 0:5] * (1 - fy) + r[..., 5:10] * fy  # x0 column, y-lerped
    right = r[..., 10:15] * (1 - fy) + r[..., 15:20] * fy  # x0+1 column
    out = left * (1 - fx) + right * fx  # [H,W,5]
    rgb = out[..., :3]
    alpha = out[..., 3]
    depth = out[..., 4] / jnp.maximum(alpha, 1e-6)
    rgb = jnp.where(ok[..., None], rgb, 0.0)
    alpha = jnp.where(ok, alpha, 0.0)
    rgba = jnp.concatenate(
        [rgb + (1.0 - alpha[..., None]) * sky[:3], (alpha + (1.0 - alpha) * sky[3])[..., None]],
        -1,
    )
    return rgba, jnp.where(ok, depth, 0.0)


_FRAME_FN_CACHE: dict = {}


def render_baked(
    vol: BakedVolume,
    resolution: Tuple[int, int],  # (W, H)
    xform: jnp.ndarray,  # [3,4] camera-to-world
    focal: jnp.ndarray,  # [2] pixels
    principal: Optional[jnp.ndarray] = None,
    background: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0),
    base_resolution: int = 512,
    slice_group: int = 32,
    with_depth: bool = True,
) -> FrameOutput:
    """Render one frame from a baked volume (shear-warp, all-dense)."""
    W, H = resolution
    B = vol.resolution
    Bi = base_resolution
    principal = np.asarray([0.5, 0.5], np.float32) if principal is None else principal

    # all camera math stays in numpy: pulling a jnp scalar to host costs a
    # full tunnel round-trip (~30 ms) in the serving setup
    xform = np.asarray(xform, np.float32)
    fwd = xform[:, 2]
    major = int(np.argmax(np.abs(fwd)))
    flip = bool(fwd[major] < 0)

    key = (B, Bi, W, H, major, flip, slice_group, with_depth)
    fn = _FRAME_FN_CACHE.get(key)
    if fn is None:
        perm = _AXIS_PERMS[major]

        @jax.jit
        def frame(fld, lo, hi, cam20):
            # ONE packed host→device transfer per frame: [3,4] xform,
            # focal, principal, sky (each DevicePut through the serving
            # tunnel costs ~10 ms — separate puts dominated the frame)
            xform = cam20[:12].reshape(3, 4)
            focal = cam20[12:14]
            principal = cam20[14:16]
            sky = cam20[16:20]
            # world → index coords: idx_axis a = (p[a]−lo[a])/(hi−lo)[a]·B
            scale = B / (hi - lo)
            eye_w = xform[:, 3]
            e_idx = (eye_w - lo) * scale  # [3] in (x,y,z) world order
            # per-pixel directions in camera, then world, then index space
            uu = (jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5 - principal[0] * W) / focal[0]
            vv = (jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5 - principal[1] * H) / focal[1]
            d_cam = jnp.stack(
                [jnp.broadcast_to(uu, (H, W)), jnp.broadcast_to(vv, (H, W)), jnp.ones((H, W))],
                -1,
            )
            d_w = jnp.einsum("ij,hwj->hwi", xform[:, :3], d_cam)
            d_idx = d_w * scale  # anisotropic allowed
            cu = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
            cc = (cu * jnp.asarray([W, H], jnp.float32) - principal * jnp.asarray([W, H])) / focal
            c_cam = jnp.concatenate([cc, jnp.ones((4, 1))], -1)
            c_idx = jnp.einsum("ij,cj->ci", xform[:, :3], c_cam) * scale

            # world axes → (k, y, x); the volume arrives pre-permuted for
            # this major axis (vol.fields[major]); k-flip is an index remap
            # inside _frame_impl, not an array reversal
            p = perm
            e_kyx = jnp.stack([e_idx[p[0]], e_idx[p[1]], e_idx[p[2]]])
            d_kyx = jnp.stack(
                [d_idx[..., p[0]], d_idx[..., p[1]], d_idx[..., p[2]]], -1
            )
            c_kyx = jnp.stack([c_idx[:, p[0]], c_idx[:, p[1]], c_idx[:, p[2]]], -1)
            if flip:
                e_kyx = e_kyx.at[0].set(B - e_kyx[0])
                d_kyx = d_kyx.at[..., 0].multiply(-1.0)
                c_kyx = c_kyx.at[:, 0].multiply(-1.0)
            cell_world = (hi[0] - lo[0]) / B  # cubic ngp aabb
            return _frame_impl(
                fld, e_kyx, c_kyx, d_kyx, sky, cell_world,
                B, Bi, slice_group, H, W, flip=flip, with_depth=with_depth,
            )

        # AOT-compile: plain jit dispatch (pytree flatten + arg checks in
        # Python) costs ~tens of ms per call on a 1-core host — the
        # compiled executable is called with positional buffers directly
        fn = frame.lower(
            jax.ShapeDtypeStruct(vol.fields[major].shape, vol.fields[major].dtype),
            jax.ShapeDtypeStruct((3,), jnp.float32),
            jax.ShapeDtypeStruct((3,), jnp.float32),
            jax.ShapeDtypeStruct((20,), jnp.float32),
        ).compile()
        _FRAME_FN_CACHE[key] = fn

    cam20 = np.concatenate(
        [
            np.asarray(xform, np.float32).reshape(-1),
            np.asarray(focal, np.float32).reshape(-1),
            np.asarray(principal, np.float32).reshape(-1),
            np.asarray(background, np.float32).reshape(-1),
        ]
    )
    rgba, depth = fn(vol.fields[major], vol.aabb_lo, vol.aabb_hi, jnp.asarray(cam20))
    return FrameOutput(rgba, depth)
