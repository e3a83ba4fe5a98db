"""Camera ray generation: pinhole + lens distortion + DoF + subpixel jitter.

Parity surface: the reference's ``pixel_to_ray`` (common_device.cuh:245) —
pinhole projection with principal point, iterative radial/tangential
undistortion (k1 k2 p1 p2), f-theta fisheye and latlong (equirectangular)
lenses, depth-of-field sampling, subpixel jitter for progressive spp
accumulation, and rolling-shutter / motion-blur pose interpolation
(testbed_nerf.cu:1087 ray time = rs.x + rs.y·u + rs.z·v + rs.w·ξ).

All functions are batched over pixels and jit-safe.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfshop_tpu.ops.coords import BoundingBox


class RayBundle(NamedTuple):
    origins: jnp.ndarray  # [..., 3] world space (ngp convention)
    directions: jnp.ndarray  # [..., 3] unit length


def _apply_distortion(uv: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Forward Brown–Conrady distortion of normalized camera coords."""
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    x, y = uv[..., 0], uv[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * k2)
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y)
    return jnp.stack([xd, yd], -1)


def iterative_undistort(uv: jnp.ndarray, dist: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Invert the distortion by fixed-point iteration (same approach as the
    reference's iterative_camera_undistortion)."""

    def body(_, cur):
        d = _apply_distortion(cur, dist) - cur
        return uv - d

    return jax.lax.fori_loop(0, iters, body, uv)


def pixel_to_ray(
    pixel_xy: jnp.ndarray,  # [..., 2] float pixel coords (x=col, y=row)
    xform: jnp.ndarray,  # [3, 4] camera-to-world
    focal: jnp.ndarray,  # [2]
    principal: jnp.ndarray,  # [2] normalized
    resolution: jnp.ndarray,  # [2] (W, H)
    distortion: Optional[jnp.ndarray] = None,  # [4]
    subpixel_jitter: Optional[jnp.ndarray] = None,  # [..., 2] in [0,1)
    aperture: float = 0.0,
    focus_z: float = 1.0,
    dof_uv: Optional[jnp.ndarray] = None,  # [..., 2] unit-disc samples
    snap_to_center: bool = True,
) -> RayBundle:
    """Camera ray through a pixel. Convention matches the reference: camera
    looks down +z in its local frame with y flipped (image y grows down)."""
    offset = subpixel_jitter if subpixel_jitter is not None else (0.5 if snap_to_center else 0.0)
    xy = pixel_xy + offset
    uv = (xy - principal * resolution) / focal  # normalized camera coords
    if distortion is not None:
        uv = iterative_undistort(uv, distortion)

    d_cam = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], -1)  # [...,3]
    rot = xform[:, :3]
    origin = jnp.broadcast_to(xform[:, 3], d_cam.shape)
    direction = jnp.einsum("ij,...j->...i", rot, d_cam)

    if aperture > 0.0 and dof_uv is not None:
        # shift origin on the lens disc, re-aim at the focal plane
        focus_point = origin + direction * focus_z
        lens = dof_uv * aperture  # [...,2]
        shift = rot[:, 0] * lens[..., :1] + rot[:, 1] * lens[..., 1:2]
        origin = origin + shift
        direction = focus_point - origin

    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    return RayBundle(origin, direction)


def latlong_to_dir(uv: jnp.ndarray) -> jnp.ndarray:
    """Equirectangular pixel UV ∈ [0,1]² → camera-local direction.

    Convention matches the reference's latlong_to_dir (common_device.cuh):
    v is latitude (y up at v=1), u is longitude with u=0.5 looking down +z.
    """
    theta = (uv[..., 1] - 0.5) * jnp.pi
    phi = (uv[..., 0] - 0.5) * (2.0 * jnp.pi)
    ct = jnp.cos(theta)
    return jnp.stack([jnp.sin(phi) * ct, jnp.sin(theta), jnp.cos(phi) * ct], -1)


def dir_to_latlong(d: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`latlong_to_dir` → UV ∈ [0,1]²."""
    theta = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 0], d[..., 2])
    return jnp.stack([phi / (2.0 * jnp.pi) + 0.5, theta / jnp.pi + 0.5], -1)


def latlong_ray(
    pixel_xy: jnp.ndarray,  # [..., 2]
    xform: jnp.ndarray,  # [3, 4]
    resolution: jnp.ndarray,  # [2] (W, H)
    subpixel_jitter: Optional[jnp.ndarray] = None,
) -> RayBundle:
    """360° panorama rays (reference lens Latlong, common_device.cuh)."""
    offset = subpixel_jitter if subpixel_jitter is not None else 0.5
    uv = (pixel_xy + offset) / resolution
    d_cam = latlong_to_dir(uv)
    rot = xform[:, :3]
    direction = jnp.einsum("ij,...j->...i", rot, d_cam)
    origin = jnp.broadcast_to(xform[:, 3], direction.shape)
    return RayBundle(origin, direction)


def ftheta_ray(
    pixel_xy: jnp.ndarray,  # [..., 2]
    xform: jnp.ndarray,  # [3, 4]
    principal: jnp.ndarray,  # [2] normalized
    resolution: jnp.ndarray,  # [2] (W, H)
    ftheta_coeffs: jnp.ndarray,  # [5] polynomial p0..p4: θ(r) in radians
    subpixel_jitter: Optional[jnp.ndarray] = None,
) -> RayBundle:
    """Fisheye f-theta lens: image radius r (pixels from the principal
    point) maps to polar angle θ = Σᵢ pᵢ rⁱ; azimuth is preserved.
    Mirrors the reference's f_theta_undistortion (common_device.cuh) used
    by pixel_to_ray when the lens mode is FTheta. Rays whose θ exceeds π
    are aimed backwards and should be masked by the caller if undesired."""
    offset = subpixel_jitter if subpixel_jitter is not None else 0.5
    xy = pixel_xy + offset - principal * resolution  # pixels from center
    r = jnp.sqrt(jnp.sum(xy * xy, axis=-1) + 1e-12)
    theta = (
        ftheta_coeffs[0]
        + r * (ftheta_coeffs[1] + r * (ftheta_coeffs[2] + r * (ftheta_coeffs[3] + r * ftheta_coeffs[4])))
    )
    st, ct = jnp.sin(theta), jnp.cos(theta)
    # camera looks down +z; azimuth from pixel offset (image y grows down)
    d_cam = jnp.stack([xy[..., 0] / r * st, xy[..., 1] / r * st, ct], -1)
    rot = xform[:, :3]
    direction = jnp.einsum("ij,...j->...i", rot, d_cam)
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    origin = jnp.broadcast_to(xform[:, 3], direction.shape)
    return RayBundle(origin, direction)


def pose_lerp(xf_start: jnp.ndarray, xf_end: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Per-element lerp of [..., 3, 4] camera matrices at times t ∈ [0,1]
    (the reference's rolling-shutter camera interpolation — it lerps the
    matrix directly rather than slerping, testbed_nerf.cu:1127)."""
    t = t[..., None, None]
    return xf_start * (1.0 - t) + xf_end * t


def shutter_times(
    rng: jax.Array,
    pix: jnp.ndarray,  # [N, 2] pixel coords
    resolution: jnp.ndarray,  # [2] (W, H)
    rolling_shutter: jnp.ndarray,  # [4] (offset, du, dv, motion-blur jitter)
) -> jnp.ndarray:
    """Per-ray normalized exposure time: rs.x + rs.y·u + rs.z·v + rs.w·ξ
    (reference generate_training_samples_nerf, testbed_nerf.cu:1124)."""
    uv = pix / resolution
    xi = jax.random.uniform(rng, pix.shape[:-1])
    return (
        rolling_shutter[0]
        + rolling_shutter[1] * uv[..., 0]
        + rolling_shutter[2] * uv[..., 1]
        + rolling_shutter[3] * xi
    )


def rays_for_image(
    resolution: Tuple[int, int],  # (W, H)
    xform: jnp.ndarray,
    focal: jnp.ndarray,
    principal: jnp.ndarray,
    distortion: Optional[jnp.ndarray] = None,
    subpixel_jitter: Optional[jnp.ndarray] = None,
    lens: str = "pinhole",
    ftheta_coeffs: Optional[jnp.ndarray] = None,
    aperture: float = 0.0,
    focus_z: float = 1.0,
    dof_uv: Optional[jnp.ndarray] = None,  # [H*W, 2] unit-disc samples
) -> RayBundle:
    """All pixels of an image, row-major → origins/directions [H*W, 3].

    ``lens`` selects the projection: 'pinhole' (default, with optional
    Brown–Conrady distortion), 'ftheta' (fisheye polynomial, needs
    ``ftheta_coeffs``), or 'latlong' (equirectangular panorama).
    ``aperture``/``focus_z``/``dof_uv`` enable depth-of-field sampling
    (pinhole lens only)."""
    W, H = resolution
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)
    res = jnp.asarray([W, H], jnp.float32)
    if lens == "latlong":
        return latlong_ray(pix, xform, res, subpixel_jitter)
    if lens == "ftheta":
        if ftheta_coeffs is None:
            raise ValueError("lens='ftheta' requires ftheta_coeffs [5]")
        return ftheta_ray(pix, xform, principal, res, jnp.asarray(ftheta_coeffs), subpixel_jitter)
    return pixel_to_ray(pix, xform, focal, principal, res, distortion, subpixel_jitter,
                        aperture=aperture, focus_z=focus_z, dof_uv=dof_uv)


def rodrigues(rotvec: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] axis-angle → [..., 3, 3] rotation matrices (exp map).

    Written on the UNnormalized vector with smooth sin/cos coefficient
    functions so gradients are finite at θ=0 (where the optimizer starts)."""
    vx, vy, vz = rotvec[..., 0], rotvec[..., 1], rotvec[..., 2]
    zero = jnp.zeros_like(vx)
    K = jnp.stack(
        [jnp.stack([zero, -vz, vy], -1), jnp.stack([vz, zero, -vx], -1), jnp.stack([-vy, vx, zero], -1)],
        -2,
    )
    t2 = jnp.sum(rotvec * rotvec, axis=-1)[..., None, None]
    small = t2 < 1e-8
    t = jnp.sqrt(jnp.where(small, 1.0, t2))  # safe sqrt (grad-finite)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)  # sin θ / θ
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / jnp.where(small, 1.0, t2))
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + a * K + b * (K @ K)


def apply_pose_delta(xform: jnp.ndarray, rot_delta: jnp.ndarray, trans_delta: jnp.ndarray) -> jnp.ndarray:
    """Refine a [..., 3, 4] camera-to-world by a learnable axis-angle rotation
    + translation (the autodiff analog of the reference's per-camera
    extrinsics optimization, testbed_nerf.cu:2341/3833)."""
    R = rodrigues(rot_delta)
    rot = R @ xform[..., :3, :3]
    t = xform[..., :3, 3] + trans_delta
    return jnp.concatenate([rot, t[..., None]], axis=-1)


def sample_training_pixels(
    rng: jax.Array,
    n_rays: int,
    images: jnp.ndarray,  # [N, H, W, 4]
    error_map: Optional[jnp.ndarray] = None,  # [N, h, w]
):
    """Pick (image, pixel) pairs — uniform or error-map-importance
    (reference T7: 2D error CDF per image). → (img_idx, pix[x,y] float,
    targets [n,4])."""
    N, H, W = images.shape[:3]
    k_img, k_pix, k_err = jax.random.split(rng, 3)
    img_idx = jax.random.randint(k_img, (n_rays,), 0, N)
    if error_map is not None:
        eh, ew = error_map.shape[1:]
        flat = error_map[img_idx].reshape(n_rays, eh * ew)
        cell = jax.random.categorical(k_err, jnp.log(flat + 1e-8), axis=-1)
        cy, cx = cell // ew, cell % ew
        jit = jax.random.uniform(k_pix, (n_rays, 2))
        px = jnp.floor((cx + jit[:, 0]) / ew * W)
        py = jnp.floor((cy + jit[:, 1]) / eh * H)
        pix = jnp.stack([px, py], -1)
    else:
        pix = jnp.floor(jax.random.uniform(k_pix, (n_rays, 2)) * jnp.asarray([W, H], jnp.float32))
    pix = jnp.clip(pix, 0, jnp.asarray([W - 1, H - 1], jnp.float32))
    ipix = pix.astype(jnp.int32)
    targets = images[img_idx, ipix[:, 1], ipix[:, 0]]
    return img_idx, pix, targets


def rays_from_pixels(
    img_idx: jnp.ndarray,
    pix: jnp.ndarray,
    xforms: jnp.ndarray,
    focals: jnp.ndarray,
    principals: jnp.ndarray,
    resolution: jnp.ndarray,  # [2] (W, H)
    distortions: Optional[jnp.ndarray] = None,
    camera_params: Optional[dict] = None,
    xforms_end: Optional[jnp.ndarray] = None,  # [N, 3, 4] end-of-exposure pose
    rolling_shutter: Optional[jnp.ndarray] = None,  # [4]
    rng: Optional[jax.Array] = None,  # motion-blur jitter source
) -> RayBundle:
    """Differentiable ray construction, optionally through learnable pose
    deltas {'rot':[N,3],'trans':[N,3]} — gradients flow from sample
    positions back to the per-image camera parameters.

    With camera_params['distortion_map'] ([Hd, Wd, 2]), a learnable
    screen-space direction offset is bilinearly sampled at the pixel UV —
    the TPU analog of the reference's TrainableBuffer<2,2> distortion grid
    (src/testbed.cu:2407-2425, applied in pixel_to_ray).

    With ``xforms_end``/``rolling_shutter``, each ray's camera pose is
    lerped between the start/end-of-exposure matrices at its shutter time
    (reference testbed_nerf.cu:1124: rolling shutter + motion blur)."""
    xf = xforms[img_idx]
    if xforms_end is not None and rolling_shutter is not None:
        t = shutter_times(
            rng if rng is not None else jax.random.PRNGKey(0),
            pix, resolution, rolling_shutter,
        )
        xf = pose_lerp(xf, xforms_end[img_idx], t)
    if camera_params is not None:
        xf = apply_pose_delta(xf, camera_params["rot"][img_idx], camera_params["trans"][img_idx])
    dist = distortions[img_idx] if distortions is not None else None

    dmap_offset = None
    if camera_params is not None and "distortion_map" in camera_params:
        dm = camera_params["distortion_map"]  # [Hd, Wd, 2]
        Hd, Wd = dm.shape[:2]
        uv = pix / resolution  # [N, 2] in [0,1]
        fu = uv[:, 0] * Wd - 0.5
        fv = uv[:, 1] * Hd - 0.5
        u0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, Wd - 1)
        v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, Hd - 1)
        u1 = jnp.clip(u0 + 1, 0, Wd - 1)
        v1 = jnp.clip(v0 + 1, 0, Hd - 1)
        du = jnp.clip(fu - u0, 0, 1)[:, None]
        dv = jnp.clip(fv - v0, 0, 1)[:, None]
        dmap_offset = (
            dm[v0, u0] * (1 - du) * (1 - dv)
            + dm[v0, u1] * du * (1 - dv)
            + dm[v1, u0] * (1 - du) * dv
            + dm[v1, u1] * du * dv
        )  # [N, 2]

    if dmap_offset is not None:
        # offset the normalized image-plane coordinate before ray generation
        pix = pix + dmap_offset * resolution

    if dist is not None:
        o, d = jax.vmap(
            lambda p, x, f, pp, dd: pixel_to_ray(p, x, f, pp, resolution, dd)
        )(pix, xf, focals[img_idx], principals[img_idx], dist)
    else:
        o, d = jax.vmap(
            lambda p, x, f, pp: pixel_to_ray(p, x, f, pp, resolution)
        )(pix, xf, focals[img_idx], principals[img_idx])
    return RayBundle(o, d)


def sample_training_rays(
    rng: jax.Array,
    n_rays: int,
    images: jnp.ndarray,  # [N, H, W, 4]
    xforms: jnp.ndarray,  # [N, 3, 4]
    focals: jnp.ndarray,  # [N, 2]
    principals: jnp.ndarray,  # [N, 2]
    distortions: Optional[jnp.ndarray] = None,  # [N, 4]
    image_pmf: Optional[jnp.ndarray] = None,  # [N] image-selection CDF weights
    error_map: Optional[jnp.ndarray] = None,  # [N, h, w] error-importance map
) -> Tuple[RayBundle, jnp.ndarray, jnp.ndarray]:
    """Random (image, pixel) pairs → rays + target rgba.

    Mirrors generate_training_samples_nerf's ray setup
    (src/testbed_nerf.cu:1087-1253): uniform image pick (or pmf), uniform
    pixel pick (or 2D error-map CDF), snap to pixel centers.
    Returns (rays [n_rays], rgba targets [n_rays, 4], image indices).
    """
    N, H, W = images.shape[:3]
    k_img, k_pix, k_err = jax.random.split(rng, 3)
    if image_pmf is not None:
        img_idx = jax.random.categorical(k_img, jnp.log(image_pmf + 1e-12), shape=(n_rays,))
    else:
        img_idx = jax.random.randint(k_img, (n_rays,), 0, N)

    if error_map is not None:
        eh, ew = error_map.shape[1:]
        flat = error_map[img_idx].reshape(n_rays, eh * ew) + 1e-8
        cell = jax.random.categorical(k_err, jnp.log(flat), axis=-1)
        cy, cx = cell // ew, cell % ew
        jit = jax.random.uniform(k_pix, (n_rays, 2))
        px = jnp.floor((cx + jit[:, 0]) / ew * W)
        py = jnp.floor((cy + jit[:, 1]) / eh * H)
        pix = jnp.stack([px, py], -1)
    else:
        pix = jnp.floor(
            jax.random.uniform(k_pix, (n_rays, 2)) * jnp.asarray([W, H], jnp.float32)
        )
    pix = jnp.clip(pix, 0, jnp.asarray([W - 1, H - 1], jnp.float32))
    ipix = pix.astype(jnp.int32)

    targets = images[img_idx, ipix[:, 1], ipix[:, 0]]  # [n_rays, 4]

    res = jnp.asarray([W, H], jnp.float32)
    dist = distortions[img_idx] if distortions is not None else None

    def one_ray(p, xf, f, pp, d):
        dd = d if dist is not None else None
        rb = pixel_to_ray(p, xf, f, pp, res, dd)
        return rb.origins, rb.directions

    if dist is not None:
        o, d = jax.vmap(one_ray)(pix, xforms[img_idx], focals[img_idx], principals[img_idx], dist)
    else:
        o, d = jax.vmap(lambda p, xf, f, pp: one_ray(p, xf, f, pp, None))(
            pix, xforms[img_idx], focals[img_idx], principals[img_idx]
        )
    return RayBundle(o, d), targets, img_idx
