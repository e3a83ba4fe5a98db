"""Environment map: trainable lat-long background radiance.

Reference: envmap.cuh (read_envmap/deposit_envmap_gradient — bilinear
lat-long lookup with wrap in phi, clamp in theta), trained as a
TrainableBuffer<4,2,float> with its own optimizer (src/testbed.cu:2427-2442)
and gradients deposited from rays that exit the scene
(src/testbed_nerf.cu:1961-1984).

TPU re-design: the envmap is just another parameter array [H, W, 4]; rays
that exit composite ``T_end · envmap(dir)`` and autodiff carries the
gradient — no bespoke deposit kernel. Lookups are N_rays-sized (not
N_samples), so the bilinear gather is cheap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def direction_to_latlong_uv(dirs: jnp.ndarray) -> jnp.ndarray:
    """Unit WORLD directions [N,3] → lat-long UV in [0,1]² (matches
    envmap.cuh: u from atan2 around the up axis, v from acos of z)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    u = (jnp.arctan2(y, x) / (2.0 * jnp.pi)) + 0.5
    v = jnp.arccos(jnp.clip(z, -1.0, 1.0)) / jnp.pi
    return jnp.stack([u, v], -1)


def sample_envmap(envmap: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear lat-long sample: envmap [H, W, 4], dirs [N,3] unit → [N,4].
    Phi wraps, theta clamps (envmap.cuh read_envmap)."""
    H, W = envmap.shape[:2]
    uv = direction_to_latlong_uv(dirs)
    fu = uv[..., 0] * W - 0.5
    fv = uv[..., 1] * H - 0.5
    u0 = jnp.floor(fu)
    v0 = jnp.floor(fv)
    du = (fu - u0)[..., None]
    dv = (fv - v0)[..., None]
    u0i = jnp.mod(u0.astype(jnp.int32), W)
    u1i = jnp.mod(u0i + 1, W)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 1)
    v1i = jnp.clip(v0i + 1, 0, H - 1)
    flat = envmap.reshape(H * W, 4)
    c00 = jnp.take(flat, v0i * W + u0i, axis=0)
    c01 = jnp.take(flat, v0i * W + u1i, axis=0)
    c10 = jnp.take(flat, v1i * W + u0i, axis=0)
    c11 = jnp.take(flat, v1i * W + u1i, axis=0)
    top = c00 * (1 - du) + c01 * du
    bot = c10 * (1 - du) + c11 * du
    return top * (1 - dv) + bot * dv


def create_envmap(resolution=(64, 128), init_value: float = 0.0) -> jnp.ndarray:
    """Fresh trainable envmap [H, W, 4] (rgb + unused alpha channel,
    matching the reference's 4-channel buffer)."""
    H, W = resolution
    return jnp.full((H, W, 4), init_value, jnp.float32)


def load_envmap(path: str) -> jnp.ndarray:
    """Load an EXR/LDR image as the envmap initialization."""
    from nerfshop_tpu.data import image_io

    img = np.asarray(image_io.read_image(path, linear=True), np.float32)
    if img.shape[-1] == 3:
        img = np.concatenate([img, np.ones_like(img[..., :1])], -1)
    return jnp.asarray(img)
