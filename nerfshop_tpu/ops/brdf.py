"""Disney ("principled") BRDF shading for the SDF renderer (S1 parity).

The reference shades sphere-trace hits with Burley's Disney BRDF
(evaluate_shading, src/testbed_sdf.cu:79-149: diffuse + subsurface approx +
GGX specular + sheen + clearcoat, ambient mixed by metallic). This is the
same published model (Burley 2012), written as vectorized JAX over [N] hits —
the whole shade is a handful of fused elementwise ops, ideal for the VPU.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclass
class BrdfParams:
    """Material + light knobs (reference: Testbed::m_brdf / m_sun_dir,
    testbed.h — same defaults)."""

    metallic: float = 0.0
    subsurface: float = 0.0
    specular: float = 1.0
    roughness: float = 0.5
    sheen: float = 0.0
    clearcoat: float = 0.0
    clearcoat_gloss: float = 1.0
    basecolor: Tuple[float, float, float] = (0.8, 0.8, 0.8)
    ambientcolor: Tuple[float, float, float] = (1.0, 1.0, 1.0)


def _schlick(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    return m ** 5


def _gtr1(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return (a2 - 1.0) / (jnp.pi * jnp.log(a2 + 1e-12) * t + 1e-12)


def _gtr2(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return a2 / (jnp.pi * t * t + 1e-12)


def _smith_ggx(ndotv, a):
    a2 = a * a
    b = ndotv * ndotv
    return 1.0 / (ndotv + jnp.sqrt(a2 + b - a2 * b) + 1e-12)


def disney_shade(
    base_color: jnp.ndarray,  # [N, 3]
    ambient_color: jnp.ndarray,  # [N, 3] or [3]
    light_color: jnp.ndarray,  # [3]
    p: BrdfParams,
    L: jnp.ndarray,  # [3] unit light dir
    V: jnp.ndarray,  # [N, 3] unit view dir (surface → eye)
    N: jnp.ndarray,  # [N, 3] unit normals
) -> jnp.ndarray:
    """Disney BRDF · NdotL · light + metallic-mixed ambient, per hit."""
    ndotl = jnp.sum(N * L, -1)
    ndotv = jnp.sum(N * V, -1)
    H = L + V
    H = H / (jnp.linalg.norm(H, axis=-1, keepdims=True) + 1e-12)
    ndoth = jnp.sum(N * H, -1)
    ldoth = jnp.sum(H * L, -1)

    fl, fv = _schlick(ndotl), _schlick(ndotv)
    amb = ambient_color * (0.2 + (fv - 0.2) * p.metallic)[..., None] * base_color

    # specular_tint / sheen_tint are fixed at 0 (the reference's call site,
    # testbed_sdf.cu:348, passes 0 for both)
    cspec0 = jnp.ones(3) * p.specular * 0.08 * (1.0 - p.metallic) + base_color * p.metallic

    fd90 = 0.5 + 2.0 * ldoth * ldoth * p.roughness
    fd = (1.0 + (fd90 - 1.0) * fl) * (1.0 + (fd90 - 1.0) * fv)

    fss90 = ldoth * ldoth * p.roughness
    fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
    ss = 1.25 * (fss * (1.0 / (ndotl + ndotv + 1e-12) - 0.5) + 0.5)

    a = jnp.maximum(0.001, p.roughness ** 2)
    ds = _gtr2(ndoth, a)
    fh = _schlick(ldoth)
    fs = cspec0 * (1.0 - fh[..., None]) + fh[..., None]
    gs = _smith_ggx(ndotl, a) * _smith_ggx(ndotv, a)

    fsheen = fh[..., None] * p.sheen * jnp.ones(3)

    dr = _gtr1(ndoth, 0.1 + (0.001 - 0.1) * p.clearcoat_gloss)
    fr = 0.04 + 0.96 * fh
    gr = _smith_ggx(ndotl, 0.25) * _smith_ggx(ndotv, 0.25)
    ccs = 0.25 * p.clearcoat * gr * fr * dr

    diffuse_mix = fd * (1.0 - p.subsurface) + ss * p.subsurface
    brdf = (
        (diffuse_mix[..., None] / jnp.pi * base_color + fsheen) * (1.0 - p.metallic)
        + (gs * ds)[..., None] * fs
        + ccs[..., None]
    )
    lit = brdf * light_color * jnp.maximum(ndotl, 0.0)[..., None] + amb
    # grazing/backfacing → ambient only (reference early-out NdotL/NdotV < 0)
    front = (ndotl > 0.0) & (ndotv > 0.0)
    return jnp.where(front[..., None], lit, amb)
