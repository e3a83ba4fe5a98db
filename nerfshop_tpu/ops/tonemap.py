"""Tonemapping + color-space curves (reference: render_buffer.h tonemap
kernels & common_device.cuh srgb helpers) as jit-safe jnp ops."""

from __future__ import annotations

import jax.numpy as jnp

from nerfshop_tpu.common import TonemapCurve


def srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x > 0.04045, ((x + 0.055) / 1.055) ** 2.4, x / 12.92)


def linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.maximum(x, 0.0)
    return jnp.where(x > 0.0031308, 1.055 * x ** (1.0 / 2.4) - 0.055, 12.92 * x)


def tonemap_aces(x: jnp.ndarray) -> jnp.ndarray:
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def _hable_partial(x):
    A, B, C, D, E, F = 0.15, 0.50, 0.20, 0.20, 0.02, 0.30
    return ((x * (A * x + C * B) + D * E) / (x * (A * x + B) + D * F)) - E / F


def tonemap_hable(x: jnp.ndarray) -> jnp.ndarray:
    exposure_bias = 2.0
    return jnp.clip(_hable_partial(x * exposure_bias) / _hable_partial(11.2), 0.0, 1.0)


def tonemap_reinhard(x: jnp.ndarray) -> jnp.ndarray:
    return x / (1.0 + x)


def apply_tonemap(x: jnp.ndarray, curve: TonemapCurve = TonemapCurve.Identity) -> jnp.ndarray:
    if curve == TonemapCurve.Identity:
        return x
    if curve == TonemapCurve.ACES:
        return tonemap_aces(x)
    if curve == TonemapCurve.Hable:
        return tonemap_hable(x)
    if curve == TonemapCurve.Reinhard:
        return tonemap_reinhard(x)
    raise ValueError(curve)
