"""Volume compositing as differentiable tensor ops.

The reference composites sequentially per ray with early-out
(composite_kernel_nerf src/testbed_nerf.cu:698-979, and the forward pass of
compute_loss_kernel_train_nerf 1685+). On TPU the same math becomes a
cumulative sum along the sample axis:

    τ_i  = σ_i · dt_i                     (0 for masked slots)
    T_i  = exp(−Σ_{j<i} τ_j)              (transmittance before sample i)
    α_i  = 1 − exp(−τ_i)
    w_i  = T_i · α_i
    rgb  = Σ w_i rgb_i + T_end · background

Early-out parity: samples with T_i below ``min_transmittance`` contribute
zero weight (hard cutoff like the reference's loop break), implemented as a
mask so gradients also stop there. ``jax.grad`` through this reproduces the
hand-derived dL/d(rgbσ) of the CUDA loss kernel.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class CompositeResult(NamedTuple):
    rgb: jnp.ndarray  # [R, 3] composited radiance (before background)
    opacity: jnp.ndarray  # [R] = 1 − T_end
    transmittance: jnp.ndarray  # [R] T after the last sample (incl. cutoff)
    depth: jnp.ndarray  # [R] max-weight sample t (reference depth convention)
    weights: jnp.ndarray  # [R, K]
    n_used: jnp.ndarray  # [R] samples before the early-out cutoff


def composite(
    sigmas: jnp.ndarray,  # [R, K] activated density
    rgbs: jnp.ndarray,  # [R, K, 3] activated radiance
    dts: jnp.ndarray,  # [R, K]
    ts: jnp.ndarray,  # [R, K]
    valid: jnp.ndarray,  # [R, K] bool
    min_transmittance: float = 1e-4,
) -> CompositeResult:
    tau = jnp.where(valid, sigmas * dts, 0.0)
    cum = jnp.cumsum(tau, axis=-1)
    T_before = jnp.exp(-(cum - tau))  # exclusive
    alive = T_before >= min_transmittance  # reference breaks when T < eps
    alpha = 1.0 - jnp.exp(-tau)
    w = jnp.where(valid & alive, T_before * alpha, 0.0)

    rgb = jnp.einsum("rk,rkc->rc", w, rgbs)
    opacity = jnp.sum(w, axis=-1)
    T_end = 1.0 - opacity
    depth = jnp.take_along_axis(ts, jnp.argmax(w, axis=-1)[:, None], axis=-1)[:, 0]
    n_used = jnp.sum((valid & alive).astype(jnp.int32), axis=-1)
    return CompositeResult(rgb, opacity, T_end, depth, w, n_used)


def composite_with_background(
    result: CompositeResult, background: jnp.ndarray
) -> jnp.ndarray:
    """rgb over a [R,3] (or [3]) background color."""
    return result.rgb + result.transmittance[:, None] * background
