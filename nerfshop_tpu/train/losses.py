"""Per-channel photometric losses (same math as the reference's
loss_and_gradient zoo, src/testbed_nerf.cu:103-171 & 1626-1641).

These are plain differentiable functions — the analytic gradients the CUDA
kernels hand-derive come for free from ``jax.grad``. Reduction is left to the
caller (the NeRF loss averages over rays, not samples).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-2


def l2(target, pred):
    d = pred - target
    return d * d


def relative_l2(target, pred):
    d = pred - target
    # the reference treats the normalizer as constant w.r.t. the gradient
    factor = 1.0 / (jnp.square(jax.lax.stop_gradient(pred)) + _EPS)
    return d * d * factor


def l1(target, pred):
    return jnp.abs(pred - target)


def huber(target, pred, alpha: float = 0.1):
    """Reference divides by 5 so the quadratic region matches L2 (see the
    comment at testbed_nerf.cu:1631)."""
    d = pred - target
    ad = jnp.abs(d)
    return jnp.where(ad > alpha, ad - 0.5 * alpha, 0.5 / alpha * d * d) / 5.0


def log_l1(target, pred):
    return jnp.log(jnp.abs(pred - target) + 1.0)


def smape(target, pred):
    d = jnp.abs(pred - target)
    factor = 1.0 / jax.lax.stop_gradient(0.5 * (jnp.abs(pred) + jnp.abs(target)) + _EPS)
    return d * factor


def mape(target, pred):
    d = jnp.abs(pred - target)
    factor = 1.0 / jax.lax.stop_gradient(jnp.abs(pred) + _EPS)
    return d * factor


LOSSES = {
    "L2": l2,
    "RelativeL2": relative_l2,
    "L1": l1,
    "Huber": huber,
    "LogL1": log_l1,
    "Smape": smape,
    "Mape": mape,
}


def build_loss(cfg: dict):
    return LOSSES[cfg.get("otype", "L2")]
