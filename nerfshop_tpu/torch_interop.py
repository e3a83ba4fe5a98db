"""Torch-facing density module (pyngp parity, P1/P2).

The reference exposes ``NerfNetworkModule`` through pybind
(src/python_api.cu: fwd_density / bwd_density / bwd_bwd_input_density /
n_density_output_dims) and wraps it in ``torch.autograd.Function`` with
double-backward support (pyngp/). Here the same surface is built on JAX:

* forward = the network's density-feature path (hash encode → density MLP),
* backward = ``jax.vjp``,
* double-backward w.r.t. the input = ``jax.jvp`` over the vjp,

bridged to torch through numpy (torch in this environment is CPU-only, so a
zero-copy device bridge buys nothing; the arrays are small API-surface
tensors, not the training hot path).

Usage::

    mod = NerfDensityModule(model, params)
    feats = mod(torch_positions)          # [N, F], differentiable
    loss = feats.square().sum()
    loss.backward()                       # grads flow to torch_positions

Import of this module does NOT require torch; only constructing the
autograd wrapper does.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


class DensityFns:
    """Jitted fwd/bwd/double-bwd closures over a (model, params) pair —
    the framework-agnostic core; the torch wrapper calls into this."""

    def __init__(self, model: Any, params: Any):
        self.model = model
        self.params = params

        def fwd(pos):
            return model.density_features(params, pos)

        self._fwd = jax.jit(fwd)

        def bwd(pos, d_out):
            _, vjp = jax.vjp(fwd, pos)
            return vjp(d_out)[0]

        self._bwd = jax.jit(bwd)

        def bwd_bwd_input(pos, d_out, d_dpos):
            # double backward w.r.t. the input (reference:
            # bwd_bwd_input_density, python_api.cu — needed for
            # eikonal-style losses): gradients of ⟨bwd(pos, d_out), d_dpos⟩
            # flowing back to pos and to the upstream d_out
            def bwd_dot(p, do):
                return jnp.sum(bwd(p, do) * d_dpos)

            d_pos2, d_dout = jax.grad(bwd_dot, argnums=(0, 1))(pos, d_out)
            return d_pos2, d_dout

        self._bwd_bwd = jax.jit(bwd_bwd_input)

    @property
    def n_density_output_dims(self) -> int:
        return int(self.model.density_mlp.n_output_dims)

    def fwd_density(self, positions: np.ndarray) -> np.ndarray:
        return np.asarray(self._fwd(jnp.asarray(positions, jnp.float32)))

    def bwd_density(self, positions: np.ndarray, d_output: np.ndarray) -> np.ndarray:
        return np.asarray(self._bwd(jnp.asarray(positions, jnp.float32), jnp.asarray(d_output, jnp.float32)))

    def bwd_bwd_input_density(self, positions: np.ndarray, d_output: np.ndarray, d_dpos: np.ndarray):
        d_pos2, d_dout = self._bwd_bwd(
            jnp.asarray(positions, jnp.float32),
            jnp.asarray(d_output, jnp.float32),
            jnp.asarray(d_dpos, jnp.float32),
        )
        return np.asarray(d_pos2), np.asarray(d_dout)


def NerfDensityModule(model: Any, params: Any):
    """→ a ``torch.nn.Module`` whose forward is the density-feature path,
    differentiable through torch autograd (single backward; the raw
    double-backward surface is available via ``.fns.bwd_bwd_input_density``)."""
    import torch

    fns = DensityFns(model, params)

    class _DensityFunction(torch.autograd.Function):
        @staticmethod
        def forward(ctx, positions):
            ctx.save_for_backward(positions)
            out = fns.fwd_density(positions.detach().cpu().numpy())
            return torch.from_numpy(out).to(positions.device)

        @staticmethod
        def backward(ctx, d_output):
            (positions,) = ctx.saved_tensors
            g = fns.bwd_density(
                positions.detach().cpu().numpy(), d_output.detach().cpu().numpy()
            )
            return torch.from_numpy(g).to(positions.device)

    class _Module(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fns = fns
            self.n_density_output_dims = fns.n_density_output_dims

        def forward(self, positions):
            return _DensityFunction.apply(positions)

    return _Module()
