"""Bias-free MLPs in bf16 on the MXU.

TPU-native stand-in for tcnn's FullyFusedMLP / CutlassMLP
(reference: network config "network"/"rgb_network", configs/nerf/base.json):
64-wide, ReLU, no biases, fp16 weights. Here: fp32 master weights cast to
bf16 for ``dot_general`` with fp32 accumulation — XLA fuses the small chain
of matmuls + activations into MXU-friendly kernels; batch dims are padded to
MXU tiles by the callers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp


def _activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    name = (name or "None").lower()
    return {
        "relu": jax.nn.relu,
        "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
        "exponential": jnp.exp,
        "sigmoid": jax.nn.sigmoid,
        "sine": jnp.sin,
        "squareplus": lambda x: 0.5 * (x + jnp.sqrt(x * x + 4.0)),
        "softplus": jax.nn.softplus,
        "tanh": jnp.tanh,
        "none": lambda x: x,
    }[name]


@dataclass
class MLP:
    """width-uniform hidden layers; no biases (tcnn semantics)."""

    n_input_dims: int
    n_output_dims: int
    n_neurons: int = 64
    n_hidden_layers: int = 1
    activation: str = "ReLU"
    output_activation: str = "None"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @property
    def layer_dims(self) -> List[tuple]:
        dims = [self.n_input_dims] + [self.n_neurons] * self.n_hidden_layers + [self.n_output_dims]
        return list(zip(dims[:-1], dims[1:]))

    def init(self, rng: jax.Array):
        keys = jax.random.split(rng, len(self.layer_dims))
        ws = []
        for k, (fan_in, fan_out) in zip(keys, self.layer_dims):
            # He-uniform, matching tcnn's default for ReLU nets
            bound = jnp.sqrt(6.0 / fan_in)
            ws.append(jax.random.uniform(k, (fan_in, fan_out), jnp.float32, -bound, bound))
        return {"weights": ws}

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        act = _activation(self.activation)
        out_act = _activation(self.output_activation)
        h = x.astype(self.compute_dtype)
        ws = params["weights"]
        for i, w in enumerate(ws):
            h = jax.lax.dot_general(
                h,
                w.astype(self.compute_dtype),
                (((h.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if i < len(ws) - 1:
                h = act(h).astype(self.compute_dtype)
        return out_act(h)


def build_network(cfg: dict, n_input_dims: int, n_output_dims: int) -> MLP:
    """Factory from the JSON ``network`` block (otype FullyFusedMLP/CutlassMLP)."""
    return MLP(
        n_input_dims=n_input_dims,
        n_output_dims=n_output_dims,
        n_neurons=cfg.get("n_neurons", 64),
        n_hidden_layers=cfg.get("n_hidden_layers", 1),
        activation=cfg.get("activation", "ReLU"),
        output_activation=cfg.get("output_activation", "None"),
    )
