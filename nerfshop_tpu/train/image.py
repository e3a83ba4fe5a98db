"""2D image fitting (the reference's Image testbed, src/testbed_image.cu).

Smallest end-to-end workload: hash-encode pixel coords → MLP → RGB,
L2 loss against bilinearly-sampled target. Validates the whole
encoding/MLP/optimizer stack against tcnn convergence behavior
(configs/image/base.json).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from nerfshop_tpu.models import encodings as enc
from nerfshop_tpu.models import mlp as mlp_lib
from nerfshop_tpu.train import losses as loss_lib
from nerfshop_tpu.train import optim


@dataclass
class ImageModel:
    encoding: enc.Encoding
    network: mlp_lib.MLP

    @staticmethod
    def from_config(config: dict) -> "ImageModel":
        e = enc.build_encoding(dict(config.get("encoding", {})), 2)
        net = mlp_lib.build_network(dict(config.get("network", {})), e.n_output_dims, 3)
        return ImageModel(e, net)

    def init(self, rng: jax.Array):
        k1, k2 = jax.random.split(rng)
        return {"encoding": self.encoding.init(k1), "network": self.network.init(k2)}

    def apply(self, params, xy: jnp.ndarray) -> jnp.ndarray:
        """xy in [0,1]² → rgb [N,3]."""
        h = self.encoding.apply(params["encoding"], xy)
        return self.network.apply(params["network"], h)


def sample_image_bilinear(image: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """image [H,W,C], xy in [0,1]² (x=col, y=row) → [N,C]; cell-centered."""
    H, W = image.shape[:2]
    px = xy[:, 0] * W - 0.5
    py = xy[:, 1] * H - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0)[:, None]
    fy = (py - y0)[:, None]
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    v00, v01 = image[y0, x0], image[y0, x1]
    v10, v11 = image[y1, x0], image[y1, x1]
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy


def make_train_step(model: ImageModel, spec: optim.OptimizerSpec, loss_fn, batch_size: int):
    """jittable (state, image, rng) → (state, loss)."""

    def step(state: optim.TrainState, image: jnp.ndarray, rng: jax.Array):
        xy = jax.random.uniform(rng, (batch_size, 2))
        target = sample_image_bilinear(image, xy)[:, :3]

        def loss_of(params):
            pred = model.apply(params, xy)
            return jnp.mean(loss_fn(target, pred))

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        return optim.apply_gradients(state, grads, spec), loss

    return jax.jit(step, donate_argnums=(0,))


def render_full_image(model: ImageModel, params, resolution: Tuple[int, int], chunk: int = 1 << 18) -> jnp.ndarray:
    """Evaluate the field at every pixel center → [H,W,3]."""
    H, W = resolution
    ys, xs = jnp.meshgrid(
        (jnp.arange(H) + 0.5) / H, (jnp.arange(W) + 0.5) / W, indexing="ij"
    )
    xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)
    outs = []
    apply = jax.jit(model.apply)
    for i in range(0, xy.shape[0], chunk):
        outs.append(apply(params, xy[i : i + chunk]))
    return jnp.concatenate(outs).reshape(H, W, 3)


def compute_image_mse(pred: jnp.ndarray, target: jnp.ndarray, quantize: bool = False) -> jnp.ndarray:
    """Reference: Testbed::compute_image_mse (testbed.h:429)."""
    if quantize:
        pred = jnp.round(jnp.clip(pred, 0, 1) * 255) / 255
    return jnp.mean(jnp.square(pred - target))
