"""End-to-end 2D image fitting — the reference's smallest workload
(configs/image/base.json + data/image/albert.exr, src/testbed_image.cu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.train import image as image_mod
from nerfshop_tpu.train import losses, optim


def _small_config():
    return {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-15},
        "encoding": {
            "otype": "HashGrid",
            "n_levels": 8,
            "n_features_per_level": 2,
            "log2_hashmap_size": 14,
            "base_resolution": 8,
            "per_level_scale": 1.6,
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 32, "n_hidden_layers": 2},
    }


def test_image_fit_converges(albert_image):
    cfg = _small_config()
    target = jnp.asarray(albert_image[::8, ::8, :3])  # 128×128

    model = image_mod.ImageModel.from_config(cfg)
    spec = optim.build_optimizer(cfg["optimizer"])
    state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
    step = image_mod.make_train_step(model, spec, losses.build_loss(cfg["loss"]), batch_size=4096)

    rng = jax.random.PRNGKey(1)
    first_loss = None
    for i in range(200):
        rng, k = jax.random.split(rng)
        state, loss = step(state, target, k)
        if i == 0:
            first_loss = float(loss)

    final = image_mod.render_full_image(model, state.params, (128, 128))
    mse = float(image_mod.compute_image_mse(final, target))
    psnr = -10 * np.log10(mse)
    assert float(loss) < first_loss * 0.2, (first_loss, float(loss))
    assert psnr > 18.0, psnr  # tcnn hits ~25+ dB quickly; CPU mini-run is looser


def test_bilinear_sampling_exact_at_centers():
    img = jnp.arange(12.0).reshape(3, 4, 1)
    # pixel centers: xy = ((col+0.5)/W, (row+0.5)/H)
    xy = jnp.asarray([[(1 + 0.5) / 4, (2 + 0.5) / 3]])
    v = image_mod.sample_image_bilinear(img, xy)
    assert float(v[0, 0]) == pytest.approx(float(img[2, 1, 0]))
