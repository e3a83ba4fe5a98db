"""End-to-end NeRF training on a tiny synthetic scene.

Oracle: an opaque sphere with position-dependent color, rendered analytically
through the SAME camera model used in training. After a short run the model
must reconstruct held-out views well above the untrained baseline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.models import nerf_network as nn
from nerfshop_tpu.ops import composite as comp
from nerfshop_tpu.ops import coords, grid as grid_lib, march, rays as rays_lib
from nerfshop_tpu.train import nerf as nerf_train
from nerfshop_tpu.train import optim

RES = 40
CENTER = np.array([0.5, 0.5, 0.5], np.float32)
RADIUS = 0.22


def look_at(eye, target=CENTER, up=(0.0, 0.0, 1.0)):
    eye = np.asarray(eye, np.float32)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float32))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    m = np.stack([right, down, fwd], axis=1)  # columns: x,y,z camera axes
    return np.concatenate([m, eye[:, None]], axis=1).astype(np.float32)  # [3,4]


def sphere_rgba(origins, dirs):
    """Analytic render: opaque sphere, color = surface position."""
    o = np.asarray(origins)
    d = np.asarray(dirs)
    oc = o - CENTER
    b = np.sum(oc * d, -1)
    c = np.sum(oc * oc, -1) - RADIUS**2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0
    p = o + t[:, None] * d
    color = np.clip((p - CENTER) / (2 * RADIUS) + 0.5, 0, 1)
    rgba = np.zeros((o.shape[0], 4), np.float32)
    rgba[hit, :3] = color[hit]
    rgba[hit, 3] = 1.0
    return rgba


def make_dataset(n_views=10, seed=0):
    rng = np.random.default_rng(seed)
    focal = np.array([RES * 1.1, RES * 1.1], np.float32)
    principal = np.array([0.5, 0.5], np.float32)
    images, xforms = [], []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        z = rng.uniform(-0.3, 0.8)
        eye = CENTER + np.array([np.cos(ang), np.sin(ang), z], np.float32) * 1.3
        xf = look_at(eye)
        bundle = rays_lib.rays_for_image((RES, RES), jnp.asarray(xf), jnp.asarray(focal), jnp.asarray(principal))
        rgba = sphere_rgba(bundle.origins, bundle.directions).reshape(RES, RES, 4)
        images.append(rgba)
        xforms.append(xf)
    return (
        nerf_train.DeviceDataset(
            images=jnp.asarray(np.stack(images)),
            xforms=jnp.asarray(np.stack(xforms)),
            focals=jnp.tile(jnp.asarray(focal)[None], (n_views, 1)),
            principals=jnp.tile(jnp.asarray(principal)[None], (n_views, 1)),
            distortions=jnp.zeros((n_views, 4)),
        ),
        focal,
        principal,
    )


def small_model():
    from nerfshop_tpu.models import encodings as enc
    from nerfshop_tpu.models import mlp as mlp_lib

    pos_enc = enc.GridEncoding(
        n_input_dims=3, n_levels=8, n_features_per_level=2,
        log2_hashmap_size=15, base_resolution=16, per_level_scale=1.45,
    )
    dir_enc = enc.SphericalHarmonicsEncoding(degree=4)
    return nn.NerfNetwork(
        pos_encoding=pos_enc,
        dir_encoding=dir_enc,
        density_mlp=mlp_lib.MLP(n_input_dims=pos_enc.n_output_dims, n_output_dims=16, n_neurons=64, n_hidden_layers=1),
        rgb_mlp=mlp_lib.MLP(n_input_dims=32, n_output_dims=3, n_neurons=64, n_hidden_layers=2),
    )


def render_view(model, params, occupancy, xf, focal, principal, cfg):
    aabb = coords.BoundingBox.from_aabb_scale(cfg.aabb_scale)
    bundle = rays_lib.rays_for_image((RES, RES), jnp.asarray(xf), jnp.asarray(focal), jnp.asarray(principal))
    # the grid is still dense at this step count (it clears after ~90 decay
    # updates), so give the render march a full-path sample budget
    samples = march.march_rays(
        bundle.origins, bundle.directions, occupancy, aabb.min, aabb.max,
        jnp.asarray(cfg.cone_angle), k_samples=512, t_start_min=0.05,
    )
    R, K = samples.t.shape
    pos_w, dir_w = march.samples_to_network_inputs(samples, bundle.origins, bundle.directions, aabb)
    rgb, sigma = model(params, pos_w.reshape(-1, 3), dir_w.reshape(-1, 3))
    res = comp.composite(sigma.reshape(R, K), rgb.reshape(R, K, 3), samples.dt, samples.t, samples.valid, 1e-4)
    return comp.composite_with_background(res, jnp.zeros(3)).reshape(RES, RES, 3)


@pytest.mark.slow
def test_nerf_trains_on_synthetic_sphere():
    data, focal, principal = make_dataset()
    model = small_model()
    cfg = nerf_train.NerfTrainConfig(
        n_rays_per_batch=1024, k_samples=128, aabb_scale=1, n_cascades=1,
        near_distance=0.05, loss_type="Huber",
    )
    spec = optim.build_optimizer(
        {"otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6}
    )
    state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
    grid = grid_lib.OccupancyGrid.create(cfg.n_cascades)

    step = jax.jit(nerf_train.make_train_step(model, spec, cfg), donate_argnums=(0,))
    grid_update = nerf_train.make_grid_update(model, cfg, n_samples_per_cascade=32768)

    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(200):
        rng, k1, k2 = jax.random.split(rng, 3)
        if i % 16 == 0 and i > 0:
            grid = grid_update(grid, state.params, k2, full_refresh=False)
        state, aux = step(state, grid, data, k1)
        losses.append(float(aux["loss"]))

    tail = float(np.mean(losses[-10:]))
    assert tail < losses[0] * 0.35, (losses[0], tail)

    # held-out view PSNR (in the training color space, black bg)
    eye = CENTER + np.array([0.9, 0.9, 0.5], np.float32)
    xf = look_at(eye)
    bundle = rays_lib.rays_for_image((RES, RES), jnp.asarray(xf), jnp.asarray(focal), jnp.asarray(principal))
    gt = sphere_rgba(bundle.origins, bundle.directions).reshape(RES, RES, 4)
    gt_rgb = gt[..., :3] * gt[..., 3:]
    params = state.inference_params
    img = np.asarray(render_view(model, params, grid.occupancy, xf, focal, principal, cfg))
    mse = float(np.mean((img - gt_rgb) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 14.0, psnr
