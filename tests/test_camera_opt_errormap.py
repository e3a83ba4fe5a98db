"""Camera-pose optimization (T6, autodiff) + error-map importance (T7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.ops import grid as grid_lib, rays as rays_lib
from nerfshop_tpu.train import nerf as nerf_train
from nerfshop_tpu.train import optim

from test_nerf_train_e2e import make_dataset, small_model


def test_rodrigues_basics():
    # zero vector → identity
    np.testing.assert_allclose(np.asarray(rays_lib.rodrigues(jnp.zeros(3))), np.eye(3), atol=1e-6)
    # 90° about z
    R = np.asarray(rays_lib.rodrigues(jnp.asarray([0.0, 0.0, np.pi / 2])))
    np.testing.assert_allclose(R @ np.array([1, 0, 0.0]), [0, 1, 0], atol=1e-6)
    # orthonormality for random vectors
    rv = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)) * 0.3)
    Rs = np.asarray(rays_lib.rodrigues(rv))
    for R in Rs:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_pose_delta_gradients_flow():
    """Perturbed-pose scene: gradients w.r.t. pose deltas are nonzero and
    reduce the loss when stepped."""
    data, _, _ = make_dataset(n_views=4)
    model = small_model()
    cfg = nerf_train.NerfTrainConfig(
        n_rays_per_batch=512, k_samples=12, aabb_scale=1, n_cascades=1,
        near_distance=0.05, optimize_extrinsics=True, random_bg=False,
    )
    params = model.init(jax.random.PRNGKey(0))
    params["camera"] = nerf_train.create_camera_params(4)
    grid = grid_lib.OccupancyGrid.create(1)

    grads_of = nerf_train.make_grad_fn(model, cfg)
    grads, aux = jax.jit(grads_of)(params, grid, data, jax.random.PRNGKey(1))
    g_rot = float(jnp.abs(grads["camera"]["rot"]).sum())
    g_trans = float(jnp.abs(grads["camera"]["trans"]).sum())
    assert g_rot > 0 and g_trans > 0


def test_error_map_update_and_sampling():
    em = nerf_train.create_error_map(2, 8)
    img_idx = jnp.asarray([0, 0, 1])
    pix = jnp.asarray([[10.0, 20.0], [10.0, 20.0], [39.0, 39.0]])
    loss = jnp.asarray([1.0, 2.0, 5.0])
    em2 = nerf_train.update_error_map(em, img_idx, pix, loss, (2, 40, 40, 4), decay=0.5)
    assert float(em2[0, 4, 2]) == pytest.approx(0.5 + 3.0)
    assert float(em2[1, 7, 7]) == pytest.approx(0.5 + 5.0)

    # importance sampling prefers the hot cell
    images = jnp.zeros((2, 40, 40, 4))
    hot = jnp.ones((2, 8, 8)) * 1e-4
    hot = hot.at[0, 4, 2].set(100.0)
    img_i, pix_s, _ = rays_lib.sample_training_pixels(jax.random.PRNGKey(2), 256, images, hot)
    sel = (img_i == 0) & (pix_s[:, 0] // 5 == 2) & (pix_s[:, 1] // 5 == 4)
    assert float(sel.mean()) > 0.3


def test_train_step_with_error_map_runs():
    data, _, _ = make_dataset(n_views=3)
    model = small_model()
    cfg = nerf_train.NerfTrainConfig(
        n_rays_per_batch=512, k_samples=12, aabb_scale=1, n_cascades=1,
        near_distance=0.05, use_error_map=True,
    )
    spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2})
    state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
    grid = grid_lib.OccupancyGrid.create(1)
    em = nerf_train.create_error_map(3, cfg.error_map_resolution)
    step = jax.jit(nerf_train.make_train_step(model, spec, cfg), donate_argnums=(0, 4))
    state, aux, em = step(state, grid, data, jax.random.PRNGKey(1), em)
    state, aux, em = step(state, grid, data, jax.random.PRNGKey(2), em)
    assert np.isfinite(float(aux["loss"]))
    assert em.shape == (3, 32, 32)
    assert float(em.max()) > float(em.min())


def test_distortion_map_receives_gradients():
    """optimize_distortion (reference: TrainableBuffer<2,2> distortion grid)
    — the shared screen-space offset map gets nonzero gradients through the
    differentiable ray path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfshop_tpu.ops import grid as grid_lib
    from nerfshop_tpu.train import nerf as nerf_train
    from test_nerf_train_e2e import make_dataset, small_model

    data, _, _ = make_dataset()
    model = small_model()
    cfg = nerf_train.NerfTrainConfig(
        n_rays_per_batch=512, k_samples=16, aabb_scale=1, n_cascades=1,
        near_distance=0.05, optimize_extrinsics=True,
    )
    grads_of = nerf_train.make_grad_fn(model, cfg)
    params = model.init(jax.random.PRNGKey(0))
    params["camera"] = nerf_train.create_camera_params(
        data.images.shape[0], distortion_map=True, dmap_resolution=8
    )
    grid = grid_lib.OccupancyGrid.create(1)
    grads, aux = jax.jit(grads_of)(params, grid, data, jax.random.PRNGKey(1))
    g = np.asarray(grads["camera"]["distortion_map"])
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
