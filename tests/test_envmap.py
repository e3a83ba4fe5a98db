"""Envmap (T8): lat-long sampling math, trainable background convergence,
and renderer compositing behind transparent pixels."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.ops import envmap as envmap_lib


def test_latlong_uv_poles_and_equator():
    dirs = jnp.asarray(
        [[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]]
    )
    uv = np.asarray(envmap_lib.direction_to_latlong_uv(dirs))
    assert abs(uv[0, 1] - 0.0) < 1e-6  # +z → top
    assert abs(uv[1, 1] - 1.0) < 1e-6  # −z → bottom
    assert abs(uv[2, 1] - 0.5) < 1e-6  # equator
    assert abs(uv[2, 0] - 0.5) < 1e-6  # +x → center (atan2=0 → 0.5)
    assert uv[3, 0] in (0.0, 1.0) or abs(uv[3, 0] - 0.0) < 1e-6  # −x wraps


def test_sample_envmap_bilinear_and_wrap():
    em = jnp.zeros((8, 16, 4)).at[4, 8].set(jnp.asarray([1.0, 2.0, 3.0, 1.0]))
    # direction pointing at texel (4, 8): v=(4+0.5)/8 → theta, u=(8+0.5)/16 → phi
    theta = (4 + 0.5) / 8 * np.pi
    phi = ((8 + 0.5) / 16 - 0.5) * 2 * np.pi
    d = jnp.asarray([[np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)]])
    out = np.asarray(envmap_lib.sample_envmap(em, d))
    np.testing.assert_allclose(out[0, :3], [1.0, 2.0, 3.0], rtol=1e-3)
    # phi wrap: sampling just left of u=0 blends with the u=W−1 column
    em2 = jnp.zeros((4, 8, 4)).at[2, 0].set(1.0).at[2, 7].set(1.0)
    d2 = jnp.asarray([[np.cos(np.pi - 0.01), np.sin(np.pi - 0.01), 0.0]])  # u≈0/1 seam
    out2 = np.asarray(envmap_lib.sample_envmap(em2, d2))
    assert out2[0, 0] > 0.3  # seam blends, doesn't read zeros


def test_envmap_background_trains():
    """A NeRF trained on images of pure background converges the envmap
    toward the target color (gradient flows through the composite)."""
    from nerfshop_tpu.models import encodings as enc
    from nerfshop_tpu.models import mlp as mlp_lib
    from nerfshop_tpu.models import nerf_network as nn
    from nerfshop_tpu.ops import grid as grid_lib
    from nerfshop_tpu.train import nerf as nerf_train
    from nerfshop_tpu.train import optim

    pos_enc = enc.GridEncoding(n_input_dims=3, n_levels=2, n_features_per_level=2,
                               log2_hashmap_size=10, base_resolution=8, per_level_scale=1.5)
    model = nn.NerfNetwork(
        pos_encoding=pos_enc,
        dir_encoding=enc.SphericalHarmonicsEncoding(degree=2),
        density_mlp=mlp_lib.MLP(n_input_dims=4, n_output_dims=16, n_neurons=16, n_hidden_layers=1),
        rgb_mlp=mlp_lib.MLP(n_input_dims=20, n_output_dims=3, n_neurons=16, n_hidden_layers=1),
    )
    cfg = nerf_train.NerfTrainConfig(
        n_rays_per_batch=512, k_samples=8, aabb_scale=1, n_cascades=1,
        train_envmap=True, random_bg=False, loss_type="L2",
    )
    spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 5e-2})
    params = model.init(jax.random.PRNGKey(0))
    params["envmap"] = envmap_lib.create_envmap((8, 16))
    state = optim.create_train_state(params, spec)
    # the scene is EMPTY (no occupancy) and every GT pixel is transparent
    # green: rays exit, pred = envmap(dir), target = α·rgb + (1−α)·envmap…
    # with α=1 and rgb=green the envmap must learn green
    grid = grid_lib.OccupancyGrid.create(1)
    grid = grid._replace(occupancy=jnp.zeros_like(grid.occupancy))
    imgs = np.zeros((2, 16, 16, 4), np.float32)
    imgs[..., 1] = 0.8
    imgs[..., 3] = 1.0
    data = nerf_train.DeviceDataset(
        images=jnp.asarray(imgs),
        xforms=jnp.asarray(np.tile(np.eye(4, dtype=np.float32)[:3][None], (2, 1, 1))),
        focals=jnp.full((2, 2), 16.0),
        principals=jnp.full((2, 2), 0.5),
        distortions=jnp.zeros((2, 4)),
    )
    step = jax.jit(nerf_train.make_train_step(model, spec, cfg), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    for _ in range(60):
        key, k = jax.random.split(key)
        state, aux = step(state, grid, data, k)
    em = np.asarray(state.params["envmap"])
    # forward-hemisphere texels that received rays converge to green
    seen = em[..., 1] > 0.4
    assert seen.any(), em[..., 1].max()
    assert float(aux["loss"]) < 0.05


def test_render_frame_with_envmap_background():
    from nerfshop_tpu.models import encodings as enc
    from nerfshop_tpu.models import mlp as mlp_lib
    from nerfshop_tpu.models import nerf_network as nn
    from nerfshop_tpu.ops import grid as grid_lib
    from nerfshop_tpu.render import renderer

    pos_enc = enc.GridEncoding(n_input_dims=3, n_levels=2, n_features_per_level=2,
                               log2_hashmap_size=10, base_resolution=8, per_level_scale=1.5)
    model = nn.NerfNetwork(
        pos_encoding=pos_enc,
        dir_encoding=enc.SphericalHarmonicsEncoding(degree=2),
        density_mlp=mlp_lib.MLP(n_input_dims=4, n_output_dims=16, n_neurons=16, n_hidden_layers=1),
        rgb_mlp=mlp_lib.MLP(n_input_dims=20, n_output_dims=3, n_neurons=16, n_hidden_layers=1),
    )
    params = model.init(jax.random.PRNGKey(0))
    grid = grid_lib.OccupancyGrid.create(1)
    grid = grid._replace(occupancy=jnp.zeros_like(grid.occupancy))  # empty scene
    em = envmap_lib.create_envmap((8, 16)).at[..., 0].set(0.9)  # red sky
    xf = jnp.asarray([[1.0, 0, 0, 0.5], [0, 1.0, 0, 0.5], [0, 0, 1.0, -0.6]], jnp.float32)
    out = renderer.render_frame(
        model, params, grid, (16, 16), xf, jnp.asarray([16.0, 16.0]),
        opts=renderer.RenderOptions(k_samples=8, n_candidates=64, n_windows=1, chunk=256),
        envmap=em,
    )
    rgba = np.asarray(out.rgba)
    assert rgba[..., 0].mean() > 0.8  # red background everywhere
    assert rgba[..., 3].min() > 0.99  # envmap makes pixels opaque
