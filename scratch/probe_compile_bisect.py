import time, sys, jax, jax.numpy as jnp, numpy as np
from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import grid as grid_lib
from nerfshop_tpu.train import nerf as nerf_train, optim

which = sys.argv[1]
aabb = 4
model = build_nerf_network(default_nerf_config(), aabb_scale=aabb)
cfg = nerf_train.NerfTrainConfig.for_aabb_scale(aabb, n_rays_per_batch=8192)
spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15})
state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
grid = grid_lib.OccupancyGrid.create(cfg.n_cascades)
rng = np.random.default_rng(0)
data = nerf_train.DeviceDataset(
    images=jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 4)).astype(np.float32)),
    xforms=jnp.asarray(np.tile(np.eye(4, dtype=np.float32)[:3][None], (4, 1, 1))),
    focals=jnp.full((4, 2), 64.0), principals=jnp.full((4, 2), 0.5),
    distortions=jnp.zeros((4, 4)),
)
t0 = time.perf_counter()
if which == "step":
    step = jax.jit(nerf_train.make_train_step(model, spec, cfg), donate_argnums=(0,))
    state, aux = step(state, grid, data, jax.random.PRNGKey(1))
    jax.block_until_ready(aux["loss"])
elif which == "gridfull":
    gu = nerf_train.make_grid_update(model, cfg)
    grid = gu(grid, state.params, jax.random.PRNGKey(1), full_refresh=True)
    jax.block_until_ready(grid.density)
elif which == "gridpart":
    gu = nerf_train.make_grid_update(model, cfg)
    grid = gu(grid, state.params, jax.random.PRNGKey(1), full_refresh=False)
    jax.block_until_ready(grid.density)
elif which == "march":
    from nerfshop_tpu.ops import march, coords
    o = jax.random.uniform(jax.random.PRNGKey(1), (8192, 3))
    d = jax.random.normal(jax.random.PRNGKey(2), (8192, 3)); d /= jnp.linalg.norm(d, -1, keepdims=True)
    bb = coords.BoundingBox.from_aabb_scale(aabb)
    s = march.march_rays_training(o, d, grid.occupancy, bb.min, bb.max, jnp.asarray(cfg.cone_angle), rng=jax.random.PRNGKey(3))
    jax.block_until_ready(s.t)
elif which == "fwd":
    f = jax.jit(lambda p, x, d: model(p, x, d))
    out = f(state.params, jax.random.uniform(jax.random.PRNGKey(1), (262144, 3)), jax.random.uniform(jax.random.PRNGKey(2), (262144, 3)))
    jax.block_until_ready(out)
print(f"{which}: compile+first-run {time.perf_counter()-t0:.1f}s")
