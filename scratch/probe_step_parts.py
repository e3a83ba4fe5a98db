"""In-program chained decomposition of the NON-encoding train-step parts:
rays+march / grads-without-adam / adam-only, plus the full step."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import coords, grid as grid_lib, march, rays as rays_lib
from nerfshop_tpu.train import nerf as nerf_train
from nerfshop_tpu.train import optim

model = build_nerf_network(default_nerf_config(), aabb_scale=1)
spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15})
state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
grid = grid_lib.OccupancyGrid.create(1)

batch = 1 << 18
K = 32
n_rays = batch // K
cfg = nerf_train.NerfTrainConfig(n_rays_per_batch=n_rays, k_samples=K, aabb_scale=1, n_cascades=1)
rng = np.random.default_rng(0)
n_views, res = 8, 256
data = nerf_train.DeviceDataset(
    images=jnp.asarray(rng.uniform(0, 1, (n_views, res, res, 4)).astype(np.float32)),
    xforms=jnp.asarray(np.tile(np.eye(4, dtype=np.float32)[:3][None], (n_views, 1, 1))),
    focals=jnp.full((n_views, 2), 180.0),
    principals=jnp.full((n_views, 2), 0.5),
    distortions=jnp.zeros((n_views, 4)),
)
aabb = coords.BoundingBox.from_aabb_scale(1)

single = jax.jit(nerf_train.make_train_step(model, spec, cfg), donate_argnums=(0,))
key = jax.random.PRNGKey(1)
for i in range(4):
    key, k1 = jax.random.split(key)
    state, aux = single(state, grid, data, k1)
grid = nerf_train.make_grid_update(model, cfg)(grid, state.params, key, full_refresh=True)
print("occ", float(np.asarray(grid.occupancy.mean())), flush=True)

grads_of = nerf_train.make_grad_fn(model, cfg)
ITERS = 8


def chain_time(name, make_fn, *args):
    f_many = make_fn(ITERS)
    f_one = make_fn(1)
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    float(np.asarray(f_many(*args, ks[0])))
    float(np.asarray(f_one(*args, ks[1])))
    t0 = time.perf_counter()
    float(np.asarray(f_one(*args, ks[2])))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(f_many(*args, ks[3])))
    t_many = time.perf_counter() - t0
    per = (t_many - t_one) / (ITERS - 1)
    print(f"{name:40s} {per*1e3:8.2f} ms  (1-iter {t_one*1e3:6.1f} ms)", flush=True)
    return per


def mk_march(iters):
    @jax.jit
    def f(grid, data, k):
        def body(i, c):
            kk = jax.random.fold_in(k, i + c.astype(jnp.int32))
            k_rays, k_march = jax.random.split(kk)
            img_idx, pix, targets = rays_lib.sample_training_pixels(k_rays, n_rays, data.images, None)
            b = rays_lib.rays_from_pixels(
                img_idx, pix, data.xforms, data.focals, data.principals,
                jnp.asarray([res, res], jnp.float32), data.distortions, None,
            )
            s = march.march_rays_training(
                b.origins, b.directions, grid.occupancy, aabb.min, aabb.max,
                jnp.asarray(0.0), rng=k_march, t_start_min=0.05, k_samples=K,
            )
            return (s.n.sum() + targets.sum().astype(jnp.int32)).astype(jnp.float32) % 31.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


def mk_grads(iters):
    @jax.jit
    def f(params, grid, data, k):
        def body(i, c):
            g, aux = grads_of(
                jax.tree.map(lambda x: x * (1.0 + 0.0 * c), params), grid, data,
                jax.random.fold_in(k, i),
            )
            return aux["loss"] % 31.0 + c * 1e-30

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


def mk_adam(iters):
    g0, _ = jax.jit(grads_of)(state.params, grid, data, jax.random.PRNGKey(5))

    @jax.jit
    def f(state0, g0, k):
        def body(i, carry):
            st = carry
            g = jax.tree.map(lambda x: x * (1.0 + 1e-30 * i), g0)
            return optim.apply_gradients(st, g, spec)

        st = jax.lax.fori_loop(0, iters, body, state0)
        return st.params["pos_encoding"]["table"].sum() % 7.0

    return lambda st, k: f(st, g0, k)


chain_time("rays+march loop", mk_march, grid, data)
chain_time("grads (march+fwd+bwd) loop", mk_grads, state.params, grid, data)
chain_time("adam-only loop", mk_adam, state)
