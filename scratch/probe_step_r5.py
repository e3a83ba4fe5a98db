"""Round-5 step ablation at the BENCH config (ring rig, K=64, rays=4096,
one cascade): in-program 8-iteration chains, t(8)-t(1) differencing.
Stages: pixels+rays+march | +fwd composite loss | full grad | full step."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import grid as grid_lib, march, coords, rays as rays_lib
from nerfshop_tpu.train import nerf as nerf_train, optim, losses as loss_lib

import os, sys
sys.path.insert(0, "/root/repo")
from bench import ring_rig

K = int(sys.argv[1]) if len(sys.argv) > 1 else 64
model = build_nerf_network(default_nerf_config(), aabb_scale=1)
spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15})
state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
grid = grid_lib.OccupancyGrid.create(1)
rng0 = np.random.default_rng(0)
data = nerf_train.DeviceDataset(
    images=jnp.asarray(rng0.uniform(0, 1, (8, 256, 256, 4)).astype(np.float32)),
    xforms=jnp.asarray(ring_rig(8)),
    focals=jnp.full((8, 2), 180.0), principals=jnp.full((8, 2), 0.5),
    distortions=jnp.zeros((8, 4)),
)
cfg = nerf_train.NerfTrainConfig(
    n_rays_per_batch=max(64, (1 << 18) // K), k_samples=K, aabb_scale=1, n_cascades=1
)
aabb = coords.BoundingBox.from_aabb_scale(1)

# converge the grid like the bench
step = jax.jit(nerf_train.make_train_step(model, spec, cfg), donate_argnums=(0,))
gupd = nerf_train.make_grid_update(model, cfg)
key = jax.random.PRNGKey(1)
for i in range(4):
    key, k1 = jax.random.split(key)
    state, aux = step(state, grid, data, k1)
grid = gupd(grid, state.params, key, full_refresh=True)
float(np.asarray(aux["loss"]))
occ = float(np.asarray(grid.occupancy.mean()))
print(f"grid occ frac {occ:.3f}", flush=True)

SALT = int(time.time()) % 100000
R = cfg.n_rays_per_batch


def make_chain(body, iters):
    @jax.jit
    def run(params, rng):
        def f(i, carry):
            acc, rng = carry
            rng = jax.random.fold_in(rng, i)
            out = body(params, jax.random.fold_in(rng, SALT), acc)
            return (out, rng), None  # dummy

        def f2(i, carry):
            acc, rng = carry
            rng2 = jax.random.fold_in(rng, i)
            out = body(params, jax.random.fold_in(rng2, SALT), acc)
            return (out, rng)

        acc, _ = jax.lax.fori_loop(0, iters, f2, (jnp.zeros(()), rng))
        return acc

    return run


def bench(name, body, iters=8):
    c1, cK = make_chain(body, 1), make_chain(body, iters)
    r = jax.random.PRNGKey(2 + SALT)
    float(np.asarray(c1(state.params, r)))
    float(np.asarray(cK(state.params, r)))
    t0 = time.perf_counter()
    float(np.asarray(c1(state.params, jax.random.PRNGKey(3 + SALT))))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(cK(state.params, jax.random.PRNGKey(4 + SALT))))
    tK = time.perf_counter() - t0
    dt = (tK - t1) / (iters - 1)
    print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def stage_march(params, rng, acc):
    k_rays, k_march = jax.random.split(rng)
    img_idx, pix, targets = rays_lib.sample_training_pixels(
        k_rays, R, data.images, None
    )
    b = rays_lib.rays_from_pixels(
        img_idx, pix, data.xforms, data.focals, data.principals,
        jnp.asarray([256.0, 256.0]), data.distortions, None,
    )
    s = march.march_rays_training(
        b.origins, b.directions, grid.occupancy, aabb.min, aabb.max,
        jnp.asarray(0.0), rng=k_march, t_start_min=0.05,
        k_samples=K, n_candidates=cfg.n_candidates,
    )
    return acc + jnp.sum(s.t) * 1e-6 + targets[0, 0]


grads_of = nerf_train.make_grad_fn(model, cfg)


def stage_grads(params, rng, acc):
    g, aux = grads_of(params, grid, data, rng)
    # consume EVERY grad leaf — consuming one element lets XLA DCE most of
    # the table backward (the first cut under-measured grads by ~50 ms)
    tot = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
    return acc + aux["loss"] + tot * 1e-9


bench("pixels+rays+march", stage_march)
bench("full grads (march+fwd+loss+bwd)", stage_grads)


# isolate: (a) grads with a per-iteration-PERTURBED table (defeats hoisting
# of the brick build) vs constant-table grads; (b) grads + real Adam apply.
def stage_grads_tablevar(params, rng, acc):
    p = dict(params)
    pe = dict(p["pos_encoding"])
    pe["table"] = pe["table"] * (1.0 + 1e-12 * acc)
    p["pos_encoding"] = pe
    g, aux = grads_of(p, grid, data, rng)
    tot = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
    return acc + aux["loss"] + tot * 1e-9


step_fn = nerf_train.make_train_step(model, spec, cfg)


def make_step_chain(iters):
    @jax.jit
    def run(state, rng):
        def body(i, st):
            st, aux = step_fn(st, grid, data, jax.random.fold_in(rng, i))
            return st
        st = jax.lax.fori_loop(0, iters, body, state)
        return st.params["pos_encoding"]["table"][0, 0] + st.step.astype(jnp.float32)

    return run


def bench_state(name, iters=8):
    c1, cK = make_step_chain(1), make_step_chain(iters)
    float(np.asarray(c1(state, jax.random.PRNGKey(11 + SALT))))
    float(np.asarray(cK(state, jax.random.PRNGKey(12 + SALT))))
    t0 = time.perf_counter()
    float(np.asarray(c1(state, jax.random.PRNGKey(13 + SALT))))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(cK(state, jax.random.PRNGKey(14 + SALT))))
    tK = time.perf_counter() - t0
    dt = (tK - t1) / (iters - 1)
    print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)


bench("grads, table varies/iter", stage_grads_tablevar)
bench_state("FULL STEP (grads+adam), fori chain")
