"""Where do 130 ms/step go? Ablation chains with params CHANGING every
iteration (probe_step_parts' mk_grads multiplied params by (1+0*c), which
XLA const-folds — params became loop-invariant and every params-only
computation (brick-table build, layout changes) was HOISTED out of the
loop, understating the true per-step cost at 53 ms vs the real 130).

Every variant here couples the carried params to the previous iteration's
output, so nothing params-dependent can hoist and the relay cannot elide.
"""
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
    xforms=jnp.asarray(__import__("bench").ring_rig(n_views)),
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
step_fn = nerf_train.make_train_step(model, spec, cfg)
ITERS = 8


import os as _os2

# per-run salt: the relay memoizes identical (program, args) across
# processes — fixed keys make rerun timings instant-replay garbage
_SALT = int(_os2.environ.get("PROBE_SALT", str(int(time.time()) % 100000)))


def chain_time(name, make_fn):
    f_many = make_fn(ITERS)
    f_one = make_fn(1)
    ks = jax.random.split(jax.random.PRNGKey(9 + _SALT), 4)
    float(np.asarray(f_many(ks[0])))
    float(np.asarray(f_one(ks[1])))
    t0 = time.perf_counter()
    float(np.asarray(f_one(ks[2])))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(f_many(ks[3])))
    t_many = time.perf_counter() - t0
    per = (t_many - t_one) / (ITERS - 1)
    print(f"{name:44s} {per*1e3:8.2f} ms  (1-iter {t_one*1e3:6.1f} ms)", flush=True)
    return per


def _couple(params, s):
    """Scale every param leaf by (1 + 1e-12·s): params depend on the previous
    iteration, defeating loop-invariant hoisting, at negligible value drift."""
    f = 1.0 + 1e-12 * s
    return jax.tree.map(lambda x: x * f, params)


def mk_full_step(iters):
    @jax.jit
    def f(k):
        def body(i, carry):
            st, _ = carry
            st2, aux = step_fn(st, grid, data, jax.random.fold_in(k, i))
            return st2, aux["loss"]

        _, loss = jax.lax.fori_loop(0, iters, body, (state, jnp.zeros(())))
        return loss

    return f


def mk_grads_sgd(iters):
    @jax.jit
    def f(k):
        def body(i, carry):
            p, _ = carry
            g, aux = grads_of(p, grid, data, jax.random.fold_in(k, i))
            p2 = jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)
            return p2, aux["loss"]

        _, loss = jax.lax.fori_loop(0, iters, body, (state.params, jnp.zeros(())))
        return loss

    return f


def mk_fwd_loss(iters):
    """march + forward + loss, NO backward; params still vary per iter."""
    loss_fn = nerf_train.loss_lib.LOSSES[cfg.loss_type]

    @jax.jit
    def f(k):
        def body(i, carry):
            p, s = carry
            kk = jax.random.fold_in(k, i)
            k_rays, k_march, k_bg, _ = jax.random.split(kk, 4)
            img_idx, pix, targets = rays_lib.sample_training_pixels(
                k_rays, n_rays, data.images, None
            )
            b = rays_lib.rays_from_pixels(
                img_idx, pix, data.xforms, data.focals, data.principals,
                jnp.asarray([res, res], jnp.float32), data.distortions, None,
            )
            samples = march.march_rays_training(
                b.origins, b.directions, grid.occupancy, aabb.min, aabb.max,
                jnp.asarray(0.0), rng=k_march, t_start_min=0.05, k_samples=K,
            )
            bg = jax.random.uniform(k_bg, (n_rays, 3))
            _, aux = nerf_train.nerf_loss_fn(
                p, model, samples, b.origins, b.directions, targets, bg,
                aabb, loss_fn, cfg.min_transmittance,
                near_distance=cfg.near_distance, mean_grid_density=grid.mean_density,
            )
            return _couple(p, aux["loss"]), aux["loss"]

        _, loss = jax.lax.fori_loop(0, iters, body, (state.params, jnp.zeros(())))
        return loss

    return f


def mk_fwd_only(iters):
    """forward field eval on FIXED sample positions (no march, no loss
    composite): isolates the in-situ encode+MLP fwd with varying params."""
    pos = jax.random.uniform(jax.random.PRNGKey(3), (batch, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(4), (batch, 3))

    @jax.jit
    def f(k):
        def body(i, carry):
            p, s = carry
            rgb, sigma = model(p, pos, dirs)
            s2 = jnp.sum(sigma) % 1.0
            return _couple(p, s2), s2

        _, s = jax.lax.fori_loop(0, iters, body, (state.params, jnp.zeros(())))
        return s

    return f


def mk_grads_sgd_ablate(stop_paths):
    """grads with chosen param leaves stop-gradiented INSIDE the
    differentiated function (a stop applied to the grad fn's *argument* is a
    no-op — jax.grad differentiates wrt the argument itself). Stopping
    pos_encoding/table removes the ENTIRE encode-table backward (sort +
    segsum + corner reduction): positions carry no grad, so no cotangent
    path reaches the encode op and XLA DCEs its VJP."""
    loss_fn = nerf_train.loss_lib.LOSSES[cfg.loss_type]

    def stop_leaves(p):
        flat = jax.tree_util.tree_flatten_with_path(p)[0]
        treedef = jax.tree.structure(p)
        out = []
        for path, leaf in flat:
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            out.append(jax.lax.stop_gradient(leaf) if any(s in key for s in stop_paths) else leaf)
        return jax.tree.unflatten(treedef, out)

    def make(iters):
        def loss_of(p, kk):
            p = stop_leaves(p)
            k_rays, k_march, k_bg, _ = jax.random.split(kk, 4)
            img_idx, pix, targets = rays_lib.sample_training_pixels(
                k_rays, n_rays, data.images, None
            )
            b = rays_lib.rays_from_pixels(
                img_idx, pix, data.xforms, data.focals, data.principals,
                jnp.asarray([res, res], jnp.float32), data.distortions, None,
            )
            samples = march.march_rays_training(
                b.origins, b.directions, grid.occupancy, aabb.min, aabb.max,
                jnp.asarray(0.0), rng=k_march, t_start_min=0.05, k_samples=K,
            )
            bg = jax.random.uniform(k_bg, (n_rays, 3))
            loss, aux = nerf_train.nerf_loss_fn(
                p, model, samples, b.origins, b.directions, targets, bg,
                aabb, loss_fn, cfg.min_transmittance,
                near_distance=cfg.near_distance, mean_grid_density=grid.mean_density,
            )
            return loss, aux

        gfn = jax.value_and_grad(loss_of, has_aux=True)

        @jax.jit
        def f(k):
            def body(i, carry):
                p, _ = carry
                (loss, aux), g = gfn(p, jax.random.fold_in(k, i))
                p2 = jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)
                return p2, loss

            _, loss = jax.lax.fori_loop(0, iters, body, (state.params, jnp.zeros(())))
            return loss

        return f

    return make


def mk_model_grads_fixed(stop_paths):
    """value_and_grad of sum(model fwd) at FIXED sample positions — the
    model fwd+bwd alone, no march/composite/loss. Against mk_fwd_only this
    splits the in-step backward between the model and everything else."""
    pos = jax.random.uniform(jax.random.PRNGKey(3), (batch, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(4), (batch, 3))

    def stop_leaves(p):
        flat = jax.tree_util.tree_flatten_with_path(p)[0]
        treedef = jax.tree.structure(p)
        out = []
        for path, leaf in flat:
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            out.append(jax.lax.stop_gradient(leaf) if any(s in key for s in stop_paths) else leaf)
        return jax.tree.unflatten(treedef, out)

    def make(iters):
        def loss_of(p):
            rgb, sigma = model(stop_leaves(p), pos, dirs)
            return jnp.sum(rgb) * 1e-6 + jnp.sum(sigma) * 1e-6

        gfn = jax.value_and_grad(loss_of)

        @jax.jit
        def f(k):
            def body(i, carry):
                p, _ = carry
                v, g = gfn(p)
                p2 = jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
                return p2, v

            _, v = jax.lax.fori_loop(0, iters, body, (state.params, jnp.zeros(())))
            return v

        return f

    return make


import os as _os

_only = _os.environ.get("PROBE_ONLY")
_only = [s.strip() for s in _only.split(",")] if _only else None


def _maybe(name, make_fn):
    if _only is None or any(s in name for s in _only):
        chain_time(name, make_fn)


_maybe("full step (grads+adam)", mk_full_step)
_maybe("model grads, fixed samples", mk_model_grads_fixed([]))
_maybe("model grads fixed, STOP table", mk_model_grads_fixed(["table"]))
_maybe("grads + sgd coupling", mk_grads_sgd)
_maybe("grads(probe pipeline), nothing stopped", mk_grads_sgd_ablate([]))
_maybe("grads, STOP table grad", mk_grads_sgd_ablate(["table"]))
_maybe("grads, STOP mlp weights", mk_grads_sgd_ablate(["density_mlp", "rgb_mlp", "mlp"]))
_maybe("grads, STOP table+mlp (loss bwd only)", mk_grads_sgd_ablate(["table", "mlp"]))
_maybe("march+fwd+loss (no bwd), params vary", mk_fwd_loss)
_maybe("fwd only (fixed samples), params vary", mk_fwd_only)
