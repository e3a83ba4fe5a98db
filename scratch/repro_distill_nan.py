"""Fast repro: distill with a membrane-carrying cage op on the sphere scene."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np
from test_edit_pipeline_e2e import trained, _build_cage_op  # fixtures as fns
import test_edit_pipeline_e2e as e2e
from test_nerf_train_e2e import make_dataset, small_model
from nerfshop_tpu.editing import poisson as poisson_lib
from nerfshop_tpu.ops import coords, grid as grid_lib
from nerfshop_tpu.train import distill as distill_lib
from nerfshop_tpu.train import nerf as nerf_train, optim

# rebuild the 'trained' fixture inline
data, focal, principal = make_dataset()
model = small_model()
cfg = nerf_train.NerfTrainConfig(n_rays_per_batch=1024, k_samples=128, aabb_scale=1,
                                 n_cascades=1, near_distance=0.05, loss_type="Huber")
spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15})
state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
grid = grid_lib.OccupancyGrid.create(1)
step = jax.jit(nerf_train.make_train_step(model, spec, cfg), donate_argnums=(0,))
gu = nerf_train.make_grid_update(model, cfg, n_samples_per_cascade=32768)
rng = jax.random.PRNGKey(1)
for i in range(120):
    rng, k1, k2 = jax.random.split(rng, 3)
    if i % 16 == 0 and i > 0:
        grid = gu(grid, state.params, k2, full_refresh=False)
    state, _ = step(state, grid, data, k1)
print("trained", flush=True)

tr = (model, state, grid, cfg, focal, principal)
gs, op = _build_cage_op(tr, translate=(0.12, 0.0, 0.0))
mem = poisson_lib.compute_membrane(model, state.inference_params, gs.cage, gs.tet_mesh,
                                   coords.BoundingBox.unit(), jax.random.PRNGKey(11))
print("mem density range", float(mem.density.min()), float(mem.density.max()),
      "sh absmax", float(jnp.abs(mem.sh).max()), flush=True)
print("mem density nan?", bool(jnp.isnan(mem.density).any()),
      "sh nan?", bool(jnp.isnan(mem.sh).any()), flush=True)

variants = {
    "no-membrane": op,
    "rs-only": op._replace(membrane=mem._replace(sh=jnp.zeros_like(mem.sh))),
    "rc-only": op._replace(membrane=mem._replace(density=jnp.zeros_like(mem.density))),
    "full": op._replace(membrane=mem),
}

for name, opv in variants.items():
    upd = nerf_train.make_grid_update(model, cfg, operators=(opv,))
    grid2 = upd(jax.tree.map(lambda a: a.copy(), grid), state.inference_params,
                jax.random.PRNGKey(7), full_refresh=True)
    dstep = distill_lib.make_distill_step(
        model, state.inference_params, (opv,), spec,
        distill_lib.DistillConfig(n_rays_per_batch=1024, k_samples=64))
    st2 = optim.create_train_state(jax.tree.map(jnp.copy, state.inference_params), spec)
    r = jax.random.PRNGKey(3)
    for i in range(6):
        r, k = jax.random.split(r)
        st2, aux = dstep(st2, grid2, data, k)
        if i in (0, 5):
            print(name, i, {k2: float(v) for k2, v in aux.items()}, flush=True)
