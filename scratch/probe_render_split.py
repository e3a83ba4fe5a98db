"""Where does a render chunk spend its time? march vs eval vs composite,
dependency-chained (origins perturbed by previous output)."""
import time, jax, jax.numpy as jnp, numpy as np
from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import grid as grid_lib, march, coords
from nerfshop_tpu.render import renderer

model = build_nerf_network(default_nerf_config(), aabb_scale=1)
params = model.init(jax.random.PRNGKey(0))
grid = grid_lib.OccupancyGrid.create(1)
g = (np.arange(128) + 0.5) / 128
xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
occ = ((xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2) < 0.2 ** 2
grid = grid._replace(occupancy=jnp.asarray(occ[None]), density=jnp.where(jnp.asarray(occ[None]), 5.0, 0.0))

R = 1 << 13
aabb = coords.BoundingBox.from_aabb_scale(1)
key = jax.random.PRNGKey(1)
o0 = jnp.asarray([[0.5, 0.5, -0.8]]) + 0.01 * jax.random.normal(key, (R, 3))
d0 = jnp.asarray([[0.0, 0.0, 1.0]]) + 0.1 * jax.random.normal(jax.random.PRNGKey(2), (R, 3))
d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)

opts = renderer.RenderOptions(aabb_scale=1)

@jax.jit
def march_only(o, d):
    samples, aux = march.march_rays(
        o, d, grid.occupancy, aabb.min, aabb.max, jnp.asarray(0.0),
        t_start_min=0.05, k_samples=opts.k_samples, n_candidates=opts.n_candidates,
        density_grid=grid.density, use_grid_early_stop=True, selection="first", with_aux=True)
    return samples.t, samples.dt, samples.valid

@jax.jit
def eval_only(pos, dirs):
    rgb, sigma = model(params, pos.reshape(-1, 3), dirs.reshape(-1, 3))
    return rgb, sigma

@jax.jit
def full_chunk(o, d):
    rgba, depth = renderer._render_chunk(model, params, grid, o, d, opts,
                                         jnp.zeros(4), (), None)
    return rgba

def chain_bench(name, fn, *args, perturb=0, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    o = args[0]
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(o, *args[1:])
        lead = out[0] if isinstance(out, tuple) else out
        o = o + 1e-12 * jnp.mean(lead).astype(jnp.float32)  # dependency
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:9.2f} ms/chunk  -> 1080p({(2073600//R)} chunks): {dt*2073600/R:6.2f} s")
    return dt

chain_bench("march(K=32,cand=1024)", march_only, o0, d0)
pos = jax.random.uniform(jax.random.PRNGKey(3), (R * opts.k_samples, 3))
dirs = jax.random.normal(jax.random.PRNGKey(4), (R * opts.k_samples, 3))
dt_e = chain_bench(f"eval {R*opts.k_samples} samples", eval_only, pos, dirs)
print(f"   field eval rate: {R*opts.k_samples/dt_e/1e6:.2f} M samples/s")
chain_bench("full chunk (2 windows)", full_chunk, o0, d0)
