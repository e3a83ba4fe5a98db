"""Frame-level A/B of RenderOptions.eval_slab (32 = old behavior, 16 = new
sub-slab/bucket granularity) on the 1080p bench ball, chunk 2^13."""
import time

import numpy as np


def run(es):
    import jax
    import jax.numpy as jnp

    from nerfshop_tpu.config import default_nerf_config
    from nerfshop_tpu.models.nerf_network import build_nerf_network
    from nerfshop_tpu.ops import grid as grid_lib
    from nerfshop_tpu.render import renderer

    model = build_nerf_network(default_nerf_config(), aabb_scale=1)
    params = model.init(jax.random.PRNGKey(0))
    grid = grid_lib.OccupancyGrid.create(1)
    g = (np.arange(128) + 0.5) / 128
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    occ = ((xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2) < 0.2**2
    grid = grid._replace(
        occupancy=jnp.asarray(occ[None]),
        density=jnp.where(jnp.asarray(occ[None]), 5.0, 0.0),
    )
    W, H = 1920, 1080
    xf0 = np.asarray([[1.0, 0, 0, 0.5], [0, 1, 0, 0.5], [0, 0, 1.0, -0.8]], np.float32)
    focal = jnp.asarray([H * 1.2, H * 1.2])
    opts = renderer.RenderOptions(aabb_scale=1, chunk=1 << 13, eval_slab=es)

    warm = renderer.render_frame_tiled(model, params, grid, (W, H), jnp.asarray(xf0), focal, opts=opts)
    mid = np.asarray(warm.rgba[500:580, 920:1000, :3])
    times = []
    for i in range(4):
        xf = xf0.copy()
        xf[0, 3] += 1e-3 * (i + 1)
        t0 = time.perf_counter()
        out = renderer.render_frame_tiled(model, params, grid, (W, H), jnp.asarray(xf), focal, opts=opts)
        float(np.asarray(out.rgba[0, 0, 0]))
        times.append(time.perf_counter() - t0)
    print(f"eval_slab={es}: {1/min(times):.3f} fps ({min(times)*1e3:.0f} ms)", flush=True)
    return mid


m32 = run(32)
m16 = run(16)
print("max |Δrgb| center crop:", float(np.abs(m32 - m16).max()), flush=True)
