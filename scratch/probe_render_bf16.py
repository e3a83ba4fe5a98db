"""A/B: exact tiled 1080p render with f32 vs bf16 brick tables.

The bf16-table negative result was recorded on the TRAIN step (cast cost
dominated); the render path re-uses params across frames so the cast could
be cached.  This probe measures whether the gather-bound eval phase gains
from halving table bytes at all — if yes, a cached cast is worth building.
"""
import os
import time

import numpy as np


def run(tag, precast=False):
    import jax
    import jax.numpy as jnp

    from nerfshop_tpu.config import default_nerf_config
    from nerfshop_tpu.models.nerf_network import build_nerf_network
    from nerfshop_tpu.ops import grid as grid_lib
    from nerfshop_tpu.render import renderer

    # fresh caches per variant (compiled fns capture the encoding closure)
    renderer._CHUNK_FN_CACHE.clear()
    renderer._CULL_FN_CACHE.clear()
    renderer._RAYS_FN_CACHE.clear()
    renderer._TILED_FIELDS_CACHE.clear()

    model = build_nerf_network(default_nerf_config(), aabb_scale=1)
    params = model.init(jax.random.PRNGKey(0))
    if precast:
        # cast the grid table ONCE outside the program: the in-program cast
        # disappears (feat_dtype == table.dtype) and gathers read half bytes
        params = dict(params)
        params["pos_encoding"] = dict(params["pos_encoding"])
        params["pos_encoding"]["table"] = params["pos_encoding"]["table"].astype(jnp.bfloat16)
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
    opts = renderer.RenderOptions(aabb_scale=1, chunk=1 << 13)

    warm = renderer.render_frame_tiled(model, params, grid, (W, H), jnp.asarray(xf0), focal, opts=opts)
    ref_px = float(np.asarray(warm.rgba[540 // 8 * 0 + 100, 960, 0])) if False else None
    mid = np.asarray(warm.rgba[500:580, 920:1000, :3])
    float(np.asarray(warm.rgba[0, 0, 0]))
    times = []
    for i in range(4):
        xf = xf0.copy()
        xf[0, 3] += 1e-3 * (i + 1)
        t0 = time.perf_counter()
        out = renderer.render_frame_tiled(model, params, grid, (W, H), jnp.asarray(xf), focal, opts=opts)
        float(np.asarray(out.rgba[0, 0, 0]))
        times.append(time.perf_counter() - t0)
    print(f"{tag}: {1/min(times):.3f} fps ({min(times)*1e3:.0f} ms) mid-mean {mid.mean():.6f}", flush=True)
    return mid


os.environ["NERFSHOP_BF16_TABLES"] = "0"
mid_a = run("f32 tables")
os.environ["NERFSHOP_BF16_TABLES"] = "1"
mid_b = run("bf16 tables (in-program cast)")
err = np.abs(mid_a - mid_b).max()
print(f"max |Δrgb| f32 vs bf16-cast: {err:.6f}", flush=True)
mid_c = run("bf16 tables (pre-cast params)", precast=True)
err = np.abs(mid_a - mid_c).max()
print(f"max |Δrgb| f32 vs bf16-precast: {err:.6f}", flush=True)
