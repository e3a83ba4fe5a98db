"""Exact tiled 1080p render A/B: steady-state fps for the current f32
in-program brick build vs NERFSHOP_BF16_TABLES=1 (run twice, the knob is
read at trace time via env). Also sweeps k_samples granularity (32x2 slabs
vs 16x4) — finer buckets evaluate fewer dead slots on saturated scenes.

  env PYTHONPATH=/root/.axon_site:/root/repo JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    python -u scratch/probe_render_ab.py [k_samples n_windows]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import grid as grid_lib
from nerfshop_tpu.render import renderer

K = int(sys.argv[1]) if len(sys.argv) > 1 else 32
NW = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 15  # log2 of opts.chunk
TILE = int(sys.argv[4]) if len(sys.argv) > 4 else 8

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
opts = renderer.RenderOptions(aabb_scale=1, chunk=1 << CHUNK, k_samples=K, n_windows=NW)

warm = renderer.render_frame_tiled(model, params, grid, (W, H), jnp.asarray(xf0), focal, opts=opts, tile=TILE)
float(np.asarray(warm.rgba[0, 0, 0]))
times = []
for i in range(5):
    xf = xf0.copy()
    xf[0, 3] += 1e-3 * (i + 1)
    t0 = time.perf_counter()
    out = renderer.render_frame_tiled(model, params, grid, (W, H), jnp.asarray(xf), focal, opts=opts, tile=TILE)
    float(np.asarray(out.rgba[0, 0, 0]))
    times.append(time.perf_counter() - t0)
tag = "bf16" if os.environ.get("NERFSHOP_BF16_TABLES") == "1" else "f32 "
print(
    f"[{tag}] K={K} NW={NW} chunk=2^{CHUNK} tile={TILE}: best {1/min(times):.3f} fps ({min(times)*1e3:.0f} ms) "
    f"all={[round(t*1e3) for t in times]}",
    flush=True,
)
# sanity: mid-ball pixel must be lit identically-ish across variants
mid = np.asarray(out.rgba[H // 2, W // 2])
print("center rgba:", mid.round(4).tolist(), flush=True)
