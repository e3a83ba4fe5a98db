"""Per-phase wall time of the exact tiled 1080p render: wraps the cached
compiled fns (cull / tile-march / tile-eval buckets) with blocking timers.
Blocking serializes the dispatch pipeline, so the TOTAL is inflated vs a
free-running frame — read the RELATIVE phase split, and compare the
free-running fps printed first."""
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

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
opts = renderer.RenderOptions(aabb_scale=1, chunk=1 << 13)

# warm + free-running fps
warm = renderer.render_frame_tiled(model, params, grid, (W, H), jnp.asarray(xf0), focal, opts=opts)
float(np.asarray(warm.rgba[0, 0, 0]))
times = []
for i in range(3):
    xf = xf0.copy()
    xf[0, 3] += 1e-3 * (i + 1)
    t0 = time.perf_counter()
    out = renderer.render_frame_tiled(model, params, grid, (W, H), jnp.asarray(xf), focal, opts=opts)
    float(np.asarray(out.rgba[0, 0, 0]))
    times.append(time.perf_counter() - t0)
print(f"free-running: {1/min(times):.3f} fps ({min(times)*1e3:.0f} ms)", flush=True)

# instrument: every cached compiled fn gets a blocking timer
phase_t = defaultdict(float)
phase_n = defaultdict(int)
orig_call = renderer._AotOnFirstCall.__call__


def make_timed(label_of):
    def timed(self, *args):
        t0 = time.perf_counter()
        out = orig_call(self, *args)
        jax.block_until_ready(out)
        lbl = label_of(self)
        phase_t[lbl] += time.perf_counter() - t0
        phase_n[lbl] += 1
        return out

    return timed


labels = {}
for k, v in list(renderer._CULL_FN_CACHE.items()):
    labels[id(v)] = "cull"
for k, v in list(renderer._CHUNK_FN_CACHE.items()):
    tag = [p for p in k if isinstance(p, str)]
    bs = [p for p in k if isinstance(p, int) and p in (32, 64, 96, 128)]
    labels[id(v)] = f"{'/'.join(tag)}{':' + str(bs[-1]) if tag and tag[0]=='tile-eval' and bs else ''}"

renderer._AotOnFirstCall.__call__ = make_timed(lambda s: labels.get(id(s), "other"))

xf = xf0.copy()
xf[0, 3] += 0.005
t0 = time.perf_counter()
out = renderer.render_frame_tiled(model, params, grid, (W, H), jnp.asarray(xf), focal, opts=opts)
float(np.asarray(out.rgba[0, 0, 0]))
total = time.perf_counter() - t0
renderer._AotOnFirstCall.__call__ = orig_call

print(f"blocking frame total: {total*1e3:.0f} ms", flush=True)
for k in sorted(phase_t, key=lambda k: -phase_t[k]):
    print(f"  {k:24s} {phase_t[k]*1e3:8.1f} ms  x{phase_n[k]}", flush=True)
acc = sum(phase_t.values())
print(f"  {'(python/other)':24s} {(total-acc)*1e3:8.1f} ms", flush=True)
