"""A/B the bake path (prebuilt brick tables f32 vs bf16): bake_volume 256³
wall time, warm executables, fresh params offsets per rep so the relay
cannot memoize."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import coords
from nerfshop_tpu.render import baked

model = build_nerf_network(default_nerf_config(), aabb_scale=1)
params = model.init(jax.random.PRNGKey(0))
aabb = coords.BoundingBox.from_aabb_scale(1)


def bake_once(eps):
    p = {**params, "pos_encoding": {"table": params["pos_encoding"]["table"] + eps}}
    t0 = time.perf_counter()
    vol = baked.bake_volume(model, p, aabb, resolution=256)
    jax.block_until_ready(vol.fields[0])
    float(np.asarray(vol.fields[0][0, 0, 0, 0]))
    return time.perf_counter() - t0


bake_once(0.0)  # warm/compile
ts = [bake_once(1e-8 * (i + 1)) for i in range(3)]
print(f"bake 256^3: {min(ts)*1e3:.0f} ms (runs: {[f'{t*1e3:.0f}' for t in ts]})", flush=True)
