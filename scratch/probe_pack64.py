"""A/B the 64-lane packed brick gather (NERFSHOP_PACK64) on-chip.

probe_gather_landscape measured [2^19, w] uniform gathers at 52 (w=16) /
28 (w=32) / 198 (w=64) M rows/s — packing Pk=64/w brick rows per physical
row should ride the fast width.  Encoding-only + full-model chains at
N = 2^17 (the render sub-slab size), L16F2 (reference config) and L8F4.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network

N = 1 << 17


def timed_chain(label, fn, args, iters=10):
    def chain(iters):
        @jax.jit
        def run(*a):
            def body(i, carry):
                seed, acc = carry
                out = fn(seed, *a)
                s = jnp.zeros(())
                for leaf in jax.tree_util.tree_leaves(out):
                    s = s + jnp.sum(leaf.astype(jnp.float32)) % 32.0
                return (s * 1e-12) % 1e-4, acc + s % 7.0

            seed, acc = jax.lax.fori_loop(0, iters, body, (jnp.zeros(()), jnp.zeros(())))
            return seed + acc

        return run

    c1, cK = chain(1), chain(iters)
    float(np.asarray(c1(*args)))
    float(np.asarray(cK(*args)))
    t0 = time.perf_counter(); float(np.asarray(c1(*args))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(np.asarray(cK(*args))); tK = time.perf_counter() - t0
    dt = (tK - t1) / (iters - 1)
    print(f"{label:40s} {dt*1e3:8.3f} ms  ({N/dt/1e6:7.1f} M samples/s)", flush=True)


for L, F in ((16, 2), (8, 4)):
    cfg = default_nerf_config()
    cfg["encoding"]["n_levels"] = L
    cfg["encoding"]["n_features_per_level"] = F
    model = build_nerf_network(cfg, aabb_scale=1)
    params = model.init(jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(3), (N, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(4), (N, 3))
    for pk in ("0", "1"):
        os.environ["NERFSHOP_PACK64"] = pk

        def f(seed, pos, dirs):
            return model(params, jnp.clip(pos + seed, 0.0, 1.0), dirs)

        timed_chain(f"L{L} F{F} full model pack64={pk}", f, (pos, dirs))

# numerical parity
os.environ["NERFSHOP_PACK64"] = "0"
cfg = default_nerf_config()
model = build_nerf_network(cfg, aabb_scale=1)
params = model.init(jax.random.PRNGKey(0))
pos = jax.random.uniform(jax.random.PRNGKey(5), (4096, 3))
dirs = jax.random.uniform(jax.random.PRNGKey(6), (4096, 3))
r0, s0 = jax.jit(lambda p, d: model(params, p, d))(pos, dirs)
os.environ["NERFSHOP_PACK64"] = "1"
r1, s1 = jax.jit(lambda p, d: model(params, p, d), donate_argnums=())(pos + 0.0, dirs)
print("max |Δrgb|", float(jnp.abs(r0 - r1).max()), "max |Δσ|", float(jnp.abs(s0 - s1).max()), flush=True)
