"""Field-eval rate vs batch size + encoding/MLP decomposition.

The tile-eval dispatch is ~95% bare field eval (probe_eval_overhead: C 60.8
vs A 57.4 vs D 0.5 ms), so exact-render fps == field eval rate.  Find:
  1. rate(N) for N in 2^15..2^19  (B at 2^19 was 2.3x WORSE than 2x 2^18)
  2. encoding-only vs density-MLP vs full model at the best N
  3. density-only path rate (fewer MLP flops, same gathers)
Chains consume all outputs; t(K)-t(1) differencing.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network

model = build_nerf_network(default_nerf_config(), aabb_scale=1)
params = model.init(jax.random.PRNGKey(0))
enc = model.pos_encoding


def chain(fn, iters):
    @jax.jit
    def run(pos, dirs):
        def body(i, carry):
            seed, acc = carry
            out = fn(jnp.clip(pos + seed, 0.0, 1.0), dirs)
            s = jnp.zeros(())
            for leaf in jax.tree_util.tree_leaves(out):
                s = s + jnp.sum(leaf.astype(jnp.float32)) % 32.0
            return (s * 1e-12) % 1e-4, acc + s % 7.0

        seed, acc = jax.lax.fori_loop(0, iters, body, (jnp.zeros(()), jnp.zeros(())))
        return seed + acc

    return run


def timeit(label, fn, n, iters=12):
    pos = jax.random.uniform(jax.random.PRNGKey(3), (n, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(4), (n, 3))
    c1, cK = chain(fn, 1), chain(fn, iters)
    float(np.asarray(c1(pos, dirs)))
    float(np.asarray(cK(pos, dirs)))
    t0 = time.perf_counter(); float(np.asarray(c1(pos, dirs))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(np.asarray(cK(pos, dirs))); tK = time.perf_counter() - t0
    dt = (tK - t1) / (iters - 1)
    print(f"{label:44s} {dt*1e3:8.2f} ms  ({n/dt/1e6:7.1f} M samples/s)", flush=True)
    return dt


full = lambda p, d: model(params, p, d)
dens = lambda p, d: model.density(params, p)
encf = lambda p, d: enc.apply(params["pos_encoding"], p)

for n in (1 << 15, 1 << 16, 1 << 17, 1 << 18):
    timeit(f"full model  N=2^{n.bit_length()-1}", full, n)
print(flush=True)
N = 1 << 17
timeit("encoding only", encf, N)
timeit("density only (enc + density MLP)", dens, N)
timeit("full (enc + density + SH + rgb MLP)", full, N)
