"""Gathers are row-count-bound (~146 M rows/s correlated): L=16/F=2 pays 16
rows/sample.  Same 32 output features at L=8/F=4 pays 8 — candidate 2x on
the gather-bound field eval AND halves the backward's sorted levels.

Rates for configs {L16F2 (reference), L8F4, L8F2, L4F8} at N=2^16:
full-model eval chain + full-grads chain (same consume-everything rig).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import composite as comp

N = 1 << 16


def chain_eval(model, params, iters):
    @jax.jit
    def run(pos, dirs):
        def body(i, carry):
            seed, acc = carry
            rgb, sig = model(params, jnp.clip(pos + seed, 0.0, 1.0), dirs)
            s = jnp.sum(rgb) % 32.0 + jnp.sum(sig) % 32.0
            return (s * 1e-12) % 1e-4, acc + s % 7.0

        seed, acc = jax.lax.fori_loop(0, iters, body, (jnp.zeros(()), jnp.zeros(())))
        return seed + acc

    return run


def chain_grads(model, params, iters):
    def loss(p, pos, dirs):
        rgb, sig = model(p, pos, dirs)
        return jnp.mean((rgb - 0.5) ** 2) + jnp.mean(sig**2) * 1e-6

    @jax.jit
    def run(pos, dirs):
        def body(i, carry):
            seed, acc = carry
            g = jax.grad(loss)(params, jnp.clip(pos + seed, 0.0, 1.0), dirs)
            s = jnp.zeros(())
            for leaf in jax.tree_util.tree_leaves(g):
                s = s + jnp.sum(leaf) % 32.0
            return (s * 1e-12) % 1e-4, acc + s % 7.0

        seed, acc = jax.lax.fori_loop(0, iters, body, (jnp.zeros(()), jnp.zeros(())))
        return seed + acc

    return run


def timeit(label, mk, iters=10):
    pos = jax.random.uniform(jax.random.PRNGKey(3), (N, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(4), (N, 3))
    c1, cK = mk(1), mk(iters)
    float(np.asarray(c1(pos, dirs)))
    float(np.asarray(cK(pos, dirs)))
    t0 = time.perf_counter(); float(np.asarray(c1(pos, dirs))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(np.asarray(cK(pos, dirs))); tK = time.perf_counter() - t0
    dt = (tK - t1) / (iters - 1)
    print(f"{label:28s} {dt*1e3:8.2f} ms  ({N/dt/1e6:7.1f} M samples/s)", flush=True)


for L, F in ((8, 4), (4, 8)):
    cfg = default_nerf_config()
    cfg["encoding"]["n_levels"] = L
    cfg["encoding"]["n_features_per_level"] = F
    model = build_nerf_network(cfg, aabb_scale=1)
    params = model.init(jax.random.PRNGKey(0))
    timeit(f"L{L} F{F} eval", lambda it: chain_eval(model, params, it))
