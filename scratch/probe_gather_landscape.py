"""Map the v5e gather landscape that produced the wild config spread
(L16F2 12.3, L8F4 5.9, L4F8 29.5 M samples/s at N=2^16):

  1. raw jnp.take rate from a materialized [m, w] table, w in {16,32,64,128},
     m = 2^19, uniform-random indices, N = 2^16  (rows/s vs row width)
  2. same at m = 2^16 (table-size effect)
  3. encoding-only chains for the three configs (is the spread in the
     encoding, or in MLP/layout interactions?)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network

N = 1 << 16


def timed_chain(label, fn, args, iters=12, per_row=None):
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
    extra = f"  ({per_row/dt/1e6:7.1f} M rows/s)" if per_row else ""
    print(f"{label:34s} {dt*1e3:8.3f} ms{extra}", flush=True)


# --- 1+2: raw gather
for m in (1 << 19, 1 << 16):
    for w in (16, 32, 64, 128):
        table = jax.random.uniform(jax.random.PRNGKey(0), (m, w))
        idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, m)

        def g(seed, table, idx):
            # perturb indices per iteration so the relay can't memoize and
            # XLA can't hoist; stays uniform-random
            i2 = (idx + (seed * 1e6).astype(jnp.int32)) % table.shape[0]
            return jnp.take(table, i2, axis=0)

        timed_chain(f"take [{m},{w}] N=2^16 random", g, (table, idx), per_row=N)

# --- 3: encoding-only per config
for L, F in ((16, 2), (8, 4), (4, 8)):
    cfg = default_nerf_config()
    cfg["encoding"]["n_levels"] = L
    cfg["encoding"]["n_features_per_level"] = F
    model = build_nerf_network(cfg, aabb_scale=1)
    params = model.init(jax.random.PRNGKey(0))
    enc = model.pos_encoding
    pos = jax.random.uniform(jax.random.PRNGKey(3), (N, 3))

    def e(seed, pos):
        return enc.apply(params["pos_encoding"], jnp.clip(pos + seed, 0.0, 1.0))

    timed_chain(f"encoding-only L{L} F{F}", e, (pos,), per_row=N * L)
