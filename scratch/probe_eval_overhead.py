"""Decompose the tile-eval dispatch: where does the in-render eval lose ~2x
vs the isolated field-eval chain (13.5 M samples/s)?

All timings are in-program dependency chains (lax.fori_loop, outputs
consumed into the carry, one element materialized on host) so the relay can
neither memoize nor DCE.  t(K)-t(1) differencing cancels dispatch overhead.

Pieces, all at the render shape (Tc=128 tiles x P=64 px x bs=64 slots
= 524288 samples, 2 slabs of 32):
  A. bare model eval, 2 calls of 262144 (as the slab loop does)
  B. bare model eval, 1 call of 524288 (slab fusion candidate)
  C. full _eval_tile_chunk (rays + warp + eval + composite)
  D. _eval_tile_chunk with a free-field stand-in (overhead only)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.render import renderer

model = build_nerf_network(default_nerf_config(), aabb_scale=1)
params = model.init(jax.random.PRNGKey(0))
opts = renderer.RenderOptions(aabb_scale=1, chunk=1 << 13)

Tc, P, BS = 128, 64, 64
R = Tc * P
N = R * BS // 2  # per-slab sample count = 262144

key = jax.random.PRNGKey(1)
o = jax.random.uniform(key, (Tc, P, 3)) * 0.2 + 0.4
d0 = jax.random.normal(jax.random.PRNGKey(2), (Tc, P, 3))
d = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
t_slots = jnp.cumsum(jnp.full((Tc, BS), 0.01), axis=1)
dt_slots = jnp.full((Tc, BS), 0.01)
v_slots = jnp.ones((Tc, BS), bool)
bg = jnp.zeros((4,))


def chain(fn, iters, *args):
    @jax.jit
    def run(*args):
        def body(i, carry):
            seed, acc = carry
            out = fn(seed, *args)
            s = 0.0
            for leaf in jax.tree_util.tree_leaves(out):
                s = s + jnp.sum(leaf.astype(jnp.float32)) % 32.0
            return (s * 1e-9) % 1e-3, acc + s % 7.0

        seed, acc = jax.lax.fori_loop(0, iters, body, (jnp.zeros(()), jnp.zeros(())))
        return seed + acc

    return run


def timeit(label, fn, *args, iters=8):
    c1, cK = chain(fn, 1, *args), chain(fn, iters, *args)
    float(np.asarray(c1(*args)))
    float(np.asarray(cK(*args)))
    t0 = time.perf_counter(); float(np.asarray(c1(*args))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(np.asarray(cK(*args))); tK = time.perf_counter() - t0
    dt = (tK - t1) / (iters - 1)
    print(f"{label:50s} {dt*1e3:8.2f} ms  ({R*BS/dt/1e6:7.1f} M samples/s)", flush=True)
    return dt


# A. two slab-size model evals (chained)
pos_a = jax.random.uniform(jax.random.PRNGKey(3), (N, 3))
dir_a = jax.random.uniform(jax.random.PRNGKey(4), (N, 3))


def two_evals(seed, pos, dirs):
    rgb1, s1 = model(params, jnp.clip(pos + seed, 0.0, 1.0), dirs)
    rgb2, s2 = model(params, jnp.clip(pos + seed + 1e-6, 0.0, 1.0), dirs)
    return rgb1, s1, rgb2, s2


timeit("A: 2x model eval 262144", two_evals, pos_a, dir_a)

# B. one 524288 eval
pos_b = jax.random.uniform(jax.random.PRNGKey(5), (2 * N, 3))
dir_b = jax.random.uniform(jax.random.PRNGKey(6), (2 * N, 3))


def one_eval(seed, pos, dirs):
    return model(params, jnp.clip(pos + seed, 0.0, 1.0), dirs)


timeit("B: 1x model eval 524288", one_eval, pos_b, dir_b)


# C. full eval_tile_chunk
def full_chunk(seed, o, d, t_s, dt_s, v_s):
    return renderer._eval_tile_chunk(
        model, params, o + seed, d, t_s, dt_s, v_s, opts, bg
    )


timeit("C: _eval_tile_chunk 128x64x64", full_chunk, o, d, t_slots, dt_slots, v_slots)


# D. overhead-only: same plumbing, free field
class FreeModel:
    def __call__(self, params, pos, dirs, extra=None):
        return pos, jnp.sum(pos, -1)

    def density(self, params, pos):
        return jnp.sum(pos, -1)


free = FreeModel()


def free_chunk(seed, o, d, t_s, dt_s, v_s):
    return renderer._eval_tile_chunk(
        free, params, o + seed, d, t_s, dt_s, v_s, opts, bg
    )


timeit("D: _eval_tile_chunk free field (overhead)", free_chunk, o, d, t_slots, dt_slots, v_slots)
