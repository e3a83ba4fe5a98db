"""In-program chained timing of the NEW fused brick encode (fwd / fwd+bwd)
at real NGP level sizes, batch 2^18."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import table_ops

model = build_nerf_network(default_nerf_config(), aabb_scale=1)
enc = model.pos_encoding
params = model.init(jax.random.PRNGKey(0))
table = params["pos_encoding"]["table"]
print("levels", enc.level_sizes, flush=True)

N = 1 << 18
ITERS = 6
key = jax.random.PRNGKey(1)
x0 = jax.device_put(np.random.default_rng(0).uniform(0, 1, (N, 3)).astype(np.float32))


def chain_time(name, make_fn, *args):
    f_many = make_fn(ITERS)
    f_one = make_fn(1)
    ks = jax.random.split(key, 4)
    float(np.asarray(f_many(*args, ks[0])))
    float(np.asarray(f_one(*args, ks[1])))
    t0 = time.perf_counter()
    float(np.asarray(f_one(*args, ks[2])))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(f_many(*args, ks[3])))
    t_many = time.perf_counter() - t0
    per = (t_many - t_one) / (ITERS - 1)
    print(f"{name:44s} {per*1e3:8.2f} ms  (1-iter {t_one*1e3:6.1f} ms)", flush=True)
    return per


def mk_fwd(iters):
    @jax.jit
    def f(table, x, k):
        def body(i, c):
            xx = jnp.clip(x + c * 1e-12, 0.0, 1.0)
            out = enc.apply({"table": table}, xx)
            return out.sum() % 32.0 + 0.5

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


def mk_bwd(iters):
    @jax.jit
    def f(table, x, k):
        def body(i, c):
            xx = jnp.clip(x + c * 1e-12, 0.0, 1.0)

            def loss(t):
                return (enc.apply({"table": t}, xx) ** 2).sum()

            g = jax.grad(loss)(table)
            return g.sum() % 32.0 + 0.5

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


def mk_branch(iters, which):
    idx0, w10 = enc._brick_fracs(x0)
    idx0 = jax.device_put(np.asarray(idx0))
    w10 = jax.device_put(np.asarray(w10))
    if which == "sort":
        sizes = [m for m in enc.level_sizes if m > (1 << 15)]
        lsel = [l for l, m in enumerate(enc.level_sizes) if m > (1 << 15)]
    else:
        sizes = [m for m in enc.level_sizes if m <= (1 << 15)]
        lsel = [l for l, m in enumerate(enc.level_sizes) if m <= (1 << 15)]
    offs = [0]
    for m in sizes:
        offs.append(offs[-1] + m)
    shifts = [enc._brick_shifts[l] for l in lsel]
    sub_encode = table_ops.make_brick_encode(
        sizes, offs, shifts, enc.n_features_per_level, 3,
        force_segment=True,
        matmul_max=(0 if which == "sort" else 1 << 15),
    )
    sub_table = jax.device_put(np.random.default_rng(1).uniform(-1e-4, 1e-4, (offs[-1], 2)).astype(np.float32))
    sub_idx = jnp.stack([idx0[l] for l in lsel])
    sub_w1 = jnp.stack([w10[l] for l in lsel])

    @jax.jit
    def f(table, idx, w1, k):
        def body(i, c):
            w8 = table_ops.corner_products(w1 + c * 1e-30)

            def loss(t):
                return (sub_encode(t, idx, w8, w1) ** 2).sum()

            return jax.grad(loss)(table).sum() % 32.0 + 0.5

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return lambda t, k: f(sub_table, sub_idx, sub_w1, k)


chain_time("enc2 fwd 2^18", mk_fwd, table, x0)
chain_time("enc2 fwd+bwd 2^18", mk_bwd, table, x0)
chain_time("enc2 sort-branch f+b (13 lvls)", lambda it: mk_branch(it, "sort"), table)
chain_time("enc2 matmul-branch f+b (3 lvls)", lambda it: mk_branch(it, "matmul"), table)
