"""Bisect the CURRENT per-level-2D sort-branch backward (mirrors
table_ops.make_brick_encode bwd verbatim), stage by stage."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.ops import table_ops

N = 1 << 18
Lb = 13
m = 1 << 19
F = 2
D = 3
C = 8
w = 16
G = 8
WB = 16
ITERS = 6
key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
IDX = jax.device_put(rng.integers(0, m, (Lb, N)).astype(np.int32))
W1 = jax.device_put(rng.uniform(0, 1, (Lb, N, D)).astype(np.float32))
DO = jax.device_put(rng.normal(size=(Lb, N, F)).astype(np.float32))
shifts = [0, 1, 2654435761 % m, (1 + 2654435761) % m, 805459861 % m,
          (1 + 805459861) % m, (2654435761 + 805459861) % m,
          (1 + 2654435761 + 805459861) % m]


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


def bwd(idx, w1, dout, stage):
    big = list(range(Lb))
    kb = jnp.stack([idx[l] for l in big])
    ops = (kb,) + tuple(w1[jnp.asarray(big), :, d] for d in range(D)) + tuple(
        dout[jnp.asarray(big), :, f] for f in range(F)
    )
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    kb_s = sorted_ops[0]
    acc = 0.0
    lanes = G * w
    for bi in range(Lb):
        kl = kb_s[bi]
        w1_l = jnp.stack([sorted_ops[1 + d][bi] for d in range(D)], axis=-1)
        d_l = jnp.stack([sorted_ops[1 + D + f][bi] for f in range(F)], axis=-1)
        w8_l = table_ops.corner_products(w1_l)
        ct = (w8_l[:, :, None] * d_l[:, None, :]).reshape(N, w)
        if stage == 0:
            acc += ct.sum() % 8.0
            continue
        j = (kl % G)[:, None]
        ct128 = jnp.concatenate([jnp.where(j == k, ct, 0.0) for k in range(G)], axis=-1)
        xb = ct128.reshape(N // WB, WB, lanes)
        bsum = xb.sum(axis=1)
        pre = jnp.cumsum(bsum, axis=0) - bsum
        cs = (jnp.cumsum(xb, axis=1) + pre[:, None, :]).reshape(N, lanes)
        if stage == 1:
            acc += cs[-1].sum() % 8.0 + cs.sum() % 4.0
            continue
        cs_ext = jnp.concatenate([jnp.zeros((1, lanes), cs.dtype), cs], axis=0)
        cs_ext = jax.lax.optimization_barrier(cs_ext)
        mg = m // G
        bins = -(-mg // 128) * 128
        counts = table_ops.exact_histogram(kl // G, bins)
        b = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(counts)])
        b = jax.lax.optimization_barrier(b.astype(jnp.int32)[: mg + 1])
        cb = jnp.take(cs_ext, b, axis=0)
        dB = jax.lax.optimization_barrier((cb[1:] - cb[:-1]).reshape(m, w))
        if stage == 2:
            acc += dB.sum() % 8.0
            continue
        g = dB.reshape(m, C, F)
        red = None
        for c, s in enumerate(shifts):
            gc = g[:, c, :]
            gc = gc if s == 0 else jnp.roll(gc, s, axis=0)
            red = gc if red is None else red + gc
        acc += red.sum() % 8.0
    return acc


def mk(stage):
    def make_fn(iters):
        @jax.jit
        def f(idx, w1, dout, k):
            def body(i, c):
                ii = (idx + c.astype(jnp.int32)) & (m - 1)
                return bwd(ii, w1, dout, stage) + c % 2.0

            return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

        return f

    return make_fn


for stage, label in [(0, "sort+rebuild ct"), (1, "+ct128+blocked cumsum"),
                     (2, "+hist+boundary+diff"), (3, "+corner reduce (full)")]:
    chain_time(f"bwd2 prefix: {label}", mk(stage), IDX, W1, DO)
