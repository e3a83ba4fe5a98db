"""Bisect the sort-branch backward: run progressively longer prefixes of the
exact bwd composition (sort -> ct128+cumsum -> hist+boundary+diff ->
corner-reduce) as standalone programs, in-program chained."""
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


def bwd_prefix(idx, w1, dout, stage):
    big = list(range(Lb))
    kb = jnp.stack([idx[l] for l in big])
    ops = (kb,) + tuple(w1[jnp.asarray(big), :, d] for d in range(D)) + tuple(
        dout[jnp.asarray(big), :, f] for f in range(F)
    )
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    if stage == 0:
        return sum((o * 1.0).sum() % 16.0 for o in sorted_ops[1:])
    kb_s = sorted_ops[0]
    w1_s = jnp.stack(sorted_ops[1:1 + D], axis=-1)
    d_s = jnp.stack(sorted_ops[1 + D:], axis=-1)
    w8_s = table_ops.corner_products(w1_s)
    ct_s = (w8_s[..., :, None] * d_s[..., None, :]).reshape(Lb, N, w)
    if stage == 1:
        return ct_s.sum() % 16.0
    j = (kb_s % G)[..., None]
    ct128 = jnp.concatenate([jnp.where(j == k, ct_s, 0.0) for k in range(G)], axis=-1)
    cs = jnp.cumsum(ct128, axis=1)
    if stage == 2:
        return cs[:, -1].sum() % 16.0 + cs.sum() % 4.0
    cs_ext = jnp.concatenate([jnp.zeros((Lb, 1, 128), cs.dtype), cs], axis=1)
    dBs = []
    for bi in range(Lb):
        mg = m // G
        counts = table_ops.exact_histogram(kb_s[bi] // G, mg)
        b = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(counts)])
        b = jax.lax.optimization_barrier(b.astype(jnp.int32)[: mg + 1])
        cs_l = jax.lax.optimization_barrier(cs_ext[bi])
        cb = jnp.take(cs_l, b, axis=0)
        dBs.append((cb[1:] - cb[:-1]).reshape(m, w))
    if stage == 3:
        return sum(dB.sum() % 16.0 for dB in dBs)
    outs = []
    for dB in dBs:
        g = dB.reshape(m, C, F)
        acc = None
        for c, s in enumerate(shifts):
            gc = g[:, c, :]
            gc = gc if s == 0 else jnp.roll(gc, s, axis=0)
            acc = gc if acc is None else acc + gc
        outs.append(acc)
    return sum(o.sum() % 16.0 for o in outs)


def mk(stage):
    def make_fn(iters):
        @jax.jit
        def f(idx, w1, dout, k):
            def body(i, c):
                ii = (idx + c.astype(jnp.int32)) & (m - 1)
                return bwd_prefix(ii, w1, dout, stage) + c % 2.0

            return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

        return f

    return make_fn


for stage, label in [(0, "sort only"), (1, "+rebuild ct"), (2, "+ct128+cumsum"),
                     (3, "+hist+boundary+diff"), (4, "+corner reduce (full)")]:
    chain_time(f"bwd prefix: {label}", mk(stage), IDX, W1, DO)
