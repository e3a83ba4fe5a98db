"""A/B the brick-encode backward's sort stage on chip.

Current bwd: ONE batched lax.sort over [Lb, N] with 6 operands
(key + 3 w1 cols + 2 dout cols) — 24 B/element through the bitonic network.
Variant: sort (key, iota) only (8 B/element), then permute the 5 payload
columns with take_along_axis (narrow batched gathers from ~1 MB operands).

In-program chains (fori_loop, iteration feeds the next), t(K)-t(1).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 18
LB = 10  # big levels in the default config
M = 1 << 19
ITERS = 8


def chain(body, iters):
    @jax.jit
    def run(key0, payloads):
        def f(i, carry):
            k, acc = carry
            out, nxt = body(k, payloads)
            return nxt, acc + out

        k, acc = jax.lax.fori_loop(0, iters, f, (key0, jnp.zeros(())))
        return k[0, 0] + acc

    return run


def bench(name, body, key0, payloads):
    c1, cK = chain(body, 1), chain(body, ITERS)
    float(np.asarray(c1(key0, payloads)))
    float(np.asarray(cK(key0, payloads)))
    k1 = (key0 * 7 + 1) % M
    t0 = time.perf_counter()
    float(np.asarray(c1(k1, payloads)))
    t1 = time.perf_counter() - t0
    k2 = (key0 * 11 + 3) % M
    t0 = time.perf_counter()
    float(np.asarray(cK(k2, payloads)))
    tK = time.perf_counter() - t0
    dt = (tK - t1) / (ITERS - 1)
    print(f"{name:36s} {dt*1e3:8.2f} ms", flush=True)
    return dt


key = jax.random.PRNGKey(0)
kb0 = jax.random.randint(key, (LB, N), 0, M, jnp.int32)
pls = tuple(jax.random.uniform(jax.random.fold_in(key, i), (LB, N)) for i in range(5))


def next_key(si):
    return (si * 1664525 + 1013904223) % M


def form_multi(kb, payloads):
    ops = (kb,) + payloads
    s = jax.lax.sort(ops, dimension=1, num_keys=1)
    out = sum(x[:, :128].sum() for x in s[1:]) + s[0][:, :128].sum()
    return out.astype(jnp.float32), next_key(s[0])


def form_iota_gather(kb, payloads):
    iota = jax.lax.broadcasted_iota(jnp.int32, (LB, N), 1)
    si, perm = jax.lax.sort_key_val(kb, iota, dimension=1)
    perm = jax.lax.optimization_barrier(perm)
    out = si[:, :128].sum().astype(jnp.float32)
    for p in payloads:
        p = jax.lax.optimization_barrier(p)
        ps = jnp.take_along_axis(p, perm, axis=1)
        out = out + ps[:, :128].sum()
    return out, next_key(si)


def form_key_only(kb, payloads):
    si = jax.lax.sort(kb, dimension=1)
    return si[:, :128].sum().astype(jnp.float32), next_key(si)


def form_sort_kv(kb, payloads):
    iota = jax.lax.broadcasted_iota(jnp.int32, (LB, N), 1)
    si, perm = jax.lax.sort_key_val(kb, iota, dimension=1)
    return (si[:, :128].sum() + perm[:, :128].sum()).astype(jnp.float32), next_key(si)


bench("key-only sort [10,N]", form_key_only, kb0, ())
bench("sort key+iota", form_sort_kv, kb0, ())
bench("sort 6-operand (current)", form_multi, kb0, pls)
bench("sort key+iota, 5x take_along_axis", form_iota_gather, kb0, pls)
