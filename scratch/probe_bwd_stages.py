"""In-program-chained timing of the brick-encode forward, full fwd+bwd
(jax.vjp), and the isolated group-segsum stage — to locate the ~64 ms the
train step spends in the encoding backward (r3 breakdown).

Chains: iteration i+1's indices derive from iteration i's outputs; timing by
t(K)-t(1) differencing so relay dispatch overhead cancels.
"""
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

N = 1 << 18
L = enc.n_levels
D = enc.n_input_dims
C = 1 << D
F = enc.n_features_per_level
w = C * F
sizes = enc.level_sizes
ITERS = 6

encode = table_ops.make_brick_encode(
    enc.level_sizes, enc.level_offsets, enc._brick_shifts, F, D, force_segment=True
)

# per-run salt: the relay memoizes identical (program, args) ACROSS
# processes, so fixed seeds make rerun timings bogus (instant replay)
import os as _os

_SALT = int(_os.environ.get("PROBE_SALT", str(int(time.time()) % 100000)))
key = jax.random.PRNGKey(1 + _SALT)
idx0 = jnp.stack(
    [jax.random.randint(jax.random.fold_in(key, l), (N,), 0, m) for l, m in enumerate(sizes)]
)
w1_0 = jax.random.uniform(jax.random.fold_in(key, 99), (L, N, D))
dout0 = jax.random.normal(jax.random.fold_in(key, 98), (L, N, F))
msizes = jnp.asarray(sizes, jnp.int32)[:, None]


def next_idx(idx, seed_rows):
    h = (jnp.sum(seed_rows) * 1e-2).astype(jnp.int32)
    return (idx * 1664525 + h + 1013904223) % msizes


def chain(body, iters):
    @jax.jit
    def run(idx0, w1, dout, table):
        def f(i, carry):
            idx, acc = carry
            out, nxt = body(idx, w1, dout, table)
            return nxt, acc + out

        idx, acc = jax.lax.fori_loop(0, iters, f, (idx0, jnp.zeros(())))
        return idx[0, 0].astype(jnp.float32) + acc

    return run


def bench(name, body):
    c1, cK = chain(body, 1), chain(body, ITERS)
    float(np.asarray(c1(idx0, w1_0, dout0, table)))
    float(np.asarray(cK(idx0, w1_0, dout0, table)))
    i1 = (idx0 * 7 + 5) % msizes
    t0 = time.perf_counter()
    float(np.asarray(c1(i1, w1_0, dout0, table)))
    t1 = time.perf_counter() - t0
    i2 = (idx0 * 13 + 11) % msizes
    t0 = time.perf_counter()
    float(np.asarray(cK(i2, w1_0, dout0, table)))
    tK = time.perf_counter() - t0
    dt = (tK - t1) / (ITERS - 1)
    print(f"{name:40s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def fwd_only(idx, w1, dout, table):
    w8 = table_ops.corner_products(w1)
    out = encode(table, idx, w8, w1)
    return jnp.sum(out[0, :128]), next_idx(idx, out[0, :128, 0])


def fwd_bwd(idx, w1, dout, table):
    w8 = table_ops.corner_products(w1)

    def f(tab):
        return jnp.sum(encode(tab, idx, w8, w1) * dout)

    val, dT = jax.value_and_grad(f)(table)
    return val, next_idx(idx, dT[:128, 0] + val)


# the isolated big-level segsum (sort + group pipeline), replicating bwd's
# structure without the fwd or corner reduction
def segsum_only(idx, w1, dout, table):
    big = list(range(L))
    kb = idx
    ops = (kb,) + tuple(w1[:, :, d] for d in range(D)) + tuple(dout[:, :, f] for f in range(F))
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    kb_s = sorted_ops[0]
    G = 128 // w
    lanes = G * w
    WB = 16
    LG = 4
    acc = jnp.zeros(())
    for g0 in range(0, L, LG):
        grp = big[g0 : g0 + LG]
        ng = len(grp)
        kg = kb_s[g0 : g0 + ng]
        w1_g = jnp.stack([sorted_ops[1 + d][g0 : g0 + ng] for d in range(D)], axis=-1)
        d_g = jnp.stack([sorted_ops[1 + D + f][g0 : g0 + ng] for f in range(F)], axis=-1)
        w8_g = table_ops.corner_products(w1_g)
        ct_s = (w8_g[..., :, None] * d_g[..., None, :]).reshape(ng, N, w)
        ct_s = jax.lax.optimization_barrier(ct_s)
        j = (kg % G)[..., None]
        ct128 = jnp.concatenate([jnp.where(j == k, ct_s, 0.0) for k in range(G)], axis=-1)
        ct128 = jax.lax.optimization_barrier(ct128)
        xb = ct128.reshape(ng, N // WB, WB, lanes)
        bsum = xb.sum(axis=2)
        pre = jnp.cumsum(bsum, axis=1) - bsum
        cs = (jnp.cumsum(xb, axis=2) + pre[:, :, None, :]).reshape(ng, N, lanes)
        cs_ext = jnp.concatenate([jnp.zeros((ng, 1, lanes), cs.dtype), cs], axis=1)
        bins_g = max(-(-(sizes[l] // G) // 128) * 128 for l in grp)
        kgc = kg // G
        Hh = bins_g // 128
        Ah = ((kgc >> 7)[..., None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, Hh), 2)).astype(jnp.bfloat16)
        Bl = ((kgc & 127)[..., None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)).astype(jnp.bfloat16)
        counts_g = jnp.einsum("gnh,gnl->ghl", Ah, Bl, preferred_element_type=jnp.float32).reshape(ng, bins_g)
        for gi, l in enumerate(grp):
            m = sizes[l]
            mg = m // G
            counts = counts_g[gi]
            b = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(counts)])
            b = jax.lax.optimization_barrier(b.astype(jnp.int32)[: mg + 1])
            cs_l = jax.lax.optimization_barrier(cs_ext[gi])
            cb = jnp.take(cs_l, b, axis=0)
            acc = acc + jnp.sum(cb[-1] - cb[0])
    return acc, next_idx(idx, kb_s[0, :128].astype(jnp.float32))


# segsum sub-stages
def sort_ct128_cumsum(idx, w1, dout, table):
    ops = (idx,) + tuple(w1[:, :, d] for d in range(D)) + tuple(dout[:, :, f] for f in range(F))
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    kb_s = sorted_ops[0]
    G = 128 // w
    lanes = G * w
    WB = 16
    acc = jnp.zeros(())
    for g0 in range(0, L, 4):
        ng = min(4, L - g0)
        kg = kb_s[g0 : g0 + ng]
        w1_g = jnp.stack([sorted_ops[1 + d][g0 : g0 + ng] for d in range(D)], axis=-1)
        d_g = jnp.stack([sorted_ops[1 + D + f][g0 : g0 + ng] for f in range(F)], axis=-1)
        w8_g = table_ops.corner_products(w1_g)
        ct_s = (w8_g[..., :, None] * d_g[..., None, :]).reshape(ng, N, w)
        ct_s = jax.lax.optimization_barrier(ct_s)
        j = (kg % G)[..., None]
        ct128 = jnp.concatenate([jnp.where(j == k, ct_s, 0.0) for k in range(G)], axis=-1)
        ct128 = jax.lax.optimization_barrier(ct128)
        xb = ct128.reshape(ng, N // WB, WB, lanes)
        bsum = xb.sum(axis=2)
        pre = jnp.cumsum(bsum, axis=1) - bsum
        cs = (jnp.cumsum(xb, axis=2) + pre[:, :, None, :]).reshape(ng, N, lanes)
        acc = acc + jnp.sum(cs[:, -1])
    return acc, next_idx(idx, kb_s[0, :128].astype(jnp.float32))


def fwd_bwd_from_x(idx, w1, dout, table):
    """idx/w8/w1 computed IN-PROGRAM from positions (mirrors model.apply's
    _brick_fracs + corner_products) — binary-searches the in-model vs
    isolated encode-bwd gap (89 vs 27 ms at 2^18)."""
    x = (idx[:3].T.astype(jnp.float32) % 1024.0) / 1024.0  # [N, 3] chained
    idx2, w1_2 = enc._brick_fracs(x)
    w8_2 = table_ops.corner_products(w1_2)

    def f(tab):
        return jnp.sum(encode(tab, idx2, w8_2, w1_2) * dout)

    val, dT = jax.value_and_grad(f)(table)
    return val, next_idx(idx, dT[:128, 0] + val)


def fwd_bwd_computed_dout(idx, w1, dout, table):
    """cotangent computed from the encode output (a tiny reduction chain)
    instead of a loop-constant — tests whether a non-constant dout defeats
    some fusion/DCE in the bwd."""
    w8 = table_ops.corner_products(w1)

    def f(tab):
        out = encode(tab, idx, w8, w1)
        return jnp.sum(out * (out * 1e-3 + 0.5))

    val, dT = jax.value_and_grad(f)(table)
    return val, next_idx(idx, dT[:128, 0] + val)


_doutN = jax.random.normal(jax.random.fold_in(key, 97), (N, L * F))
_W0 = jax.random.normal(jax.random.fold_in(key, 96), (L * F, 64)) * 0.05


def fwd_bwd_transposed(idx, w1, dout, table):
    """cotangent arrives through the model-apply transpose
    ([L,N,F] → [N, L·F]) — isolates the layout boundary the in-model
    backward pays (85 ms) that the direct [L,N,F] probes (40 ms) don't."""
    w8 = table_ops.corner_products(w1)

    def f(tab):
        out = encode(tab, idx, w8, w1)  # [L, N, F]
        h = out.transpose(1, 0, 2).reshape(N, L * F)
        return jnp.sum(h * _doutN)

    val, dT = jax.value_and_grad(f)(table)
    return val, next_idx(idx, dT[:128, 0] + val)


def fwd_bwd_transposed_mlp(idx, w1, dout, table):
    w8 = table_ops.corner_products(w1)

    def f(tab):
        out = encode(tab, idx, w8, w1)
        h = out.transpose(1, 0, 2).reshape(N, L * F)
        return jnp.sum(jax.nn.relu(h @ _W0))

    val, dT = jax.value_and_grad(f)(table)
    return val, next_idx(idx, dT[:128, 0] + val)


_pos_fixed = jax.random.uniform(jax.random.fold_in(key, 95), (N, 3))
_dirs_fixed = jax.random.uniform(jax.random.fold_in(key, 94), (N, 3))


def _manual_model_bench(name, with_rgb, stop_weights, couple_table=False):
    """Rebuild NerfNetwork.__call__ stage by stage from the SAME components
    — bisects the in-model 85 ms table-backward vs the ~34 ms isolated op.

    couple_table=True multiplies the table by (1 + 1e-12·carry) so the
    table CHANGES each iteration — as in the real train step — defeating
    the hoist of every table-only computation (brick build, layouts)."""

    def body(idx, w1, dout, table):
        if couple_table:
            table = table * (1.0 + 1e-12 * idx[0, 0].astype(jnp.float32))
        p = dict(params)
        p["pos_encoding"] = {"table": table}
        # positions chained from the carried idx so nothing hoists
        x = (idx[:3].T.astype(jnp.float32) % 1024.0) / 1024.0  # [N, 3]
        idx2, w1_2 = enc._brick_fracs(x)
        w8_2 = table_ops.corner_products(w1_2)

        def f(pp):
            if stop_weights:
                pp = {
                    k: (jax.tree.map(jax.lax.stop_gradient, v) if k != "pos_encoding" else v)
                    for k, v in pp.items()
                }
            out = encode(pp["pos_encoding"]["table"], idx2, w8_2, w1_2)
            h = out.transpose(1, 0, 2).reshape(N, L * F)
            feats = model.density_mlp.apply(pp["density_mlp"], h)
            loss = jnp.sum(jnp.exp(jnp.clip(feats[..., 0], -10, 10))) * 1e-6
            if with_rgb:
                d = model.dir_encoding.apply(params.get("dir_encoding"), _dirs_fixed)
                rgb_in = jnp.concatenate(
                    [feats.astype(jnp.float32), d.astype(jnp.float32)], axis=-1
                )
                rgb = model.rgb_mlp.apply(pp["rgb_mlp"], rgb_in)[..., :3]
                loss = loss + jnp.sum(rgb) * 1e-6
            return loss

        val, g = jax.value_and_grad(f)(p)
        dT = g["pos_encoding"]["table"]
        return val, next_idx(idx, dT[:128, 0] + val)

    bench(name, body)


# bench("encode fwd only", fwd_only)
# bench("encode fwd+bwd (vjp)", fwd_bwd)
# bench("encode fwd+bwd, idx/w from x in-program", fwd_bwd_from_x)
# bench("encode fwd+bwd, computed dout", fwd_bwd_computed_dout)
# bench("encode fwd+bwd, transposed cotangent", fwd_bwd_transposed)
# bench("encode fwd+bwd, transpose+mlp0", fwd_bwd_transposed_mlp)
# _manual_model_bench("manual: enc+densMLP+sigma, table only", with_rgb=False, stop_weights=True)
def _call_model_bench(name, couple_all):
    """model.__call__ verbatim (not the stage rebuild), positions chained;
    couple_all additionally varies EVERY param leaf per iteration (as the
    real optimizer does) instead of only the table."""

    def body(idx, w1, dout, table):
        val0 = idx[0, 0].astype(jnp.float32)
        p = dict(params)
        p["pos_encoding"] = {"table": table * (1.0 + 1e-12 * val0)}
        if couple_all:
            p = {
                k: (jax.tree.map(lambda a: a * (1.0 + 1e-12 * val0), v)
                    if k != "pos_encoding" else v)
                for k, v in p.items()
            }
        x = (idx[:3].T.astype(jnp.float32) % 1024.0) / 1024.0

        def f(pp):
            rgb, sigma = model(pp, x, _dirs_fixed)
            return jnp.sum(rgb) * 1e-6 + jnp.sum(sigma) * 1e-6

        val, g = jax.value_and_grad(f)(p)
        dT = g["pos_encoding"]["table"]
        return val, next_idx(idx, dT[:128, 0] + val)

    bench(name, body)


_manual_model_bench(
    "manual: full model, all grads, TABLE VARIES", with_rgb=True,
    stop_weights=False, couple_table=True,
)
_call_model_bench("model.__call__, table varies", couple_all=False)
_call_model_bench("model.__call__, ALL params vary", couple_all=True)
# bench("segsum stage (sort+grp pipeline)", segsum_only)
# bench("sort+ct128+cumsum only", sort_ct128_cumsum)
