"""Brick-layout grid encoding: exactness vs the tcnn-parity layouts on
dense levels, brute-force reference on hash levels, C0 continuity across
cell faces, and gradient agreement (the scatter-free backward feeding
canonical-table grads through the brick derivation rolls)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.models.encodings import _HASH_PRIMES, GridEncoding


def _mk(layout, **kw):
    kw.setdefault("n_input_dims", 3)
    kw.setdefault("n_levels", 2)
    kw.setdefault("n_features_per_level", 2)
    kw.setdefault("base_resolution", 16)
    kw.setdefault("per_level_scale", 2.0)
    return GridEncoding(layout=layout, **kw)


def test_brick_equals_plain_on_dense_levels():
    """res 16/32 dense levels: identical sizes & indexing across layouts →
    identical function of the same table."""
    enc_b = _mk("brick", hash_type="dense")
    enc_p = _mk("plain", hash_type="dense")
    assert enc_b.level_sizes == enc_p.level_sizes
    params = enc_b.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (500, 3))
    np.testing.assert_allclose(
        np.asarray(enc_b.apply(params, x)),
        np.asarray(enc_p.apply(params, x)),
        rtol=1e-6, atol=1e-7,
    )


def test_brick_hash_matches_bruteforce():
    """Hash level vs a direct numpy evaluation of the additive-hash
    trilinear interpolation."""
    enc = _mk("brick", n_levels=1, base_resolution=128, log2_hashmap_size=14)
    assert not enc.level_dense[0]
    m = enc.level_sizes[0]
    params = enc.init(jax.random.PRNGKey(0))
    table = np.asarray(params["table"])
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (200, 3)).astype(np.float32)

    scale = enc.level_scales[0]
    res = enc.level_res[0]
    p = x * scale + 0.5
    p0 = np.clip(np.floor(p).astype(np.int64), 0, res - 1)
    frac = p - np.floor(p)
    w1 = np.where(p0 == res - 1, 0.0, frac)
    P2, P3 = int(_HASH_PRIMES[1]), int(_HASH_PRIMES[2])
    expected = np.zeros((200, 2), np.float32)
    for c in range(8):
        cx, cy, cz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        idx = (p0[:, 0] + cx + (p0[:, 1] + cy) * P2 + (p0[:, 2] + cz) * P3) % m
        w = (w1[:, 0] if cx else 1 - w1[:, 0]) * (w1[:, 1] if cy else 1 - w1[:, 1]) * (
            w1[:, 2] if cz else 1 - w1[:, 2]
        )
        expected += table[idx] * w[:, None].astype(np.float32)

    out = np.asarray(enc.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)


def test_brick_c0_continuity():
    """Field is continuous across cell faces (corners alias shared canonical
    entries — the property a per-cell 'cell hash' would break)."""
    enc = _mk("brick", n_levels=3, log2_hashmap_size=13, base_resolution=16)
    params = enc.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    res = enc.level_res[-1]
    # points ±ε around x-cell-boundaries of the finest level
    k = rng.integers(1, res - 1, 100)
    xb = (k - 0.5) / enc.level_scales[-1]  # cell-face x positions
    yz = rng.uniform(0.1, 0.9, (100, 2))
    eps = 1e-5
    lo = np.column_stack([xb - eps, yz]).astype(np.float32)
    hi = np.column_stack([xb + eps, yz]).astype(np.float32)
    d = np.abs(
        np.asarray(enc.apply(params, jnp.asarray(lo)))
        - np.asarray(enc.apply(params, jnp.asarray(hi)))
    )
    assert d.max() < 1e-3  # ∝ ε·scale·|table|; discontinuity would be O(|table|)


def test_brick_partition_of_unity():
    enc = _mk("brick", n_levels=4, log2_hashmap_size=13)
    params = {"table": jnp.ones((enc.table_size, enc.n_features_per_level))}
    x = jax.random.uniform(jax.random.PRNGKey(4), (300, 3))
    out = np.asarray(enc.apply(params, x))
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)


def test_brick_table_grad_matches_plain_dense():
    """∂loss/∂table through the brick path (scatter-free) equals the plain
    path's autodiff scatter on dense levels."""
    enc_b = _mk("brick", hash_type="dense")
    enc_p = _mk("plain", hash_type="dense")
    params = enc_b.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(5), (400, 3))

    def loss(enc):
        def f(p):
            return jnp.sum(jnp.sin(3.0 * enc.apply(p, x)))
        return f

    g_b = jax.grad(loss(enc_b))(params)["table"]
    g_p = jax.grad(loss(enc_p))(params)["table"]
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_p), rtol=2e-3, atol=1e-5)


def test_brick_position_gradient():
    """d(encoding)/d(x) exists and is piecewise-constant-free (non-zero)."""
    enc = _mk("brick", n_levels=2, log2_hashmap_size=13)
    params = enc.init(jax.random.PRNGKey(0))

    def f(x):
        return jnp.sum(enc.apply(params, x[None]) ** 2)

    g = jax.grad(f)(jnp.asarray([0.4, 0.5, 0.6]))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_brick_encode_pipeline_matches_autodiff():
    """The TPU backward (force_segment: one-hot-matmul small levels + the
    payload-sort pipeline on large levels) against native autodiff of the
    reference forward — values AND all three cotangents."""
    from nerfshop_tpu.ops import table_ops

    enc = _mk("brick", n_levels=3, base_resolution=8, per_level_scale=3.1,
              log2_hashmap_size=10)
    # level 2 must be hashed so the sort branch runs; force a tiny matmul_max
    # so level 1 exercises the matmul branch too
    assert not enc.level_dense[-1]
    pipe = table_ops.make_brick_encode(
        enc.level_sizes, enc.level_offsets, enc._brick_shifts,
        enc.n_features_per_level, enc.n_input_dims,
        force_segment=True, matmul_max=enc.level_sizes[0],
    )
    ref = table_ops.make_brick_encode(
        enc.level_sizes, enc.level_offsets, enc._brick_shifts,
        enc.n_features_per_level, enc.n_input_dims,
    )
    params = enc.init(jax.random.PRNGKey(0))
    table = params["table"]
    x = jax.random.uniform(jax.random.PRNGKey(7), (1000, 3))
    idx, w1 = enc._brick_fracs(x)
    w8 = table_ops.corner_products(w1)

    out_p = pipe(table, idx, w8, w1)
    out_r = ref(table, idx, w8, w1)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), rtol=1e-5, atol=1e-6)

    def loss(fn):
        def f(t, w8_):
            return jnp.sum(jnp.sin(3.0 * fn(t, idx, w8_, w1)))
        return f

    gt_p, gw_p = jax.grad(loss(pipe), argnums=(0, 1))(table, w8)
    gt_r, gw_r = jax.grad(loss(ref), argnums=(0, 1))(table, w8)
    # table grad: small levels go through a 2-term bf16 matmul (~2^-16 rel),
    # large levels are f32-exact modulo prefix-sum differencing
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_r), rtol=2e-3, atol=2e-4)
    # w8 grad: forward features saved in bf16
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-2, atol=2e-3)


def test_brick_encode_packed_forward_matches_unpacked():
    """Packed [m/P, 128] forward equals the plain rolled-brick gather."""
    from nerfshop_tpu.ops import table_ops

    enc = _mk("brick", n_levels=2, base_resolution=16, log2_hashmap_size=9)
    params = enc.init(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (500, 3))
    out = enc.apply(params, x)
    # manual unpacked evaluation through the derived brick tables
    idx, w = enc._brick_indices(x)
    bricks = enc._brick_tables(params["table"])
    F = enc.n_features_per_level
    C = 1 << enc.n_input_dims
    expect = []
    for l in range(enc.n_levels):
        feats = jnp.take(bricks[l], idx[l], axis=0).reshape(-1, C, F)
        expect.append(jnp.einsum("nc,ncf->nf", w[l], feats))
    expect = jnp.stack(expect).transpose(1, 0, 2).reshape(x.shape[0], -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-6)


def test_brick_prebuilt_tables_inference_path():
    """params['brick_tables'] (renderer injection) gives identical values to
    the fused op path."""
    enc = _mk("brick", n_levels=3, base_resolution=8, log2_hashmap_size=10)
    params = enc.init(jax.random.PRNGKey(0))
    params["table"] = jax.random.normal(jax.random.PRNGKey(1), params["table"].shape) * 0.1
    x = jax.random.uniform(jax.random.PRNGKey(2), (300, 3))
    base = enc.apply(params, x)
    pre = {**params, "brick_tables": enc.build_brick_tables(params["table"])}
    fast = enc.apply(pre, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base), rtol=1e-6, atol=1e-7)
