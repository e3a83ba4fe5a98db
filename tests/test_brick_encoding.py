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
