"""Scatter-free table gradients vs the exact scatter-add reference."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.ops import table_ops


def test_exact_histogram():
    rng = np.random.default_rng(0)
    m = 1 << 12
    idx = jnp.asarray(rng.integers(0, m, 50_000, dtype=np.int32))
    h = np.asarray(table_ops.exact_histogram(idx, m)).astype(np.int64)
    ref = np.bincount(np.asarray(idx), minlength=m)
    assert np.array_equal(h, ref)


def test_segment_table_grad_matches_scatter():
    rng = np.random.default_rng(1)
    L, N, w = 3, 4096, 8
    sizes = [256, 1024, 512]
    idx = np.stack([rng.integers(0, m, N, dtype=np.int32) for m in sizes])
    g = rng.normal(size=(L, N, w)).astype(np.float32)
    grads = table_ops.segment_table_grad(jnp.asarray(idx), jnp.asarray(g), sizes)
    for l, m in enumerate(sizes):
        ref = np.zeros((m, w), np.float64)
        np.add.at(ref, idx[l], g[l].astype(np.float64))
        np.testing.assert_allclose(np.asarray(grads[l]), ref, rtol=2e-3, atol=1e-3)


def test_segment_table_grad_integer_exact():
    """With integer-valued cotangents the cumsum-difference is exact."""
    rng = np.random.default_rng(2)
    L, N, w = 1, 2048, 4
    m = 128
    idx = rng.integers(0, m, (L, N), dtype=np.int32)
    g = rng.integers(-3, 4, (L, N, w)).astype(np.float32)
    (grad,) = table_ops.segment_table_grad(jnp.asarray(idx), jnp.asarray(g), [m])
    ref = np.zeros((m, w), np.float32)
    np.add.at(ref, idx[0], g[0])
    np.testing.assert_array_equal(np.asarray(grad), ref)


def test_level_gather_forward_and_vjp():
    rng = np.random.default_rng(3)
    sizes = [128, 384]
    w = 8
    tables = [
        jnp.asarray(rng.normal(size=(m, w)).astype(np.float32)) for m in sizes
    ]
    idx = jnp.asarray(
        np.stack([rng.integers(0, m, 1000, dtype=np.int32) for m in sizes])
    )
    gather = table_ops.make_level_gather(sizes, w, force_segment=True)

    out = gather(tables, idx)
    for l in range(2):
        np.testing.assert_allclose(
            np.asarray(out[l]), np.asarray(tables[l])[np.asarray(idx[l])]
        )

    # VJP vs autodiff-through-take (which uses scatter)
    def loss_custom(ts):
        return jnp.sum(jnp.sin(gather(ts, idx)))

    def loss_ref(ts):
        return sum(jnp.sum(jnp.sin(jnp.take(t, idx[l], axis=0))) for l, t in enumerate(ts))

    g_custom = jax.grad(loss_custom)(tables)
    g_ref = jax.grad(loss_ref)(tables)
    for a, b in zip(g_custom, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def test_pallas_sorted_segment_rowsum():
    """The Pallas block-matmul kernel (interpret mode on CPU) against a
    dense scatter of w8 ⊗ dout."""
    from nerfshop_tpu.ops import pallas_segsum

    rng = np.random.default_rng(11)
    m, N, D, F = 1536 * 8, 1 << 13, 3, 2
    w = (1 << D) * F
    idx = rng.integers(0, m, N).astype(np.int32)
    w1 = rng.uniform(0, 1, (N, D)).astype(np.float32)
    dout = rng.standard_normal((N, F)).astype(np.float32)
    order = np.argsort(idx, kind="stable")
    out = np.asarray(
        pallas_segsum.sorted_segment_rowsum(
            jnp.asarray(idx[order]), jnp.asarray(w1[order]),
            jnp.asarray(dout[order]), m, interpret=True,
        )
    )
    w8 = np.asarray(table_ops.corner_products(jnp.asarray(w1)))
    ct = (w8[:, :, None] * dout[:, None, :]).reshape(N, w)
    ref = np.zeros((m, w), np.float32)
    np.add.at(ref, idx, ct)
    np.testing.assert_allclose(out, ref, rtol=3e-3, atol=2e-5)


def test_brick_encode_pallas_backward_matches_autodiff():
    """make_brick_encode with the Pallas backward branch (N % 128 == 0)
    against native autodiff of the reference forward."""
    import nerfshop_tpu.models.encodings as encodings

    enc = encodings.GridEncoding(
        n_levels=3, n_features_per_level=2, log2_hashmap_size=10,
        base_resolution=8, per_level_scale=3.1, n_input_dims=3,
        layout="brick",
    )
    assert not enc.level_dense[-1]
    pipe = table_ops.make_brick_encode(
        enc.level_sizes, enc.level_offsets, enc._brick_shifts,
        enc.n_features_per_level, enc.n_input_dims, force_segment=True,
        use_pallas=True,
    )
    ref = table_ops.make_brick_encode(
        enc.level_sizes, enc.level_offsets, enc._brick_shifts,
        enc.n_features_per_level, enc.n_input_dims,
    )
    params = enc.init(jax.random.PRNGKey(0))
    table = params["table"]
    x = jax.random.uniform(jax.random.PRNGKey(7), (1024, 3))
    idx, w1 = enc._brick_fracs(x)
    w8 = table_ops.corner_products(w1)

    def loss(fn):
        def f(t):
            return jnp.sum(jnp.sin(3.0 * fn(t, idx, w8, w1)))
        return f

    gt_p = jax.grad(loss(pipe))(table)
    gt_r = jax.grad(loss(ref))(table)
    np.testing.assert_allclose(
        np.asarray(gt_p), np.asarray(gt_r), rtol=2e-3, atol=2e-4
    )
