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
