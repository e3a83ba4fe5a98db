"""CPU interpret-mode validation of the pallas sorted segment-sum kernel."""
import numpy as np
import jax
import jax.numpy as jnp

from nerfshop_tpu.ops import pallas_segsum, table_ops

rng = np.random.default_rng(0)

for m, N, D, F in [(4096, 1 << 14, 3, 2), (29824, 1 << 14, 3, 2), (524288, 1 << 15, 3, 2)]:
    C = 1 << D
    w = C * F
    idx = rng.integers(0, m, N).astype(np.int32)
    w1 = rng.uniform(0, 1, (N, D)).astype(np.float32)
    dout = rng.standard_normal((N, F)).astype(np.float32)

    order = np.argsort(idx, kind="stable")
    key_s, w1_s, dout_s = idx[order], w1[order], dout[order]

    out = pallas_segsum.sorted_segment_rowsum(
        jnp.asarray(key_s), jnp.asarray(w1_s), jnp.asarray(dout_s), m, interpret=True
    )
    out = np.asarray(out)

    # reference: dense scatter of w8 ⊗ dout
    w8 = np.asarray(table_ops.corner_products(jnp.asarray(w1)))
    ct = (w8[:, :, None] * dout[:, None, :]).reshape(N, w)
    ref = np.zeros((m, w), np.float32)
    np.add.at(ref, idx, ct)

    err = np.abs(out - ref).max()
    rel = err / (np.abs(ref).max() + 1e-12)
    print(f"m={m:7d} N={N} max_abs_err={err:.3e} rel={rel:.3e}", flush=True)
    assert rel < 2e-5, (m, rel)
print("OK")
