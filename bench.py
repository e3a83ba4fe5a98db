"""Headline benchmark: hash-encode + full NeRF MLP throughput (samples/sec)
on one chip. Baseline: the BASELINE.md north-star of 1e9 samples/s/chip
(tcnn-class throughput on an RTX 3090).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

BASELINE_SAMPLES_PER_SEC = 1e9


def main():
    import jax
    import jax.numpy as jnp

    from nerfshop_tpu.config import default_nerf_config
    from nerfshop_tpu.models.nerf_network import build_nerf_network

    model = build_nerf_network(default_nerf_config(), aabb_scale=1)
    params = model.init(jax.random.PRNGKey(0))

    n = 1 << 18
    pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))

    @jax.jit
    def forward(params, pos, dirs):
        return model(params, pos, dirs)

    # warm-up / compile
    out = forward(params, pos, dirs)
    jax.block_until_ready(out)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(params, pos, dirs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    samples_per_sec = n * iters / dt
    print(
        json.dumps(
            {
                "metric": "nerf_field_eval_throughput",
                "value": samples_per_sec,
                "unit": "samples/sec",
                "vs_baseline": samples_per_sec / BASELINE_SAMPLES_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
