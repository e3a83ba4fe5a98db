"""Honest throughput of gather-free (pure MXU) field configs vs hash grid."""
import time, jax, jax.numpy as jnp, numpy as np
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.config import default_nerf_config


def bench_model(name, cfg, n=1 << 18, iters=8):
    model = build_nerf_network(cfg, aabb_scale=1)
    params = model.init(jax.random.PRNGKey(0))

    @jax.jit
    def chained(pos, dirs):
        rgb, sigma = model(params, pos, dirs)
        pos2 = jnp.clip(pos + rgb * 1e-6, 0.0, 1.0)
        return pos2, rgb

    pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    pos, rgb = chained(pos, dirs)
    jax.block_until_ready(rgb)
    t0 = time.perf_counter()
    for _ in range(iters):
        pos, rgb = chained(pos, dirs)
    jax.block_until_ready(rgb)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s}: {dt*1e3:8.2f} ms  {n/dt/1e6:9.1f} M samples/s")


sh = {"otype": "SphericalHarmonics", "degree": 4}

bench_model("hash L16 F2 (reference parity)", default_nerf_config())
bench_model("hash L8 F4 paired", {
    "encoding": {"otype": "HashGrid", "n_levels": 8, "n_features_per_level": 4,
                 "log2_hashmap_size": 19, "base_resolution": 16},
    "dir_encoding": sh,
    "network": {"n_neurons": 64, "n_hidden_layers": 1},
    "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
})
for width, depth in ((128, 4), (256, 4), (256, 6), (512, 4)):
    bench_model(f"freq10 + MLP {depth}x{width}", {
        "encoding": {"otype": "Frequency", "n_frequencies": 10},
        "dir_encoding": sh,
        "network": {"n_neurons": width, "n_hidden_layers": depth},
        "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
    })
