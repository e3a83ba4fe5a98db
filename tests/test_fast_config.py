"""fast_nerf_config: the TPU-tuned flagship (L=8 hash) — shape/behavior
pins for the config the benches run (see config.py:fast_nerf_config for
the measured speed/quality trade vs the tcnn-parity default)."""
import jax
import jax.numpy as jnp

from nerfshop_tpu.config import default_nerf_config, fast_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network


def test_fast_config_shapes():
    cfg = fast_nerf_config()
    assert cfg["encoding"]["n_levels"] == 8
    # everything else inherits the reference config
    ref = default_nerf_config()
    assert cfg["encoding"]["log2_hashmap_size"] == ref["encoding"]["log2_hashmap_size"]
    assert cfg["network"] == ref["network"]

    model = build_nerf_network(cfg, aabb_scale=1)
    enc = model.pos_encoding
    assert enc.n_levels == 8 and enc.n_output_dims == 16
    # auto per-level-scale still ladders base→2048: top level res ≈ 2048
    assert abs(enc.level_scales[-1] - 2047.0) < 2.0

    params = model.init(jax.random.PRNGKey(0))
    rgb, sigma = model(params, jnp.full((4, 3), 0.5), jnp.full((4, 3), 0.5))
    assert rgb.shape == (4, 3) and sigma.shape == (4,)
    assert bool(jnp.isfinite(rgb).all()) and bool(jnp.isfinite(sigma).all())


def test_bench_config_env_knob(monkeypatch):
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    monkeypatch.setenv("NERFSHOP_BENCH_CONFIG", "reference")
    assert bench.bench_network_config()["encoding"]["n_levels"] == 16
    monkeypatch.delenv("NERFSHOP_BENCH_CONFIG")
    assert bench.bench_network_config()["encoding"]["n_levels"] == 8
