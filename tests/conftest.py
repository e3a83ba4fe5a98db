"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
code is exercised without TPU hardware (bench.py runs on the real chip)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compile cache: the e2e programs (grid update through the edit
# operator stack, K=512 renders) take 2-3 MINUTES each to compile on XLA CPU
# — the dominant suite cost. Caching makes re-runs start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

if os.environ.get("NERFSHOP_TEST_TPU", "0") != "1":
    # The axon sitecustomize force-registers the TPU backend and pins
    # JAX_PLATFORMS=axon; the env var alone is not enough — override via
    # jax.config before any computation runs.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def albert_image():
    from nerfshop_tpu.data import image_io

    path = "/root/reference/data/image/albert.exr"
    if not os.path.exists(path):
        pytest.skip("reference image data not available")
    return image_io.read_image(path)[..., :3]
