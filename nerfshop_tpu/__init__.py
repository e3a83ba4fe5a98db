"""nerfshop_tpu — a TPU-native (JAX/XLA/Pallas) neural-graphics framework.

Re-designed from scratch with the capabilities of NeRFshop / Instant-NGP
(reference: graphdeco-inria/nerfshop): hash-grid neural fields (NeRF / SDF /
Image / Volume), occupancy-grid-guided volume rendering, and interactive
cage-based NeRF editing (selection → region growing → tet cage → MVC
deformation → membrane correction → distillation) — all built TPU-first:

* compute path: JAX + XLA + Pallas kernels, bf16 on the MXU, static shapes,
  ``lax.scan``/``while_loop`` control flow (no host syncs in hot loops);
* scale-out: ``jax.sharding.Mesh`` + ``shard_map`` over ICI (data-parallel
  training, pixel-sharded rendering) instead of single-GPU streams;
* host runtime: plain Python/numpy geometry + optional C++ helpers.

This is NOT a port of the CUDA reference; see SURVEY.md for the blueprint.
"""

from nerfshop_tpu.version import __version__
from nerfshop_tpu.common import TestbedMode, RenderMode, ColorSpace, TonemapCurve
from nerfshop_tpu.config import load_network_config, ConfigDict

__all__ = [
    "__version__",
    "TestbedMode",
    "RenderMode",
    "ColorSpace",
    "TonemapCurve",
    "load_network_config",
    "ConfigDict",
    "Testbed",
]


def __getattr__(name):  # lazy import: Testbed pulls in jax & friends
    if name == "Testbed":
        from nerfshop_tpu.testbed import Testbed

        return Testbed
    raise AttributeError(f"module 'nerfshop_tpu' has no attribute {name!r}")
