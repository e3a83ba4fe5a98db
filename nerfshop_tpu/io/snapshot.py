"""Snapshot save/load: msgpack (+zlib), the reference's container choice
(Testbed::save_snapshot/load_snapshot src/testbed.cu:3054-3183, `.ingp`
export with version tag & zlib at 3118).

Schema (ours; versioned): a msgpack map with

* ``version``, ``mode``, ``network_config`` (JSON tree)
* ``params``: flattened pytree of numpy arrays (path → {dtype, shape, data})
* ``opt_state`` (optional, same flattening) — full resume like
  Trainer::serialize
* ``ema_params`` (optional)
* ``density_grid``: [C,R³] float16 morton-ordered per cascade (the
  reference's grid layout, for cross-checking / interop)
* ``nerf``: dataset metadata (aabb_scale, scale, offset, xforms, intrinsics)
  so a snapshot renders without the dataset (testbed.cu:3069-3072)
* ``step``, ``rays_per_batch`` etc. training counters.

Binary weight-level interop with tcnn's packed layouts is a non-goal (the
table/MLP layouts differ by design); the container & metadata match.
"""

from __future__ import annotations

import zlib
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import msgpack
import numpy as np

# v2: grid encodings default to the "brick" table layout (additive hash);
# v1 snapshots were trained with the "paired" xor-hash layout, so loading
# them injects layout="paired" to keep table indexing consistent.
SNAPSHOT_VERSION = 2


def _flatten_pytree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_pytree(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_pytree(v, f"{prefix}/{i}"))
    elif tree is None:
        pass
    elif hasattr(tree, "_fields"):  # NamedTuple (optax states)
        for k in tree._fields:
            out.update(_flatten_pytree(getattr(tree, k), f"{prefix}/{k}"))
    else:
        arr = np.asarray(tree)
        out[prefix] = arr
    return out


def _pack_arrays(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {
        k: {"dtype": str(v.dtype), "shape": list(v.shape), "data": v.tobytes()}
        for k, v in flat.items()
    }


def _unpack_arrays(packed: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return {
        k: np.frombuffer(v["data"], dtype=np.dtype(v["dtype"])).reshape(v["shape"])
        for k, v in packed.items()
    }


def _restore_like(template, flat: Dict[str, np.ndarray], prefix=""):
    """Rebuild a pytree with the template's structure from flattened arrays."""
    if isinstance(template, dict):
        return {k: _restore_like(v, flat, f"{prefix}/{k}") for k, v in template.items()}
    if isinstance(template, (list, tuple)) and not hasattr(template, "_fields"):
        seq = [_restore_like(v, flat, f"{prefix}/{i}") for i, v in enumerate(template)]
        return type(template)(seq)
    if hasattr(template, "_fields"):
        vals = {k: _restore_like(getattr(template, k), flat, f"{prefix}/{k}") for k in template._fields}
        return type(template)(**vals)
    if template is None:
        return None
    arr = flat[prefix]
    t = np.asarray(template)
    return arr.astype(t.dtype).reshape(t.shape)


def save_snapshot(
    path: str | Path,
    params,
    network_config: dict,
    mode: str = "nerf",
    opt_state=None,
    ema_params=None,
    density_grid: Optional[np.ndarray] = None,  # [C, R, R, R]
    metadata: Optional[dict] = None,
    step: int = 0,
    compress: bool = True,
) -> None:
    snap: Dict[str, Any] = {
        "version": SNAPSHOT_VERSION,
        "generator": "nerfshop_tpu",
        "mode": mode,
        "network_config": network_config,
        "step": int(step),
        "params": _pack_arrays(_flatten_pytree(params)),
    }
    if opt_state is not None:
        snap["opt_state"] = _pack_arrays(_flatten_pytree(opt_state))
    if ema_params is not None:
        snap["ema_params"] = _pack_arrays(_flatten_pytree(ema_params))
    if density_grid is not None:
        from nerfshop_tpu.ops import coords
        import jax.numpy as jnp

        # f32: the occupancy threshold is min(mean, 0.01/Δmin) — an f16 grid
        # quantizes cells sitting AT the mean across the threshold, so a
        # snapshot round-trip would flip occupancy bits and perturb renders
        # (.ingp EXPORT keeps the reference's f16-with-clamp layout)
        grids = [
            np.asarray(coords.dense_grid_to_morton(jnp.asarray(density_grid[c])), np.float32)
            for c in range(density_grid.shape[0])
        ]
        snap["density_grid"] = {
            "n_cascades": density_grid.shape[0],
            "layout": "morton_f32",
            "data": np.stack(grids).tobytes(),
        }
    if metadata is not None:
        snap["nerf"] = metadata

    blob = msgpack.packb(snap, use_bin_type=True)
    if compress:
        blob = b"NSTZ" + zlib.compress(blob, 6)
    Path(path).write_bytes(blob)


def load_snapshot(path: str | Path) -> Dict[str, Any]:
    blob = Path(path).read_bytes()
    if blob[:4] == b"NSTZ":
        blob = zlib.decompress(blob[4:])
    snap = msgpack.unpackb(blob, raw=False, strict_map_key=False)
    if snap.get("version", 0) > SNAPSHOT_VERSION:
        raise ValueError(f"snapshot version {snap['version']} too new")
    if snap.get("version", 0) < 2:
        enc = snap.get("network_config", {}).get("encoding", {})
        if enc.get("otype", "HashGrid") in ("HashGrid", "DenseGrid", "TiledGrid", "Grid"):
            enc.setdefault("layout", "paired")
    snap["params"] = _unpack_arrays(snap["params"])
    for k in ("opt_state", "ema_params"):
        if k in snap:
            snap[k] = _unpack_arrays(snap[k])
    if "density_grid" in snap:
        from nerfshop_tpu.common import GRID_VOLUME
        from nerfshop_tpu.ops import coords
        import jax.numpy as jnp

        dg = snap["density_grid"]
        C = dg["n_cascades"]
        dtype = np.float32 if dg.get("layout") == "morton_f32" else np.float16
        flat = np.frombuffer(dg["data"], dtype).reshape(C, GRID_VOLUME)
        # older f16 snapshots cast unclamped densities → ±inf entries
        flat = np.nan_to_num(flat.astype(np.float32), posinf=65000.0, neginf=0.0)
        dense = np.stack(
            [np.asarray(coords.morton_to_dense_grid(jnp.asarray(flat[c].astype(np.float32)))) for c in range(C)]
        )
        snap["density_grid"] = dense
    return snap


def restore_params(template_params, snap: Dict[str, Any], key: str = "params"):
    """Reshape the snapshot's flat arrays into the model's param pytree."""
    return _restore_like(template_params, snap[key], "")
