"""`.ingp` snapshot interop with the Instant-NGP / NeRFshop ecosystem.

Format (reference: Testbed::export_snapshot / load_snapshot,
src/testbed.cu:3054-3183): a msgpack encoding of the network-config JSON
tree with a ``snapshot`` key added; ``.ingp`` files wrap the msgpack stream
in zlib (zstr). The snapshot carries:

* ``version`` (1), ``training_step``, ``loss``
* ``density_grid_size`` (128) and ``density_grid_binary`` — fp16 density
  grid, (max_cascade+1)·128³ entries, morton-ordered per the reference's
  grid layout (ours is row-major [C,R,R,R]; we convert on the way in/out)
* ``params_type`` ("__half") / ``params_binary`` — the tcnn parameter blob
  in the reference's order (NerfNetworkFull::set_params,
  nerf_network_full.h:316-349): density MLP, rgb MLP, hash-grid table,
  dir encoding (0 params for SH)
* ``nerf.aabb_scale`` and camera/aabb metadata.

tcnn layer blobs are row-major [n_out, n_in] with output widths padded to
16 (the rgb network's 3 outputs ship as 16 rows, 13 of them zero).

Round-trips through this module are exact; interop with snapshots written
by the CUDA reference follows the same documented layout but has not been
validated against original binaries (none are redistributable here).
"""

from __future__ import annotations

import json
import zlib
from typing import Optional, Tuple

import numpy as np

SNAPSHOT_FORMAT_VERSION = 1
GRID_SIZE = 128


def _morton3d(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Interleave 7-bit coords → morton index (reference grid layout,
    common_nerf.h / testbed_nerf.cu morton3D)."""

    def spread(v):
        v = v.astype(np.uint32)
        v = (v | (v << 16)) & np.uint32(0x030000FF)
        v = (v | (v << 8)) & np.uint32(0x0300F00F)
        v = (v | (v << 4)) & np.uint32(0x030C30C3)
        v = (v | (v << 2)) & np.uint32(0x09249249)
        return v

    return spread(x) | (spread(y) << np.uint32(1)) | (spread(z) << np.uint32(2))


_MORTON_CACHE: dict = {}


def _morton_perm(res: int) -> np.ndarray:
    """Permutation p with p[morton_idx] = row_major_idx for a res³ grid."""
    if res not in _MORTON_CACHE:
        ix, iy, iz = np.meshgrid(np.arange(res), np.arange(res), np.arange(res), indexing="ij")
        m = _morton3d(ix.ravel(), iy.ravel(), iz.ravel())
        perm = np.empty(res**3, np.int64)
        perm[m] = np.arange(res**3)
        _MORTON_CACHE[res] = perm
    return _MORTON_CACHE[res]


def _pad16(n: int) -> int:
    return -(-n // 16) * 16


def _mlp_to_tcnn_blob(weights) -> np.ndarray:
    """Our MLP weights ([in, out] f32 list) → tcnn layout: per layer
    row-major [out_padded16, in], forward order, fp16."""
    blobs = []
    for i, w in enumerate(weights):
        w = np.asarray(w, np.float32)
        out_dim = w.shape[1]
        out_pad = _pad16(out_dim)
        m = np.zeros((out_pad, w.shape[0]), np.float32)
        m[:out_dim] = w.T
        blobs.append(m.reshape(-1))
    return np.concatenate(blobs)


def _mlp_from_tcnn_blob(blob: np.ndarray, layer_dims) -> Tuple[list, int]:
    """Inverse of _mlp_to_tcnn_blob. → (weights list, consumed floats)."""
    ws, off = [], 0
    for fan_in, fan_out in layer_dims:
        out_pad = _pad16(fan_out)
        n = out_pad * fan_in
        m = blob[off : off + n].reshape(out_pad, fan_in)
        ws.append(np.ascontiguousarray(m[:fan_out].T, np.float32))
        off += n
    return ws, off


def pack_params(model, params) -> np.ndarray:
    """Parameter pytree → tcnn-ordered fp16 blob (density MLP, rgb MLP,
    grid table row-major [T, F] with F fastest)."""
    parts = [
        _mlp_to_tcnn_blob(params["density_mlp"]["weights"]),
        _mlp_to_tcnn_blob(params["rgb_mlp"]["weights"]),
        np.asarray(params["pos_encoding"]["table"], np.float32).reshape(-1),
    ]
    return np.concatenate(parts).astype(np.float16)


def unpack_params(model, blob: np.ndarray, params_template) -> dict:
    blob = np.asarray(blob, np.float32)
    dens, off1 = _mlp_from_tcnn_blob(blob, model.density_mlp.layer_dims)
    rgb, off2 = _mlp_from_tcnn_blob(blob[off1:], model.rgb_mlp.layer_dims)
    table_shape = np.asarray(params_template["pos_encoding"]["table"]).shape
    n_table = int(np.prod(table_shape))
    table = blob[off1 + off2 : off1 + off2 + n_table].reshape(table_shape)
    import jax.numpy as jnp

    out = dict(params_template)
    out["density_mlp"] = {"weights": [jnp.asarray(w) for w in dens]}
    out["rgb_mlp"] = {"weights": [jnp.asarray(w) for w in rgb]}
    out["pos_encoding"] = {"table": jnp.asarray(table)}
    return out


def rebake_plain_table(model, params, rng=None, n_steps: int = 300, batch: int = 1 << 14, lr: float = 5e-2):
    """Re-bake a brick/paired-layout grid table into tcnn 'plain' order
    (xor-hash, align-8 — src/testbed.cu:3118-3183 blob layout).

    Dense levels copy EXACTLY (dense indexing is identical across layouts).
    Hash levels cannot be converted exactly — additive (brick) and xor
    (tcnn) hashing induce different collision sets — so their plain table
    is the least-squares fit of the brick encoding's output field (the
    encoding is LINEAR in the table, so this is a convex fit; Adam on
    sampled positions converges in a few hundred steps).

    → (plain_encoding, plain_table jnp [Tp, F], final_mse float)."""
    import jax
    import jax.numpy as jnp
    import optax

    from nerfshop_tpu.models import encodings as enc_lib

    enc_b = model.pos_encoding
    enc_p = enc_lib.GridEncoding(
        n_input_dims=enc_b.n_input_dims,
        n_levels=enc_b.n_levels,
        n_features_per_level=enc_b.n_features_per_level,
        log2_hashmap_size=enc_b.log2_hashmap_size,
        base_resolution=enc_b.base_resolution,
        per_level_scale=enc_b.per_level_scale,
        hash_type=enc_b.hash_type,
        layout="plain",
    )
    tb = np.asarray(params["pos_encoding"]["table"], np.float32)
    tp = np.zeros((enc_p.table_size, enc_p.n_features_per_level), np.float32)
    any_hash = False
    for l in range(enc_b.n_levels):
        if enc_b.level_dense[l] and enc_p.level_dense[l]:
            n = min(enc_b.level_sizes[l], enc_p.level_sizes[l], enc_b.level_res[l] ** enc_b.n_input_dims)
            tp[enc_p.level_offsets[l] : enc_p.level_offsets[l] + n] = tb[
                enc_b.level_offsets[l] : enc_b.level_offsets[l] + n
            ]
        else:
            any_hash = True
    mse = 0.0
    if any_hash and n_steps > 0:
        rng = jax.random.PRNGKey(0) if rng is None else rng
        target_params = {"table": jnp.asarray(tb)}
        p = {"table": jnp.asarray(tp)}
        tx = optax.adam(lr)
        st = tx.init(p)

        @jax.jit
        def step(p, st, k):
            x = jax.random.uniform(k, (batch, enc_b.n_input_dims))
            tgt = jax.lax.stop_gradient(enc_b.apply(target_params, x))

            def loss(pp):
                return jnp.mean((enc_p.apply(pp, x) - tgt) ** 2)

            l, g = jax.value_and_grad(loss)(p)
            up, st = tx.update(g, st, p)
            return optax.apply_updates(p, up), st, l

        for i in range(n_steps):
            rng, k = jax.random.split(rng)
            p, st, l = step(p, st, k)
        mse = float(l)
        tp = p["table"]
    return enc_p, jnp.asarray(tp), mse


def export_ingp(
    path: str,
    network_config: dict,
    model,
    params,
    density_grid: Optional[np.ndarray] = None,  # [C, R, R, R]
    aabb_scale: int = 1,
    training_step: int = 0,
    loss: float = 0.0,
    compress: bool = True,
    interop: str = "convert",  # "convert" | "warn" | "strict"
) -> None:
    import msgpack

    cfg = json.loads(json.dumps(dict(network_config)))  # deep, json-clean

    # tcnn readers assume xor-hash/align-8 ('plain') table order. The
    # "brick" (additive-hash, 128-aligned) and "paired" layouts index
    # differently, so exports re-bake to 'plain' by default (dense levels
    # exact, hash levels least-squares-fit — see rebake_plain_table; exact
    # hash conversion is impossible, the collision sets differ).
    layout = getattr(getattr(model, "pos_encoding", None), "layout", None)
    if layout is not None and isinstance(cfg.get("encoding"), dict):
        if layout != "plain" and interop == "strict":
            raise ValueError(
                f".ingp export with table layout {layout!r} is not readable by "
                "tcnn/CUDA readers; use interop='convert' (re-bake) or 'warn'."
            )
        if layout != "plain" and interop == "convert":
            import dataclasses
            import warnings

            enc_p, table_p, mse = rebake_plain_table(model, params)
            params = {**params, "pos_encoding": {"table": table_p}}
            model = dataclasses.replace(model, pos_encoding=enc_p)
            cfg["encoding"]["layout"] = "plain"
            layout = "plain"
            if mse > 0:
                # the hash-level re-bake is a least-squares FIT, not exact —
                # make the loss visible so a default save_snapshot('*.ingp')
                # isn't silently lossy (use interop='warn' to keep the brick
                # table when the file is only reloaded by this framework)
                warnings.warn(
                    f"{path}: hash levels re-baked to tcnn plain order with "
                    f"least-squares fit MSE {mse:.3e} (dense levels exact); "
                    "pass interop='warn' to keep the native layout lossless"
                )
        else:
            cfg["encoding"]["layout"] = layout
        if layout != "plain":
            import warnings

            warnings.warn(
                f".ingp export uses table layout {layout!r}: readable by "
                "nerfshop_tpu (layout recorded in the config) but NOT by "
                "CUDA Instant-NGP/NeRFshop readers, which assume tcnn "
                "xor-hash indexing. Use interop='convert' for "
                "cross-ecosystem interop.",
                stacklevel=2,
            )
    blob = pack_params(model, params)
    snapshot = {
        "version": SNAPSHOT_FORMAT_VERSION,
        "params_type": "__half",
        "n_params": int(blob.size),
        "params_binary": blob.tobytes(),
        "training_step": int(training_step),
        "loss": float(loss),
        "nerf": {
            "aabb_scale": int(aabb_scale),
            "rgb": {
                "rays_per_batch": 4096,
                "measured_batch_size": 1 << 18,
                "measured_batch_size_before_compaction": 1 << 18,
            },
        },
    }
    if density_grid is not None:
        C = density_grid.shape[0]
        perm = _morton_perm(GRID_SIZE)
        flat = np.asarray(density_grid, np.float32).reshape(C, -1)
        morton = flat[:, perm]  # row-major → morton per cascade
        snapshot["density_grid_size"] = GRID_SIZE
        # clamp before the f16 cast: exp-activated σ can exceed fp16 range
        snapshot["density_grid_binary"] = (
            np.clip(morton, -65000.0, 65000.0).astype(np.float16).tobytes()
        )
    cfg["snapshot"] = snapshot

    raw = msgpack.packb(cfg, use_bin_type=True)
    if str(path).endswith(".ingp") and compress:
        raw = zlib.compress(raw)
    with open(path, "wb") as fh:
        fh.write(raw)


def load_ingp(path: str) -> dict:
    """→ the decoded config dict (with 'snapshot'); raw bytes decoded,
    zlib-unwrapped if needed."""
    import msgpack

    raw = open(path, "rb").read()
    if raw[:1] == b"\x78":  # zlib header
        raw = zlib.decompress(raw)
    return msgpack.unpackb(raw, raw=False, strict_map_key=False)


def import_ingp(path: str, model, params_template) -> dict:
    """Load an .ingp snapshot into our structures.

    → {"params": pytree, "density_grid": [C,R,R,R] or None,
       "training_step", "loss", "aabb_scale", "config"}."""
    cfg = load_ingp(path)
    snap = cfg.get("snapshot")
    if snap is None:
        raise ValueError(f"{path} contains no snapshot")
    blob = np.frombuffer(snap["params_binary"], np.float16)
    params = unpack_params(model, blob, params_template)

    density_grid = None
    if "density_grid_binary" in snap:
        res = int(snap.get("density_grid_size", GRID_SIZE))
        dg = np.frombuffer(snap["density_grid_binary"], np.float16).astype(np.float32)
        C = dg.size // res**3
        perm = _morton_perm(res)
        rm = np.empty_like(dg.reshape(C, -1))
        rm[:, perm] = dg.reshape(C, -1)  # rowmajor[perm[m]] = morton[m]
        density_grid = rm.reshape(C, res, res, res)

    return {
        "params": params,
        "density_grid": density_grid,
        "training_step": int(snap.get("training_step", 0)),
        "loss": float(snap.get("loss", 0.0)),
        "aabb_scale": int(snap.get("nerf", {}).get("aabb_scale", 1)),
        "config": cfg,
    }
