"""Edits I/O: serialize the operator list to JSON
(reference: Testbed::save_edits/load_edits src/testbed.cu:3190-3236 — cage
edits store the full tet mesh + MVC weights; affine ops store their box).

We store the device operator state (LUTs + tet arrays) directly so loading
needs no rebuild; large arrays are kept compact as base64 float16/int32.
"""

from __future__ import annotations

import base64
import json
from pathlib import Path
from typing import List

import numpy as np


def _enc(a, dtype) -> dict:
    a = np.asarray(a).astype(dtype)
    return {"dtype": str(a.dtype), "shape": list(a.shape), "b64": base64.b64encode(a.tobytes()).decode()}


def _dec(d) -> np.ndarray:
    return np.frombuffer(base64.b64decode(d["b64"]), np.dtype(d["dtype"])).reshape(d["shape"])


def save_edits(path: str | Path, operators: List, metadata: dict | None = None) -> None:
    from nerfshop_tpu.editing.operators import AffineDuplicationOp, CageDeformationOp

    ops_json = []
    for op in operators:
        if isinstance(op, CageDeformationOp):
            ops_json.append(
                {
                    "type": "cage_deformation",
                    "copy_mode": bool(op.copy_mode),
                    "lut_def": {
                        "bbox_lo": _enc(op.lut_def.bbox_lo, np.float32),
                        "inv_cell": _enc(op.lut_def.inv_cell, np.float32),
                        "cells": _enc(op.lut_def.cells, np.int32),
                        "res": op.lut_def.res,
                    },
                    "lut_orig": {
                        "bbox_lo": _enc(op.lut_orig.bbox_lo, np.float32),
                        "inv_cell": _enc(op.lut_orig.inv_cell, np.float32),
                        "cells": _enc(op.lut_orig.cells, np.int32),
                        "res": op.lut_orig.res,
                    },
                    "v0_def": _enc(op.v0_def, np.float32),
                    "inv_def": _enc(op.inv_def, np.float32),
                    "v0_orig": _enc(op.v0_orig, np.float32),
                    "inv_orig": _enc(op.inv_orig, np.float32),
                    "verts_orig": _enc(op.verts_orig, np.float32),
                    "verts_def": _enc(op.verts_def, np.float32),
                    "rot": _enc(op.rot, np.float32),
                }
            )
        elif isinstance(op, AffineDuplicationOp):
            ops_json.append(
                {
                    "type": "affine_duplication",
                    "box_center": np.asarray(op.box_center).tolist(),
                    "box_rot": np.asarray(op.box_rot).tolist(),
                    "box_half": np.asarray(op.box_half).tolist(),
                    "transform_rot": np.asarray(op.transform_rot).tolist(),
                    "transform_t": np.asarray(op.transform_t).tolist(),
                    "hide_original": bool(op.hide_original),
                }
            )
        else:
            raise TypeError(f"unserializable operator {type(op)}")
    Path(path).write_text(json.dumps({"version": 1, "metadata": metadata or {}, "operators": ops_json}))


def load_edits(path: str | Path) -> List:
    import jax.numpy as jnp

    from nerfshop_tpu.editing.operators import AffineDuplicationOp, CageDeformationOp
    from nerfshop_tpu.editing.tet_mesh import TetLut

    data = json.loads(Path(path).read_text())
    ops = []
    for d in data["operators"]:
        if d["type"] == "cage_deformation":
            def lut(ld):
                return TetLut(
                    bbox_lo=jnp.asarray(_dec(ld["bbox_lo"])),
                    inv_cell=jnp.asarray(_dec(ld["inv_cell"])),
                    cells=jnp.asarray(_dec(ld["cells"])),
                    res=ld["res"],
                )

            ops.append(
                CageDeformationOp(
                    lut_def=lut(d["lut_def"]),
                    lut_orig=lut(d["lut_orig"]),
                    v0_def=jnp.asarray(_dec(d["v0_def"])),
                    inv_def=jnp.asarray(_dec(d["inv_def"])),
                    v0_orig=jnp.asarray(_dec(d["v0_orig"])),
                    inv_orig=jnp.asarray(_dec(d["inv_orig"])),
                    verts_orig=jnp.asarray(_dec(d["verts_orig"])),
                    verts_def=jnp.asarray(_dec(d["verts_def"])),
                    rot=jnp.asarray(_dec(d["rot"])),
                    copy_mode=jnp.asarray(d["copy_mode"]),
                )
            )
        elif d["type"] == "affine_duplication":
            ops.append(
                AffineDuplicationOp(
                    box_center=jnp.asarray(d["box_center"], jnp.float32),
                    box_rot=jnp.asarray(d["box_rot"], jnp.float32),
                    box_half=jnp.asarray(d["box_half"], jnp.float32),
                    transform_rot=jnp.asarray(d["transform_rot"], jnp.float32),
                    transform_t=jnp.asarray(d["transform_t"], jnp.float32),
                    hide_original=jnp.asarray(d["hide_original"]),
                )
            )
    return ops
