"""Volume ingest for the Volume testbed (S6).

The reference loads NanoVDB grids (src/testbed_volume.cu, load_file +
nanovdb::Grid). Here the supported interchange formats are:

* ``.npy`` / ``.npz`` — a 3D float density array (key ``density`` or the
  first array in an npz);
* ``.raw`` + sidecar ``.json`` ({"dims": [X,Y,Z], "dtype": "float32"});
* ``.nvdb`` — detected and rejected with a conversion hint (the NanoVDB
  tree format is not parsed here; convert with
  ``nanovdb_convert`` / OpenVDB Python to .npy once).

→ density [X, Y, Z] float32, normalized so max ≈ the stored maximum
(delta-tracking majorant derives from it downstream).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

NANOVDB_MAGIC = 0x304244566F6E614E  # "NanoVDB0"


def load_volume(path: str | Path) -> np.ndarray:
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".npy":
        vol = np.load(path)
    elif suffix == ".npz":
        z = np.load(path)
        vol = z["density"] if "density" in z else z[list(z.keys())[0]]
    elif suffix == ".raw":
        meta = json.loads(path.with_suffix(".json").read_text())
        dims = meta["dims"]
        dtype = np.dtype(meta.get("dtype", "float32"))
        vol = np.fromfile(path, dtype=dtype).reshape(dims)
    elif suffix in (".nvdb", ".vdb"):
        magic = int.from_bytes(open(path, "rb").read(8), "little")
        kind = "NanoVDB" if magic == NANOVDB_MAGIC else "OpenVDB"
        raise NotImplementedError(
            f"{kind} ingest: convert {path.name} to .npy first, e.g.\n"
            "  import openvdb; grid = openvdb.read(path, 'density')\n"
            "  dense = grid.copyToArray(...); np.save('density.npy', dense)\n"
            "(the tree formats are not parsed natively here)"
        )
    else:
        raise ValueError(f"unsupported volume format {suffix!r}")
    vol = np.asarray(vol, np.float32)
    if vol.ndim != 3:
        raise ValueError(f"volume must be 3D, got {vol.shape}")
    return vol
