"""Split the warm ROI-rebake cost: field-only patch vs op-stack patch, and
the tet-LUT resolution's effect on the lookup fanout (MT drives a fori loop
over ALL rows). Warm timings, fresh cage args per call (no memoization)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import bench_edit_rebake  # noqa: F401  (reuse its cube_mesh shape)
from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.editing.cage import Cage
from nerfshop_tpu.editing.operators import CageDeformationOp, operator_roi_aabb
from nerfshop_tpu.editing.tet_mesh import TetMesh
from nerfshop_tpu.geometry.mesh_io import TriMesh
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import coords
from nerfshop_tpu.render import baked

LUT_RES = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def cube_mesh(lo, hi):
    v = np.array(
        [[lo, lo, lo], [hi, lo, lo], [lo, hi, lo], [hi, hi, lo],
         [lo, lo, hi], [hi, lo, hi], [lo, hi, hi], [hi, hi, hi]], np.float32)
    f = np.array(
        [[0, 2, 1], [1, 2, 3], [4, 5, 6], [5, 7, 6], [0, 1, 4], [1, 5, 4],
         [2, 6, 3], [3, 6, 7], [0, 4, 2], [2, 4, 6], [1, 3, 5], [3, 7, 5]], np.int32)
    return TriMesh(v, f)


model = build_nerf_network(default_nerf_config(), aabb_scale=1)
params = model.init(jax.random.PRNGKey(0))
aabb = coords.BoundingBox.from_aabb_scale(1)

cage = Cage.from_mesh(cube_mesh(0.35, 0.65))
tm = TetMesh.from_cage(cage, ideal_edge=0.08)
tm.update_deformed(cage)
op = CageDeformationOp.from_tet_mesh(tm, lut_res=LUT_RES)
print(f"lut_res={LUT_RES} MT={op.lut_def.cells.shape[1]}", flush=True)

vol = baked.bake_volume(model, params, aabb, resolution=256, operators=(op,))
jax.block_until_ready(vol.fields[0])


def drag(vol, op_prev, offset, ops):
    t0 = time.perf_counter()
    cage.translate(np.asarray([offset, 0.0, 0.0], np.float32))
    tm.update_deformed(cage)
    op = CageDeformationOp.from_tet_mesh(tm, lut_res=LUT_RES)
    t_lut = time.perf_counter() - t0
    lo_a, hi_a = operator_roi_aabb(op_prev)
    lo_b, hi_b = operator_roi_aabb(op)
    t0 = time.perf_counter()
    vol = baked.update_volume_region(
        vol, model, params, aabb,
        np.minimum(lo_a, lo_b), np.maximum(hi_a, hi_b),
        operators=(op,) if ops else (),
    )
    jax.block_until_ready(vol.fields[0])
    float(np.asarray(vol.fields[0][0, 0, 0, 0]))
    return vol, op, t_lut, time.perf_counter() - t0


for label, ops in (("field-only patch", False), ("with op stack   ", True)):
    v, o = vol, op
    ts = []
    for i, off in enumerate((0.05, 0.03, 0.02, 0.015)):
        v, o, t_lut, t_patch = drag(v, o, off, ops)
        ts.append(t_patch)
    print(f"{label}: patch {min(ts[2:])*1e3:7.0f} ms (lut {t_lut*1e3:4.0f} ms) all={[round(t*1e3) for t in ts]}", flush=True)
    # reset cage back
    cage.translate(np.asarray([-sum((0.05, 0.03, 0.02, 0.015)), 0.0, 0.0], np.float32))
    tm.update_deformed(cage)
