"""Guards against baking large device arrays into lowered programs as
HLO constants.

Round-3 regression class: a fresh per-call ``@jax.jit`` that closes over an
edit-operator pytree embeds the operator's arrays (a cage TetLut is
[res³, MT] + per-tet matrices — 100+ MB at production sizes) into the
lowered module as dense literals. XLA:CPU compiles that happily, but the
real-hardware relay rejects the oversized upload (``HTTP 413`` — BENCH_r03's
fatal crash in ``bake_volume``). These tests lower the hot entry points with
a realistic cage operator and assert the serialized program stays small, so
the hazard is caught on CPU where the suite runs.
"""

import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.editing.cage import Cage
from nerfshop_tpu.editing.operators import CageDeformationOp
from nerfshop_tpu.editing.tet_mesh import TetMesh
from nerfshop_tpu.geometry.mesh_io import TriMesh
from nerfshop_tpu.ops import coords
from nerfshop_tpu.render import baked

# A full StableHLO module with only scalar/iota constants prints well under
# this; a single closed-over [64³, MT] LUT adds tens of MB of hex literals.
MAX_PROGRAM_TEXT_BYTES = 4 << 20


def _cube_mesh(lo: float, hi: float) -> TriMesh:
    v = np.array(
        [[lo, lo, lo], [hi, lo, lo], [lo, hi, lo], [hi, hi, lo],
         [lo, lo, hi], [hi, lo, hi], [lo, hi, hi], [hi, hi, hi]], np.float32,
    )
    f = np.array(
        [[0, 2, 1], [1, 2, 3], [4, 5, 6], [5, 7, 6], [0, 1, 4], [1, 5, 4],
         [2, 6, 3], [3, 6, 7], [0, 4, 2], [2, 4, 6], [1, 3, 5], [3, 7, 5]],
        np.int32,
    )
    return TriMesh(v, f)


def _cage_op(lut_res: int = 64) -> CageDeformationOp:
    cage = Cage.from_mesh(_cube_mesh(0.35, 0.65))
    tm = TetMesh.from_cage(cage, ideal_edge=0.1)
    cage.translate(np.asarray([0.05, 0.0, 0.0], np.float32))
    tm.update_deformed(cage)
    return CageDeformationOp.from_tet_mesh(tm, lut_res=lut_res)


class _TinyField:
    def __call__(self, params, pos, dirs=None, extra=None):
        sigma = jnp.sum(pos, axis=-1)
        return jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5]), pos.shape), sigma

    def density(self, params, pos, activated=True):
        return self(params, pos)[1]


def test_bake_volume_ships_operators_as_traced_args():
    """Lower the cached bake row-evaluator with a production-res cage LUT
    and assert the program text carries no operator-sized constants — the
    LUT must arrive as a device-buffer argument, not an HLO literal."""
    op = _cage_op(lut_res=64)
    model = _TinyField()
    B, rows = 64, 16
    fn = baked._get_bake_fn(model, B, (type(op).__name__,), has_cam=False, rows=rows)
    lo = jnp.zeros(3, jnp.float32)
    hi = jnp.ones(3, jnp.float32)
    cam = jnp.zeros(3, jnp.float32)
    kk = jnp.arange(rows, dtype=jnp.float32)
    lowered = fn.lower({}, (op,), lo, hi, cam, kk)
    n = len(lowered.as_text())
    lut_bytes = op.lut_def.cells.size * 4
    assert lut_bytes > MAX_PROGRAM_TEXT_BYTES, "test premise: LUT must dwarf the cap"
    assert n < MAX_PROGRAM_TEXT_BYTES, (
        f"bake program text is {n / 1e6:.1f} MB — an operator array is being "
        "baked in as an HLO constant (HTTP 413 on the relay, BENCH_r03)"
    )


def test_bake_volume_reuses_one_executable_across_chunks():
    """All row-chunks of one bake must hit ONE cached jitted fn (fixed
    [rows] shape, padded tail) — per-chunk fresh jits were how the closure
    constants crept in."""
    baked._BAKE_FN_CACHE.clear()
    field = _TinyField()
    aabb = coords.BoundingBox.from_aabb_scale(1)
    vol = baked.bake_volume(field, {}, aabb, resolution=32, chunk=32 * 32 * 8)
    assert len(baked._BAKE_FN_CACHE) == 1
    # padded tail chunks must not corrupt the volume (bf16 storage)
    vol2 = baked.bake_volume(field, {}, aabb, resolution=32, chunk=32 * 32 * 32)
    np.testing.assert_allclose(
        np.asarray(vol.fields[0], np.float32),
        np.asarray(vol2.fields[0], np.float32),
        rtol=0, atol=2e-2,
    )
