"""Interactive bake/rebake loop (VERDICT r4 ask #6): the content-keyed
rebake (testbed.py _interactive_key / _edit_stack_fingerprint) and the
incremental ROI rebake (render/baked.update_volume_region) — bake, drag an
APPLIED operator (new arrays, same stack shape), assert the next
render_interactive rebakes incrementally and the frame changes, and that
the incremental bake matches a forced full bake.

Reference behavior pinned: per-manipulation rebuild of the tet grid +
density refresh (src/testbed.cu:1266, tet_mesh.cu:369)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tb():
    import subprocess
    import sys
    import os

    if not os.path.exists("/tmp/verify_scene/transforms.json"):
        subprocess.run([sys.executable, "scratch/make_verify_scene.py"], check=True)
    from nerfshop_tpu import Testbed, TestbedMode

    t = Testbed(TestbedMode.Nerf)
    t.load_training_data("/tmp/verify_scene")
    t.train(60, 8192)
    t.interactive_bake_resolution = 64
    return t


def _dup_op(offset_x: float):
    from nerfshop_tpu.editing.operators import AffineDuplicationOp

    return AffineDuplicationOp.create(
        center=[0.5, 0.5, 0.5],
        half_extents=[0.12, 0.12, 0.12],
        transform_t=[offset_x, 0.0, 0.0],
        hide_original=True,
    )


def test_drag_triggers_incremental_rebake_and_frame_change(tb):
    tb.add_edit_operator(_dup_op(0.18))
    img1 = tb.render_interactive(48, 32)
    assert getattr(tb, "_baked", None) is not None
    assert tb.last_bake_incremental is False  # first bake of this stack: full
    key1 = tb._baked_key

    # rendering again without changes must NOT rebake (key stable)
    tb.render_interactive(48, 32)
    assert tb._baked_key == key1
    assert tb.last_bake_incremental is False

    # "drag": replace the applied operator with fresh arrays (the viewer's
    # _reapply path builds a brand-new operator per manipulation)
    tb.replace_edit_operator(0, _dup_op(0.26))
    img2 = tb.render_interactive(48, 32)
    assert tb._baked_key != key1  # content fingerprint caught the new arrays
    assert tb.last_bake_incremental is True
    assert np.abs(np.asarray(img1) - np.asarray(img2)).max() > 1e-3

    tb._edit_operators.clear()


def test_incremental_matches_full_bake(tb):
    tb._edit_operators.clear()
    # refresh_grid=False isolates the bake math: both bakes then see the
    # SAME occupancy array, so incremental-vs-full must agree bitwise-ish
    tb.add_edit_operator(_dup_op(0.18), refresh_grid=False)
    tb.bake_interactive(force_full=True)
    tb.replace_edit_operator(0, _dup_op(0.24), refresh_grid=False)
    tb.bake_interactive()
    assert tb.last_bake_incremental is True
    incr = np.asarray(tb._baked.canonical, np.float32)

    tb.bake_interactive(force_full=True)
    full = np.asarray(tb._baked.canonical, np.float32)
    # same params, same camera, same operators → identical field up to bf16
    assert np.abs(incr - full).max() < 1e-2

    tb._edit_operators.clear()


def test_training_step_invalidates_bake(tb):
    tb._edit_operators.clear()
    tb.render_interactive(48, 32)
    key = tb._baked_key
    tb.train(4, 4096)
    tb.render_interactive(48, 32)
    assert tb._baked_key != key  # step advanced → rebake
    assert tb.last_bake_incremental is False  # params changed: full
