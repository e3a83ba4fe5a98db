"""End-to-end edit pipeline: train a sphere NeRF → build a cage around it →
verify the SURVEY §4f invariants: identity cage ⇒ near-identical render;
translated cage ⇒ content moves; copy mode keeps the source; edits
round-trip through save/load."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.editing import operators as op_lib
from nerfshop_tpu.editing.growing_selection import GrowingSelection
from nerfshop_tpu.ops import composite as comp
from nerfshop_tpu.ops import coords, grid as grid_lib, march, rays as rays_lib
from nerfshop_tpu.render import renderer
from nerfshop_tpu.train import nerf as nerf_train
from nerfshop_tpu.train import optim

from test_nerf_train_e2e import (
    CENTER,
    RADIUS,
    RES,
    look_at,
    make_dataset,
    small_model,
    sphere_rgba,
)


@pytest.fixture(scope="module")
def trained():
    """A briefly-trained sphere NeRF shared by the edit tests."""
    data, focal, principal = make_dataset()
    model = small_model()
    cfg = nerf_train.NerfTrainConfig(
        n_rays_per_batch=1024, k_samples=128, aabb_scale=1, n_cascades=1,
        near_distance=0.05, loss_type="Huber",
    )
    spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15})
    state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
    grid = grid_lib.OccupancyGrid.create(1)
    step = jax.jit(nerf_train.make_train_step(model, spec, cfg), donate_argnums=(0,))
    grid_update = nerf_train.make_grid_update(model, cfg, n_samples_per_cascade=32768)
    rng = jax.random.PRNGKey(1)
    for i in range(150):
        rng, k1, k2 = jax.random.split(rng, 3)
        if i % 16 == 0 and i > 0:
            grid = grid_update(grid, state.params, k2, full_refresh=False)
        state, _ = step(state, grid, data, k1)
    return model, state, grid, cfg, focal, principal


def _render(model, state, grid, cfg, focal, principal, operators=(), eye_offset=(0.9, 0.9, 0.5)):
    # Refresh the grid through the operator stack so the march samples the
    # deformed target region (reference: testbed.cu:1266). The refresh runs
    # for the base render too (empty stack) so base/edited comparisons see
    # the same EMA-refresh state. Copy first: the update donates its grid
    # argument and the fixture grid is shared across tests.
    update = nerf_train.make_grid_update(model, cfg, operators=tuple(operators))
    grid_copy = jax.tree.map(lambda a: a.copy(), grid)
    grid = update(grid_copy, state.inference_params, jax.random.PRNGKey(7), full_refresh=True)
    xf = look_at(CENTER + np.asarray(eye_offset, np.float32))
    # FULL-path sample budget (128 x 4 = 512 slots >= the occupied path at
    # the fine step under the post-refresh grid): a small first-K budget
    # truncates rays before the sphere - the renders were empty and every
    # centroid/identity gate passed vacuously (round-1 Weak #3).
    opts = renderer.RenderOptions(
        k_samples=128, n_windows=4, aabb_scale=1, min_transmittance=1e-4,
        mode=renderer.RenderMode.Shade, use_grid_early_stop=False, chunk=RES * RES,
    )
    out = renderer.render_frame(
        model, state.inference_params, grid,
        (RES, RES), jnp.asarray(xf), jnp.asarray(focal), jnp.asarray(principal),
        opts=opts, operators=tuple(operators),
    )
    return np.asarray(out.rgba)


def _build_cage_op(trained, translate=(0.0, 0.0, 0.0), copy_mode=False):
    model, state, grid, cfg, focal, principal = trained
    gs = GrowingSelection(model=model, aabb=coords.BoundingBox.unit(), cone_angle=0.0)
    # selection: voxels inside the true sphere (skip scribbles; API path)
    g = (np.arange(128) + 0.5) / 128
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    sel = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2 < (RADIUS * 1.05) ** 2
    gs.set_selection(sel, level=0)
    gs.copy_mode = copy_mode
    gs.compute_proxy()
    gs.extract_cage()
    if any(translate):
        gs.translate_cage(np.asarray(translate, np.float32))
    return gs, gs.make_operator()


@pytest.mark.slow
def test_identity_cage_render_invariance(trained):
    base = _render(*trained)
    gs, op = _build_cage_op(trained)
    edited = _render(*trained, operators=[op])
    # identity cage: renders agree everywhere up to tet-interp noise
    diff = np.abs(edited[..., :3] - base[..., :3])
    assert diff.mean() < 0.01, diff.mean()
    assert np.quantile(diff, 0.99) < 0.12


@pytest.mark.slow
def test_translated_cage_moves_content(trained):
    model, state, grid, cfg, focal, principal = trained
    base = _render(*trained, eye_offset=(0.0, -1.3, 0.0))
    shift = (0.18, 0.0, 0.0)
    gs, op = _build_cage_op(trained, translate=shift)
    edited = _render(*trained, operators=[op], eye_offset=(0.0, -1.3, 0.0))

    base_op = base[..., 3]
    ed_op = edited[..., 3]
    # mass moved: opacity centroid shifts in the translation direction
    ys, xs = np.meshgrid(np.arange(RES), np.arange(RES), indexing="ij")
    cx_base = (xs * base_op).sum() / max(base_op.sum(), 1e-6)
    cx_ed = (xs * ed_op).sum() / max(ed_op.sum(), 1e-6)
    assert cx_ed - cx_base > 2.0, (cx_base, cx_ed)  # pixels

    # vacated source is emptied: opacity near the old center drops
    c = RES // 2
    assert ed_op[c - 2 : c + 2, c - 4 : c].mean() < base_op[c - 2 : c + 2, c - 4 : c].mean()


@pytest.mark.slow
def test_copy_mode_keeps_source(trained):
    shift = (0.18, 0.0, 0.0)
    gs, op = _build_cage_op(trained, translate=shift, copy_mode=True)
    edited = _render(*trained, operators=[op], eye_offset=(0.0, -1.3, 0.0))
    base = _render(*trained, eye_offset=(0.0, -1.3, 0.0))
    # source still visible → total opacity at least the original
    assert edited[..., 3].sum() >= base[..., 3].sum() * 0.95


def test_edits_roundtrip(tmp_path, trained):
    gs, op = _build_cage_op(trained, translate=(0.1, 0.0, 0.0))
    from nerfshop_tpu.editing import serialization

    serialization.save_edits(tmp_path / "edits.json", [op])
    ops2 = serialization.load_edits(tmp_path / "edits.json")
    assert len(ops2) == 1
    p = jnp.asarray([[0.6, 0.5, 0.5]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    a = op_lib.cage_map_samples(op, p, d)
    b = op_lib.cage_map_samples(ops2[0], p, d)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)


@pytest.mark.slow
def test_membrane_blend_modes(trained):
    """Membrane blend parity (reference composite testbed_nerf.cu:770-805):
    the default "target" mode clamps density to
    min(max(sigma_target, sigma_src), sigma_src + sigma_resid) >= sigma_src, so
    per-pixel opacity never drops below the membrane-less edited render; the
    "additive" mode (sigma_src + sigma_resid) upper-bounds the target mode."""
    from nerfshop_tpu.editing import poisson as poisson_lib

    model, state, grid, cfg, focal, principal = trained
    gs, op = _build_cage_op(trained, translate=(0.12, 0.0, 0.0))
    membrane = poisson_lib.compute_membrane(
        model, state.inference_params, gs.cage, gs.tet_mesh,
        coords.BoundingBox.unit(), jax.random.PRNGKey(11),
    )
    op_m = op._replace(membrane=membrane)

    def render_with(operators, mode):
        update = nerf_train.make_grid_update(model, cfg, operators=tuple(operators))
        grid_copy = jax.tree.map(lambda a: a.copy(), grid)
        g2 = update(grid_copy, state.inference_params, jax.random.PRNGKey(7), full_refresh=True)
        xf = look_at(CENTER + np.asarray((0.9, 0.9, 0.5), np.float32))
        opts = renderer.RenderOptions(
            k_samples=128, n_windows=2, aabb_scale=1, min_transmittance=1e-4,
            use_grid_early_stop=False, chunk=RES * RES, membrane_mode=mode,
        )
        out = renderer.render_frame(
            model, state.inference_params, g2, (RES, RES),
            jnp.asarray(xf), jnp.asarray(focal), jnp.asarray(principal),
            opts=opts, operators=tuple(operators),
        )
        return np.asarray(out.rgba)

    base = render_with((op,), "target")          # no membrane attached
    tgt = render_with((op_m,), "target")
    add = render_with((op_m,), "additive")

    assert np.isfinite(tgt).all() and np.isfinite(add).all()
    # density clamp: target-mode sigma >= source sigma pixel-wise
    assert (tgt[..., 3] >= base[..., 3] - 2e-2).all()
    # additive sigma = src + resid upper-bounds the clamped target mode
    assert (add[..., 3] >= tgt[..., 3] - 2e-2).all()
    # the membrane actually does something where residuals are active
    assert np.abs(tgt - base).max() > 1e-4
