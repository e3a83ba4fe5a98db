"""Headline benchmark, measured honestly on one chip.

Methodology note: the serving runtime memoizes repeated identical
executions, so naive timing loops (same jitted fn, same args) report cached
round-trips, not device time (round 1's "1.84 G samples/s" was exactly this
artifact). Every measurement here forms a dependency chain — iteration i+1
consumes iteration i's output — so the device must execute every step.

Metrics:
  * train_samples_per_sec — full NeRF train steps (march + forward + loss +
    backward + Adam) on a synthetic scene at batch 2^18, steady state.
  * render_fps_1080p    — one 1920×1080 frame through the jitted
    chunked renderer (march + field eval + composite), steady state.
  * field_eval_samples_per_sec — hash-encode + MLP forward alone.

Primary line: train_samples_per_sec vs the reference's effective training
throughput (batch 2^18 × ~30 steps/s that "fox in 5 s" implies on a 3090
≈ 8e6 samples/s... the north-star BASELINE.json uses 1e9 field-eval
samples/s; we report field eval in extras for continuity).
"""

import json
import os
import time

# persistent jit cache: the driver may invoke bench.py without the env set;
# reusing /root/.jax_cache skips minutes of remote recompiles per program
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BASELINE_TRAIN_SAMPLES_PER_SEC = 8e6  # 2^18 batch × ~30 steps/s (3090, fox<5s)
BASELINE_FIELD_EVAL = 1e9  # BASELINE.md north star
BASELINE_FPS_1080P = 15.0  # >15 fps 1080p (docs/index.html:316)


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def ring_rig(n_views, radius=1.0, center=(0.5, 0.5, 0.5), y=0.9):
    """[n,3,4] c2w matrices on a ring looking at ``center`` — the shape of
    every real capture rig (reference datasets aim cameras at the subject).
    The identity rig used through round 3 placed all cameras at the AABB
    CORNER looking +z, so 75% of training rays missed the box entirely and
    the measured slab fill was just the ray-hit fraction (0.25)."""
    import numpy as np

    c = np.asarray(center, np.float32)
    out = np.zeros((n_views, 3, 4), np.float32)
    for i in range(n_views):
        th = 2 * np.pi * i / n_views
        pos = c + np.asarray([radius * np.cos(th), y - c[1], radius * np.sin(th)], np.float32)
        f = c - pos
        f /= np.linalg.norm(f)
        r = np.cross(f, np.asarray([0.0, 1.0, 0.0], np.float32))
        r /= max(np.linalg.norm(r), 1e-9)
        d = np.cross(f, r)  # image y grows down
        out[i, :, 0], out[i, :, 1], out[i, :, 2], out[i, :, 3] = r, d, f, pos
    return out


def bench_network_config():
    """Network config the throughput benches run: the TPU-tuned fast
    config (L8 hash — see nerfshop_tpu/config.py:fast_nerf_config for the
    measured speed/quality trade) unless NERFSHOP_BENCH_CONFIG=reference
    pins the tcnn-parity L16 config for A/Bs. bench_fox reports PSNR under
    the SAME config so the quality of the headline numbers is on record."""
    from nerfshop_tpu.config import default_nerf_config, fast_nerf_config

    if os.environ.get("NERFSHOP_BENCH_CONFIG", "fast") == "reference":
        return default_nerf_config()
    return fast_nerf_config()


def bench_train():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfshop_tpu.models.nerf_network import build_nerf_network
    from nerfshop_tpu.ops import grid as grid_lib
    from nerfshop_tpu.train import nerf as nerf_train
    from nerfshop_tpu.train import optim

    model = build_nerf_network(bench_network_config(), aabb_scale=1)
    spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15})
    state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
    grid = grid_lib.OccupancyGrid.create(1)

    batch = 1 << 18
    rng = np.random.default_rng(0)
    n_views, res = 8, 256
    data = nerf_train.DeviceDataset(
        images=jnp.asarray(rng.uniform(0, 1, (n_views, res, res, 4)).astype(np.float32)),
        xforms=jnp.asarray(ring_rig(n_views)),
        focals=jnp.full((n_views, 2), 180.0),
        principals=jnp.full((n_views, 2), 0.5),
        distortions=jnp.zeros((n_views, 4)),
    )

    def build_loops(k):
        cfg = nerf_train.NerfTrainConfig(
            n_rays_per_batch=max(64, batch // k), k_samples=k, aabb_scale=1, n_cascades=1
        )
        return cfg, {
            n: jax.jit(nerf_train.make_train_loop(model, spec, cfg, n), donate_argnums=(0,))
            for n in (1, 16)
        }

    k_samples = 32
    cfg, loops = build_loops(k_samples)
    step = jax.jit(nerf_train.make_train_step(model, spec, cfg), donate_argnums=(0,))
    grid_update = nerf_train.make_grid_update(model, cfg)

    key = jax.random.PRNGKey(1)
    # warm-up / compile + grid convergence
    for i in range(4):
        key, k1 = jax.random.split(key)
        state, aux = step(state, grid, data, k1)
    grid = grid_update(grid, state.params, key, full_refresh=True)
    float(np.asarray(aux["loss"]))

    # Adaptive (rays, K) bucketing — the Testbed's fill control (testbed.py
    # bucket adjustment; reference auto-scales rays/batch via Counters,
    # testbed_nerf.cu:3668): pick K so the [R, K] slab carries mostly REAL
    # samples. Round 4's double/halve loop stalled at fill 0.62 (its 0.08
    # overflow threshold let K overshoot); this one solves for K directly
    # from the measured mean samples/ray (K ≈ s̄ / 0.88, multiples of 8) and
    # only grows K when the march truncates. Floor 8 (the Testbed floors at
    # 32 for training robustness; here the metric is honest throughput).
    # No overflow-grow branch: the training march is "spread" selection —
    # a ray with more occupied cells than K subsamples its WHOLE path with
    # stride-scaled dt (coarser quadrature, reference-budget style), so
    # overflow does not invalidate samples and growing K on it just dilutes
    # fill (the r5 first cut grew to K=304 at fill 0.57; r4's double/halve
    # stalled at 0.62@256 the same way). K trades march cost (∝ rays =
    # batch/K) against slab fill (dead eval rows), so the bucket is chosen
    # by MEASURED real rate over a small grid — the analog of the
    # reference's rays/batch auto-scaling by measured samples (Counters,
    # testbed_nerf.cu:3668).
    best = None
    for k in (32, 48, 64, 96):
        cfg, loops = build_loops(k)
        key, k1, k2 = jax.random.split(key, 3)
        state, ys = loops[16](state, grid, data, k1)  # warm/compile
        float(np.asarray(ys["loss"])[-1])
        t0 = time.perf_counter()
        state, ys = loops[16](state, grid, data, k2)
        float(np.asarray(ys["loss"])[-1])
        dt16 = time.perf_counter() - t0
        slab = cfg.n_rays_per_batch * cfg.k_samples
        fill = float(np.asarray(ys["measured_samples"]).mean()) / slab
        rate = slab * fill / (dt16 / 16.0)
        if best is None or rate > best[0]:
            best = (rate, k)
    k_samples = best[1]
    cfg, loops = build_loops(k_samples)

    # the shipped trainer runs 16 steps per device program (make_train_loop,
    # the reference's steps-per-frame); per-step rng folds inside, the state
    # is the scan carry — the relay can neither elide nor memoize steps.
    # Timing: t(16-step program) − t(1-step program) cancels dispatch.
    key, k1, k2, k3, k4 = jax.random.split(key, 5)
    state, ys = loops[16](state, grid, data, k1)  # warm/compile
    float(np.asarray(ys["loss"])[-1])
    state, ys = loops[1](state, grid, data, k2)
    float(np.asarray(ys["loss"])[-1])
    t0 = time.perf_counter()
    state, ys = loops[1](state, grid, data, k3)
    float(np.asarray(ys["loss"])[-1])
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, ys = loops[16](state, grid, data, k4)
    float(np.asarray(ys["loss"])[-1])
    t_16 = time.perf_counter() - t0
    dt = (t_16 - t_one) / 15.0
    # the reference's 2^18 batch is compacted REAL samples (fill_rollover,
    # testbed_nerf.cu:4387) — real measured samples per second is the
    # apples-to-apples headline; the padded slab rate is the extra.
    slab = cfg.n_rays_per_batch * cfg.k_samples
    fill = float(np.asarray(ys["measured_samples"]).mean()) / slab
    return {
        "train_real_samples_per_sec": slab * fill / dt,
        "train_steps_per_sec_batch2^18": 1.0 / dt,
        "train_slab_samples_per_sec": slab / dt,
        "train_slab_fill_frac": fill,
        "train_k_bucket": k_samples,
    }


def bench_render():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfshop_tpu.models.nerf_network import build_nerf_network
    from nerfshop_tpu.ops import grid as grid_lib
    from nerfshop_tpu.render import renderer

    model = build_nerf_network(bench_network_config(), aabb_scale=1)
    params = model.init(jax.random.PRNGKey(0))
    grid = grid_lib.OccupancyGrid.create(1)
    # a realistic occupancy: ~3% occupied ball in the center
    g = (np.arange(128) + 0.5) / 128
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    occ = ((xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2) < 0.2**2
    grid = grid._replace(
        occupancy=jnp.asarray(occ[None]),
        density=jnp.where(jnp.asarray(occ[None]), 5.0, 0.0),
    )

    W, H = 1920, 1080
    xf = jnp.asarray(
        [[1.0, 0.0, 0.0, 0.5], [0.0, 1.0, 0.0, 0.5], [0.0, 0.0, 1.0, -0.8]], jnp.float32
    )
    focal = jnp.asarray([H * 1.2, H * 1.2])
    # chunk 2^13 measured best at 1080p (r5 sweep: 0.661 / 0.652 / 0.627
    # fps at 2^13/2^14/2^15; 2^17 HALVES fps — big fused programs lose the
    # dispatch overlap and XLA efficiency the small chunks get)
    opts = renderer.RenderOptions(aabb_scale=1, chunk=1 << 13)

    # warm/compile at FULL resolution (ray/cull/march/eval programs are
    # cached per resolution), then time a steady frame from a perturbed
    # camera — identical args would hit the serving runtime's execution
    # memoization and report a cached round-trip
    import numpy as np

    warm = renderer.render_frame_tiled(model, params, grid, (W, H), xf, focal, opts=opts)
    float(np.asarray(warm.rgba[0, 0, 0]))
    xf2 = xf.at[0, 3].add(1e-3)
    t0 = time.perf_counter()
    out = renderer.render_frame_tiled(model, params, grid, (W, H), xf2, focal, opts=opts)
    float(np.asarray(out.rgba[0, 0, 0]))  # host round-trip forces the chain
    dt = time.perf_counter() - t0
    return 1.0 / dt


def bench_render_interactive():
    """Baked shear-warp interactive path (render/baked.py): bake once,
    then steady-state 1080p frames with per-frame camera updates."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfshop_tpu.render import baked

    B = 256
    g = (jnp.arange(B) + 0.5) / B
    zz, yy, xx = jnp.meshgrid(g, g, g, indexing="ij")
    r2 = (xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2
    sig = jnp.where(r2 < 0.2**2, 15.0, 0.0)
    rgb = jnp.stack([xx, yy, zz], -1)

    t0 = time.perf_counter()
    vol = baked.BakedVolume.from_canonical(rgb, sig, jnp.zeros(3), jnp.ones(3))
    jax.block_until_ready(vol.fields[0])
    bake_layout_s = time.perf_counter() - t0

    W, H = 1920, 1080
    focal = np.asarray([H * 1.2, H * 1.2], np.float32)
    xf0 = np.asarray(
        [[-1, 0, 0, 0.5], [0, 1, 0, 0.5], [0, 0, -1, 2.1]], np.float32
    )
    out = baked.render_baked(vol, (W, H), xf0, focal, with_depth=False, base_resolution=384)
    jax.block_until_ready(out.rgba)
    float(np.asarray(out.rgba[0, 0, 0]))

    n = 8
    outs = []
    t0 = time.perf_counter()
    for i in range(n):
        xf = xf0.copy()
        xf[0, 3] += 0.003 * (i + 1)  # moving camera: no two frames alike
        o = baked.render_baked(vol, (W, H), xf, focal, with_depth=False, base_resolution=384)
        outs.append(o.rgba)
    for o in outs:
        jax.block_until_ready(o)
    # consume on host so the serving runtime cannot elide any frame
    _ = sum(float(np.asarray(o[0, 0, 0])) for o in outs)
    dt = (time.perf_counter() - t0) / n
    return 1.0 / dt, bake_layout_s


def bench_edit_rebake():
    """Edit → rebake latency for the interactive viewer loop (VERDICT r2
    #3): bake_volume (256³ field eval through a cage-deformation operator
    stack) + the shear-warp layout build. Warm timings — the viewer rebakes
    with compiled programs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfshop_tpu.editing.cage import Cage
    from nerfshop_tpu.editing.operators import CageDeformationOp
    from nerfshop_tpu.editing.tet_mesh import TetMesh
    from nerfshop_tpu.models.nerf_network import build_nerf_network
    from nerfshop_tpu.ops import coords
    from nerfshop_tpu.geometry.mesh_io import TriMesh
    from nerfshop_tpu.render import baked

    def cube_mesh(lo, hi):
        v = np.array(
            [[lo, lo, lo], [hi, lo, lo], [lo, hi, lo], [hi, hi, lo],
             [lo, lo, hi], [hi, lo, hi], [lo, hi, hi], [hi, hi, hi]], np.float32
        )
        f = np.array(
            [[0, 2, 1], [1, 2, 3], [4, 5, 6], [5, 7, 6], [0, 1, 4], [1, 5, 4],
             [2, 6, 3], [3, 6, 7], [0, 4, 2], [2, 4, 6], [1, 3, 5], [3, 7, 5]],
            np.int32,
        )
        return TriMesh(v, f)

    from nerfshop_tpu.editing import operators as op_lib

    model = build_nerf_network(bench_network_config(), aabb_scale=1)
    params = model.init(jax.random.PRNGKey(0))
    aabb = coords.BoundingBox.from_aabb_scale(1)

    cage = Cage.from_mesh(cube_mesh(0.35, 0.65))
    tm = TetMesh.from_cage(cage, ideal_edge=0.08)
    tm.update_deformed(cage)
    op = CageDeformationOp.from_tet_mesh(tm)

    # one full bake up front (a NEW edit pays this once); drags after that
    # go through the incremental ROI path exactly like
    # Testbed.bake_interactive does in the viewer loop
    t0 = time.perf_counter()
    vol = baked.bake_volume(model, params, aabb, resolution=256, operators=(op,))
    jax.block_until_ready(vol.fields[0])
    float(np.asarray(vol.fields[0][0, 0, 0, 0]))
    t_full = time.perf_counter() - t0

    def rebake(vol, op_prev, offset):
        t0 = time.perf_counter()
        cage.translate(np.asarray([offset, 0.0, 0.0], np.float32))
        tm.update_deformed(cage)
        op = CageDeformationOp.from_tet_mesh(tm)  # per-drag LUT rebuild
        t_lut = time.perf_counter() - t0
        lo_a, hi_a = op_lib.operator_roi_aabb(op_prev)
        lo_b, hi_b = op_lib.operator_roi_aabb(op)
        vol = baked.update_volume_region(
            vol, model, params, aabb,
            np.minimum(lo_a, lo_b), np.maximum(hi_a, hi_b), operators=(op,),
        )
        jax.block_until_ready(vol.fields[0])
        float(np.asarray(vol.fields[0][0, 0, 0, 0]))
        return vol, op, t_lut, time.perf_counter() - t0

    # two warm drags: the ROI dim bucket grows with the cumulative drag
    # (96→128 cells here), and each bucket is its own compiled program —
    # measuring on a fresh bucket times a compile, not a rebake
    vol, op, _, _ = rebake(vol, op, 0.05)
    vol, op, _, _ = rebake(vol, op, 0.03)
    _, _, t_lut, t_total = rebake(vol, op, 0.02)  # fresh args: no memoization
    return t_total, t_lut, t_full


def bench_field_eval():
    import jax
    import jax.numpy as jnp

    from nerfshop_tpu.models.nerf_network import build_nerf_network

    model = build_nerf_network(bench_network_config(), aabb_scale=1)
    params = model.init(jax.random.PRNGKey(0))
    n = 1 << 18

    # IN-PROGRAM dependency chain (VERDICT r2 #2): K evals inside ONE
    # executable via lax.fori_loop, each consuming the previous eval's
    # outputs — the relay can neither elide nor memoize iterations, and
    # per-dispatch tunnel latency cancels in the t(K) − t(1) difference.
    def make_chain(iters):
        @jax.jit
        def chain(params, pos, dirs):
            def body(i, carry):
                p, acc = carry
                rgb, sigma = model(params, p, dirs)
                p2 = jnp.clip(p + rgb * 1e-6, 0.0, 1.0)
                return p2, acc + jnp.sum(sigma) % 32.0

            p, acc = jax.lax.fori_loop(0, iters, body, (pos, jnp.zeros(())))
            return p[0, 0] + acc

        return chain

    import numpy as np

    pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    c1, c32 = make_chain(1), make_chain(32)
    float(np.asarray(c1(params, pos, dirs)))
    float(np.asarray(c32(params, pos, dirs)))
    pos2 = jax.random.uniform(jax.random.PRNGKey(3), (n, 3))
    t0 = time.perf_counter()
    float(np.asarray(c1(params, pos2, dirs)))
    t_one = time.perf_counter() - t0
    pos3 = jax.random.uniform(jax.random.PRNGKey(4), (n, 3))
    t0 = time.perf_counter()
    float(np.asarray(c32(params, pos3, dirs)))
    t_32 = time.perf_counter() - t0
    dt = (t_32 - t_one) / 31.0
    return n / dt


FOX_SCENE = "/root/reference/data/nerf/fox"


def bench_fox():
    """Real-capture anchor (reference README.md:226 — "fox in under 5 s"):
    train steps/s on the fox scene, then PSNR via the run.py eval protocol
    (scripts/run.py:228-302 counterpart: EXACT render path, black bg,
    min_transmittance 1e-4, sRGB compositing of GT over black) on an
    evenly-subsampled view set at ¼ res. Round 4's 20.24 dB was the tiled
    path's approximation error (the builder-run bench with the exact path
    scored 27.19 dB on the same config) — eval now pins exact=True, and the
    tiled-vs-exact and baked-vs-exact deltas are reported as their own
    extras (VERDICT r4 asks #3 and #7)."""
    import numpy as np

    from nerfshop_tpu import Testbed, TestbedMode
    from nerfshop_tpu.data import nerf_loader
    from nerfshop_tpu.utils import metrics

    tb = Testbed(TestbedMode.Nerf)
    # run the same network config as the throughput benches so the reported
    # PSNR is the quality of the headline numbers (fast L8: 27.30 dB fox vs
    # 27.57 reference-config, probe_fox_f4l8)
    tb.reload_network_from_json(dict(bench_network_config()))
    tb.load_training_data(FOX_SCENE)
    tb.train(32, 1 << 18)  # warm/compile + grid convergence outside the clock
    n_steps = int(os.environ.get("NERFSHOP_BENCH_FOX_STEPS", "2048"))
    t0 = time.perf_counter()
    tb.train(n_steps, 1 << 18)
    dt = time.perf_counter() - t0

    # eval protocol: every view is a training view on fox (the scene ships
    # no test split); run.py's --eval_subsample analog keeps the bench
    # bounded while covering the whole ring, spp from env (protocol is 8;
    # the default here trades spp for view coverage inside the bench budget)
    subsample = int(os.environ.get("NERFSHOP_BENCH_FOX_EVAL_SUBSAMPLE", "10"))
    spp = int(os.environ.get("NERFSHOP_BENCH_FOX_EVAL_SPP", "2"))
    ds = nerf_loader.load_nerf(FOX_SCENE + "/transforms.json", downscale=4)
    tb.nerf.render_min_transmittance = 1e-4
    tb.background_color = np.asarray([0, 0, 0, 1], np.float32)
    tb.dynamic_res = False
    psnrs, psnrs_tiled = [], []
    t_render = t_render_tiled = None
    views = list(range(0, ds.n_images, subsample))
    for i in views:
        gt = np.asarray(ds.images[i])
        H, W = gt.shape[:2]
        intr = ds.intrinsics[i]
        kw = dict(
            camera_matrix=ds.xforms[i], focal=intr.focal,
            principal=intr.principal, distortion=intr.distortion,
        )
        t1 = time.perf_counter()
        img = np.asarray(tb.render(W, H, spp=spp, linear=False, exact=True, **kw))
        t_render = time.perf_counter() - t1
        gt_rgb = gt[..., :3] * gt[..., 3:4]
        psnrs.append(float(metrics.psnr(img[..., :3], gt_rgb)))
        if i == views[0]:
            # interactive tiled path on the same view: quantifies the tile
            # approximation on a REAL trained scene (the synthetic-ball
            # 30 dB gate demonstrably does not transfer)
            t1 = time.perf_counter()
            img_t = np.asarray(tb.render(W, H, spp=1, linear=False, exact=False, **kw))
            t_render_tiled = time.perf_counter() - t1
            psnrs_tiled.append(float(metrics.psnr(img_t[..., :3], gt_rgb)))

    out = {
        "fox_train_steps_per_sec": n_steps / dt,
        "fox_train_steps": n_steps + 32,
        "fox_eval_views": len(views),
        "fox_eval_spp": spp,
        "fox_psnr_quarter_res": float(np.mean(psnrs)),
        "fox_exact_render_seconds_quarter_res": t_render / max(spp, 1),
        "fox_tiled_render_seconds_quarter_res": t_render_tiled,
        "fox_psnr_tiled_quarter_res": float(np.mean(psnrs_tiled)),
    }

    # interactive-baked path on the TRAINED network (VERDICT r4 ask #7):
    # real bake_volume time through the fox network + baked-vs-exact PSNR
    # for the first eval view — ties the 17 fps headline to quality.
    try:
        import jax

        i = views[0]
        gt = np.asarray(ds.images[i])
        H, W = gt.shape[:2]
        t0 = time.perf_counter()
        tb.bake_interactive()
        jax.block_until_ready(tb._baked.fields[0])
        out["fox_bake_volume_seconds"] = time.perf_counter() - t0
        # warm re-bake with genuinely-new params (1 train step): the cold
        # number above is dominated by the first remote compile
        tb.train(1, 1 << 15)
        t0 = time.perf_counter()
        tb.bake_interactive(force_full=True)
        jax.block_until_ready(tb._baked.fields[0])
        float(np.asarray(tb._baked.fields[0][0, 0, 0, 0]))
        out["fox_bake_volume_warm_seconds"] = time.perf_counter() - t0
        img_exact = np.asarray(
            tb.render(W, H, spp=1, linear=False, exact=True,
                      camera_matrix=ds.xforms[i], focal=ds.intrinsics[i].focal,
                      principal=ds.intrinsics[i].principal,
                      distortion=ds.intrinsics[i].distortion)
        )
        img_baked = np.asarray(
            tb.render_interactive(W, H, camera_matrix=ds.xforms[i],
                                  focal=ds.intrinsics[i].focal)
        )
        out["fox_interactive_vs_exact_psnr_db"] = float(
            metrics.psnr(img_baked[..., :3], img_exact[..., :3])
        )
    except Exception as e:  # noqa: BLE001 — quality extra must not kill fox bench
        out["error_fox_interactive"] = f"{type(e).__name__}: {e}"[:200]
    return out


def main():
    # Per-bench isolation (VERDICT r3 weak #1): one crashing sub-bench must
    # report an error extra, not zero the whole round's evidence.
    extras = {}

    def run(name, fn):
        try:
            out = fn()
            if isinstance(out, dict):
                extras.update(out)
            return out
        except Exception as e:  # noqa: BLE001 — the bench must always print
            import traceback

            traceback.print_exc()
            extras["error_" + name] = f"{type(e).__name__}: {e}"[:500]
            return None

    run("train", bench_train)

    fps = run("render", bench_render)
    if fps is not None:
        extras["render_fps_1080p_exact"] = fps

    inter = run("render_interactive", bench_render_interactive)
    if inter is not None:
        fps_interactive, bake_s = inter
        extras["render_fps_1080p_interactive_baked"] = fps_interactive
        extras["render_fps_vs_baseline"] = fps_interactive / BASELINE_FPS_1080P
        extras["bake_layout_seconds"] = bake_s

    reb = run("edit_rebake", bench_edit_rebake)
    if reb is not None:
        (
            extras["edit_rebake_seconds"],
            extras["edit_rebake_lut_seconds"],
            extras["edit_rebake_full_seconds"],
        ) = reb

    field = run("field_eval", bench_field_eval)
    if field is not None:
        extras["field_eval_samples_per_sec"] = field
        extras["field_eval_vs_north_star"] = field / BASELINE_FIELD_EVAL

    if os.path.isdir(FOX_SCENE) and os.environ.get("NERFSHOP_BENCH_FOX", "1") != "0":
        run("fox", bench_fox)

    real_sps = extras.get("train_real_samples_per_sec", 0.0)
    print(
        json.dumps(
            {
                "metric": "nerf_train_throughput_real_samples",
                "value": real_sps,
                "unit": "samples/sec",
                "vs_baseline": real_sps / BASELINE_TRAIN_SAMPLES_PER_SEC,
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
