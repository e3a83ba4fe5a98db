import numpy as np, jax, jax.numpy as jnp, time
from nerfshop_tpu import Testbed, TestbedMode
from nerfshop_tpu.data import nerf_loader
from nerfshop_tpu.utils import metrics

tb = Testbed(TestbedMode.Nerf)
tb.load_training_data("/root/reference/data/nerf/fox")
print("aabb_scale", tb._train_cfg.aabb_scale, "casc", tb._train_cfg.n_cascades, flush=True)
t0 = time.perf_counter()
for i in range(4):
    loss = tb.train(256, 1 << 18)
    print("step", tb.stats.step, "loss", f"{loss:.5f}", f"{time.perf_counter()-t0:.0f}s", flush=True)
g = tb._grid
print("occ frac/casc", [round(float(g.occupancy[c].mean()), 4) for c in range(g.occupancy.shape[0])], flush=True)
print("density mean/max", float(g.density.mean()), float(g.density.max()), flush=True)

ds = nerf_loader.load_nerf("/root/reference/data/nerf/fox/transforms.json", downscale=4, max_images=2)
gt = np.asarray(ds.images[0]); H, W = gt.shape[:2]; intr = ds.intrinsics[0]
tb.nerf.render_min_transmittance = 1e-4
tb.background_color = np.asarray([0,0,0,1], np.float32)
tb.dynamic_res = False
img = np.asarray(tb.render(W, H, spp=1, linear=False, camera_matrix=ds.xforms[0],
                           focal=intr.focal, principal=intr.principal, distortion=intr.distortion))
print("render opacity mean", img[...,3].mean(), "rgb mean", img[...,:3].mean(), flush=True)
print("PSNR", metrics.psnr(img[...,:3], gt[...,:3]*gt[...,3:4]), flush=True)
# density along the central camera ray
from nerfshop_tpu.ops import coords, rays as rays_lib
b = rays_lib.pixel_to_ray(jnp.asarray([[W/2, H/2]], jnp.float32), jnp.asarray(ds.xforms[0]),
                          jnp.asarray(intr.focal), jnp.asarray(intr.principal), jnp.asarray([W,H],jnp.float32))
aabb = coords.BoundingBox.from_aabb_scale(tb._train_cfg.aabb_scale)
ts = jnp.linspace(0.1, 3.0, 64)
pos = b.origins + ts[:, None] * b.directions
pw = jnp.clip(coords.warp_position(pos, aabb), 0.0, 1.0)
sig = tb._model.density(tb._state.inference_params, pw)
print("sigma along center ray:", np.asarray(sig).round(2)[::4], flush=True)
