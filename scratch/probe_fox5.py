import numpy as np, jax, jax.numpy as jnp
from nerfshop_tpu import Testbed, TestbedMode
from nerfshop_tpu.data import nerf_loader, image_io
from nerfshop_tpu.render import renderer
from nerfshop_tpu.utils import metrics

tb = Testbed(TestbedMode.Nerf)
tb.load_snapshot("/tmp/fox4.ingp")
g = tb._grid
print("occ frac per cascade:", [round(float(g.occupancy[c].mean()), 4) for c in range(g.n_cascades)], flush=True)
print("density stats: mean", float(g.density.mean()), "max", float(g.density.max()), flush=True)

ds = nerf_loader.load_nerf("/root/reference/data/nerf/fox/transforms.json", downscale=4, max_images=2)
gt = ds.images[0]; H, W = gt.shape[:2]; intr = ds.intrinsics[0]
gt_rgb = gt[..., :3] * gt[..., 3:4]

def try_render(label, **opt_kw):
    opts = renderer.RenderOptions(
        aabb_scale=tb._train_cfg.aabb_scale, cone_angle=tb._train_cfg.cone_angle,
        min_transmittance=1e-4, **opt_kw)
    out = renderer.render_frame(
        tb._model, tb._state.inference_params, g, (W, H),
        jnp.asarray(ds.xforms[0]), jnp.asarray(intr.focal), jnp.asarray(intr.principal),
        distortion=jnp.asarray(intr.distortion), opts=opts)
    img = np.asarray(out.rgba)
    psnr = metrics.psnr(img[..., :3], gt_rgb)
    print(f"{label}: psnr {psnr:.2f} opacity {img[...,3].mean():.3f} rgb {img[...,:3].mean():.3f}", flush=True)
    return img

try_render("default k32 w2 es=T", k_samples=32, n_windows=2, use_grid_early_stop=True)
try_render("k32 w2 es=OFF      ", k_samples=32, n_windows=2, use_grid_early_stop=False)
img = try_render("k256 w2 es=OFF chunk4k", k_samples=256, n_windows=2, use_grid_early_stop=False, chunk=4096)
image_io.write_image("scratch/fox5_best.png", img, linear_input=False)
image_io.write_image("scratch/fox5_gt.png", gt, linear_input=False)
