import numpy as np, jax.numpy as jnp
from nerfshop_tpu import Testbed, TestbedMode
from nerfshop_tpu.data import nerf_loader, image_io

tb = Testbed(TestbedMode.Nerf)
tb.load_snapshot("/tmp/fox.ingp")
print("loaded snapshot, step:", tb.stats.step, "aabb:", tb._dataset.aabb_scale, flush=True)
ds = nerf_loader.load_nerf("/root/reference/data/nerf/fox/transforms.json", downscale=4, max_images=2)
gt = ds.images[0]
H, W = gt.shape[:2]
intr = ds.intrinsics[0]
print("view res:", W, H, "focal:", intr.focal, "principal:", intr.principal, flush=True)
tb.background_color = np.array([0,0,0,1], np.float32)
img = tb.render(W, H, spp=1, camera_matrix=ds.xforms[0], focal=intr.focal,
                principal=intr.principal, distortion=intr.distortion)
print("render opacity mean:", float(img[...,3].mean()), "rgb mean:", float(img[...,:3].mean()), flush=True)
print("gt rgb mean:", float(gt[...,:3].mean()), flush=True)
image_io.write_image("scratch/fox_eval_render.png", img, linear_input=False)
image_io.write_image("scratch/fox_eval_gt.png", gt, linear_input=False)
# default look-at render for comparison
img2 = tb.render(96, 96, spp=1)
print("default cam opacity:", float(img2[...,3].mean()), "rgb mean:", float(img2[...,:3].mean()), flush=True)
