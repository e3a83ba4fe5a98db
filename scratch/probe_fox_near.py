import numpy as np
from nerfshop_tpu.render import renderer
renderer.NEAR_DISTANCE_RENDER = 0.30  # skip the untrained near region
from nerfshop_tpu import Testbed, TestbedMode
from nerfshop_tpu.data import nerf_loader, image_io

tb = Testbed(TestbedMode.Nerf)
tb.load_snapshot("/tmp/fox.ingp")
ds = nerf_loader.load_nerf("/root/reference/data/nerf/fox/transforms.json", downscale=4, max_images=2)
gt = ds.images[0]; H, W = gt.shape[:2]; intr = ds.intrinsics[0]
tb.background_color = np.array([0,0,0,1], np.float32)
img = tb.render(W, H, spp=1, camera_matrix=ds.xforms[0], focal=intr.focal,
                principal=intr.principal, distortion=intr.distortion)
print("near=0.30: opacity", float(img[...,3].mean()), "rgb mean", float(img[...,:3].mean()),
      "gt mean", float(gt[...,:3].mean()), flush=True)
mse = float(np.mean((img[...,:3] - gt[...,:3]*gt[...,3:4])**2))
print("psnr:", -10*np.log10(mse+1e-12), flush=True)
image_io.write_image("scratch/fox_near030.png", img, linear_input=False)
