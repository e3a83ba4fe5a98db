"""Fox quality+speed A/B: reference config (L16 F2) vs TPU-native L8 F4.

Same protocol as bench_fox (2080 steps at 2^18, exact eval at 1/4 res,
5-view subsampled ring, spp 2).  Usage:
  python probe_fox_f4l8.py <n_levels> <n_features> [log2_T]
Prints steps/s and PSNR for the chosen config.
"""
import sys
import time

import numpy as np

L = int(sys.argv[1]) if len(sys.argv) > 1 else 8
F = int(sys.argv[2]) if len(sys.argv) > 2 else 4
T = int(sys.argv[3]) if len(sys.argv) > 3 else 19

from nerfshop_tpu import Testbed, TestbedMode
from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.data import nerf_loader
from nerfshop_tpu.utils import metrics

FOX_SCENE = "/root/reference/data/nerf/fox"

cfg = dict(default_nerf_config())
cfg["encoding"] = dict(cfg["encoding"])
cfg["encoding"]["n_levels"] = L
cfg["encoding"]["n_features_per_level"] = F
cfg["encoding"]["log2_hashmap_size"] = T

tb = Testbed(TestbedMode.Nerf)
tb.reload_network_from_json(cfg)
tb.load_training_data(FOX_SCENE)
tb.train(32, 1 << 18)
t0 = time.perf_counter()
tb.train(2048, 1 << 18)
dt = time.perf_counter() - t0
print(f"L{L} F{F} T{T}: {2048/dt:.2f} steps/s ({dt:.0f} s)", flush=True)

ds = nerf_loader.load_nerf(FOX_SCENE + "/transforms.json", downscale=4)
tb.nerf.render_min_transmittance = 1e-4
tb.background_color = np.asarray([0, 0, 0, 1], np.float32)
tb.dynamic_res = False
psnrs = []
for i in range(0, ds.n_images, 10):
    gt = np.asarray(ds.images[i])
    H, W = gt.shape[:2]
    intr = ds.intrinsics[i]
    img = np.asarray(
        tb.render(
            W, H, spp=2, linear=False, exact=True,
            camera_matrix=ds.xforms[i], focal=intr.focal,
            principal=intr.principal, distortion=intr.distortion,
        )
    )
    gt_rgb = gt[..., :3] * gt[..., 3:4]
    psnrs.append(float(metrics.psnr(img[..., :3], gt_rgb)))
    print(f"  view {i}: {psnrs[-1]:.2f} dB", flush=True)
print(f"L{L} F{F} T{T}: PSNR {np.mean(psnrs):.2f} dB over {len(psnrs)} views", flush=True)
