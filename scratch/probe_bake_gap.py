"""Decompose the fox interactive-vs-exact 5.5 dB gap (BENCH_r05 preview):
how much is FROZEN view-dependent shading vs bake resolution/warp?

Loads the trained fox snapshot (/tmp/fox_r5.ingp), renders one view three
ways at 1/4 res:
  A. exact            (reference term)
  B. exact-frozen-dir (model wrapper: dirs forced to bake-style per-point
                       dir from a fixed camera — isolates the shading term)
  C. baked            (render_interactive — shading + resolution + warp)
PSNR(B vs A) = shading-only loss;  PSNR(C vs A) = total (expect ~5.5);
the difference is resolution/warp.
"""
import numpy as np
import jax.numpy as jnp

from nerfshop_tpu import Testbed, TestbedMode
from nerfshop_tpu.data import nerf_loader
from nerfshop_tpu.ops import coords
from nerfshop_tpu.utils import metrics

FOX = "/root/reference/data/nerf/fox"

tb = Testbed(TestbedMode.Nerf)
tb.load_snapshot("/tmp/fox_r5.ingp")
tb.load_training_data(FOX)
tb.nerf.render_min_transmittance = 1e-4
tb.background_color = np.asarray([0, 0, 0, 1], np.float32)
tb.dynamic_res = False

ds = nerf_loader.load_nerf(FOX + "/transforms.json", downscale=4)
i = 0
gt = np.asarray(ds.images[i])
H, W = gt.shape[:2]
intr = ds.intrinsics[i]
kw = dict(
    camera_matrix=ds.xforms[i], focal=intr.focal,
    principal=intr.principal, distortion=intr.distortion,
)

img_a = np.asarray(tb.render(W, H, spp=2, linear=False, exact=True, **kw))
print("exact render done", flush=True)

# B: wrap the model so every rgb query sees the dir the BAKE would use
inner = tb._model
aabb = coords.BoundingBox.from_aabb_scale(tb._train_cfg.aabb_scale)
cam = jnp.asarray(np.asarray(ds.xforms[i])[:3, 3])


class FrozenDirModel:
    def __init__(self, inner):
        self._inner = inner

    def __getattr__(self, k):
        return getattr(self._inner, k)

    def __call__(self, params, pos, dirs, extra=None):
        p_world = aabb.min + pos * (aabb.max - aabb.min)
        d = p_world - cam
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
        dw = coords.warp_direction(d)
        if extra is not None:
            return self._inner(params, pos, dw, extra=extra)
        return self._inner(params, pos, dw)


tb._model = FrozenDirModel(inner)
from nerfshop_tpu.render import renderer

renderer._CHUNK_FN_CACHE.clear()
img_b = np.asarray(tb.render(W, H, spp=2, linear=False, exact=True, **kw))
tb._model = inner
renderer._CHUNK_FN_CACHE.clear()
print("frozen-dir render done", flush=True)

# C: baked interactive
tb.bake_interactive(force_full=True)
img_c = np.asarray(tb.render_interactive(W, H, camera_matrix=ds.xforms[i], focal=intr.focal))
print("baked render done", flush=True)

gt_rgb = gt[..., :3] * gt[..., 3:4]
for name, img in (("exact", img_a), ("frozen-dir", img_b), ("baked", img_c)):
    print(
        f"{name:12s} vs exact {metrics.psnr(img[..., :3], img_a[..., :3]):6.2f} dB"
        f" | vs GT {metrics.psnr(img[..., :3], gt_rgb):6.2f} dB",
        flush=True,
    )
