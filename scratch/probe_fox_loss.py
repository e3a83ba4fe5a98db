import numpy as np, jax, jax.numpy as jnp
from nerfshop_tpu import Testbed, TestbedMode
from nerfshop_tpu.train import nerf as nerf_train
from nerfshop_tpu.data import nerf_loader

tb = Testbed(TestbedMode.Nerf)
tb.load_snapshot("/tmp/fox.ingp")
ds = nerf_loader.load_nerf("/root/reference/data/nerf/fox/transforms.json", downscale=4, max_images=8)
data = nerf_train.DeviceDataset.from_dataset(ds)
cfg = tb._train_cfg
grads_of = nerf_train.make_grad_fn(tb._model, nerf_train.NerfTrainConfig(
    n_rays_per_batch=4096, k_samples=32, aabb_scale=4, n_cascades=cfg.n_cascades,
    cone_angle=cfg.cone_angle, random_bg=False))
_, aux = jax.jit(grads_of)(tb._state.params, tb._grid, data, jax.random.PRNGKey(0))
print("loss with snapshot params:", float(aux["loss"]), flush=True)
print("mean_opacity:", float(aux["mean_opacity"]), "measured:", int(aux["measured_samples"]), flush=True)
# field probe: density/rgb at the scene center region
from nerfshop_tpu.ops import coords
pos = jnp.asarray(np.random.default_rng(0).uniform(0.3, 0.7, (4096, 3)).astype(np.float32))
aabb = coords.BoundingBox.from_aabb_scale(4)
pw = jnp.clip(coords.warp_position(pos, aabb), 0, 1)
rgb, sigma = tb._model(tb._state.inference_params, pw, jnp.full((4096,3), 0.5))
print("center field: sigma median", float(jnp.median(sigma)), "max", float(sigma.max()),
      "rgb mean", float(rgb.mean()), flush=True)
# grid stats
print("grid occ frac:", float(tb._grid.occupancy.mean()), "density max:", float(tb._grid.density.max()), flush=True)
