import time, jax, jax.numpy as jnp, numpy as np
t00 = time.perf_counter()
from nerfshop_tpu import Testbed, TestbedMode
tb = Testbed(TestbedMode.Nerf)
tb.load_training_data("/root/reference/data/nerf/fox")
print(f"loaded fox in {time.perf_counter()-t00:.1f}s  aabb_scale={tb._dataset.aabb_scale}", flush=True)

t0 = time.perf_counter()
loss = tb.train(16, 1 << 18)   # includes compile
print(f"first 16 steps (compile incl): {time.perf_counter()-t0:.1f}s loss={loss:.4f}", flush=True)

t0 = time.perf_counter()
for _ in range(6):
    loss = tb.train(16, 1 << 18)
dt = time.perf_counter() - t0
print(f"steady: {96/dt:.2f} steps/s  loss={loss:.4f}", flush=True)

# continue to 1024 steps total for a meaningful render
t0 = time.perf_counter()
while tb.stats.step < 1024:
    loss = tb.train(64, 1 << 18)
print(f"to 1024 steps: +{time.perf_counter()-t0:.1f}s loss={loss:.5f}", flush=True)

# renders
for (w, h) in ((320, 180), (1920, 1080)):
    t0 = time.perf_counter()
    img = tb.render(w, h, spp=1)
    dt1 = time.perf_counter() - t0   # includes compile
    t0 = time.perf_counter()
    img = tb.render(w, h, spp=1)
    dt2 = time.perf_counter() - t0
    print(f"render {w}x{h}: first {dt1:.2f}s, second {dt2*1e3:.0f} ms ({1/dt2:.2f} fps)  opacity_mean={float(img[...,3].mean()):.3f}", flush=True)
from nerfshop_tpu.data import image_io
image_io.write_image("scratch/fox_1080p.png", img, linear_input=False)
print("wrote scratch/fox_1080p.png")
