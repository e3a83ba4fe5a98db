import time
import sys
sys.path.insert(0, "/root/repo")
import bench
t0 = time.perf_counter()
fps = bench.bench_render()
print(f"exact tiled 1080p: {fps:.3f} fps  ({1/fps:.2f} s/frame)  [total incl compile {time.perf_counter()-t0:.0f}s]", flush=True)
fps_i, bake_s = bench.bench_render_interactive()
print(f"baked interactive 1080p: {fps_i:.1f} fps  bake {bake_s:.2f}s", flush=True)
