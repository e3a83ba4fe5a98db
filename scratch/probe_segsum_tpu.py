"""A/B the Pallas sorted-segsum backward vs the XLA pipeline: full train
step inside an in-program fori_loop (t(9)-t(1) differencing)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import grid as grid_lib, table_ops
from nerfshop_tpu.train import nerf as nerf_train
from nerfshop_tpu.train import optim

model = build_nerf_network(default_nerf_config(), aabb_scale=1)
spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15})
state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
grid = grid_lib.OccupancyGrid.create(1)

batch = 1 << 18
K = 32
n_rays = batch // K
cfg = nerf_train.NerfTrainConfig(n_rays_per_batch=n_rays, k_samples=K, aabb_scale=1, n_cascades=1)
rng = np.random.default_rng(0)
n_views, res = 8, 256
data = nerf_train.DeviceDataset(
    images=jnp.asarray(rng.uniform(0, 1, (n_views, res, res, 4)).astype(np.float32)),
    xforms=jnp.asarray(np.tile(np.eye(4, dtype=np.float32)[:3][None], (n_views, 1, 1))),
    focals=jnp.full((n_views, 2), 180.0),
    principals=jnp.full((n_views, 2), 0.5),
    distortions=jnp.zeros((n_views, 4)),
)

step_fn = nerf_train.make_train_step(model, spec, cfg)
grid_update = nerf_train.make_grid_update(model, cfg)

single = jax.jit(step_fn, donate_argnums=(0,))
key = jax.random.PRNGKey(1)
for i in range(4):
    key, k1 = jax.random.split(key)
    state, aux = single(state, grid, data, k1)
grid = grid_update(grid, state.params, key, full_refresh=True)
print("occ frac", float(np.asarray(grid.occupancy.mean())), flush=True)


def make_loop(S):
    @jax.jit
    def run(state, grid, data, key):
        def body(i, carry):
            st, loss = carry
            st2, aux = step_fn(st, grid, data, jax.random.fold_in(key, i))
            return st2, aux["loss"]

        st, loss = jax.lax.fori_loop(0, S, body, (state, jnp.zeros(())))
        return st, loss

    return run


def measure(tag):
    global state
    r1, r9 = make_loop(1), make_loop(9)
    key2 = jax.random.fold_in(key, hash(tag) % 1000)
    state, l = r9(state, grid, data, jax.random.fold_in(key2, 0))
    float(np.asarray(l))
    state, l = r1(state, grid, data, jax.random.fold_in(key2, 1))
    float(np.asarray(l))
    t0 = time.perf_counter()
    state, l = r1(state, grid, data, jax.random.fold_in(key2, 2))
    float(np.asarray(l))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, l = r9(state, grid, data, jax.random.fold_in(key2, 3))
    float(np.asarray(l))
    t9 = time.perf_counter() - t0
    dt = (t9 - t1) / 8.0
    print(
        f"{tag:18s}: {dt*1e3:7.2f} ms/step  ({batch/dt/1e6:.2f} M samples/s, "
        f"{1/dt:.2f} steps/s)  [t(1)={t1*1e3:.1f} t(9)={t9*1e3:.1f}]",
        flush=True,
    )


table_ops.USE_PALLAS = False
measure("xla pipeline")
table_ops.USE_PALLAS = True
measure("pallas segsum")
measure("pallas segsum #2")


# --- isolated enc bwd: in-program chain of grad-of-encode ---------------
def enc_bwd_chain(tag, iters=8):
    enc = model.pos_encoding
    table = state.params["pos_encoding"]["table"]
    x = jax.random.uniform(jax.random.PRNGKey(3), (1 << 18, 3))
    idx, w1 = enc._brick_fracs(x)
    w8 = table_ops.corner_products(w1)

    @jax.jit
    def chain(table):
        def body(i, tb):
            def loss(t):
                return jnp.sum(enc._brick_encode(t, idx, w8, w1) ** 2)

            g = jax.grad(loss)(tb)
            return tb + 1e-9 * g

        return jax.lax.fori_loop(0, iters, body, table)[0, 0]

    @jax.jit
    def chain1(table):
        def loss(t):
            return jnp.sum(enc._brick_encode(t, idx, w8, w1) ** 2)

        return (table + 1e-9 * jax.grad(loss)(table))[0, 0]

    float(np.asarray(chain1(table)))
    float(np.asarray(chain(table)))
    t0 = time.perf_counter()
    float(np.asarray(chain1(table + 1e-8)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(chain(table + 2e-8)))
    tk = time.perf_counter() - t0
    dt = (tk - t1) / (iters - 1)
    print(f"enc fwd+bwd [{tag}]: {dt*1e3:7.2f} ms  [t1={t1*1e3:.1f} tK={tk*1e3:.1f}]", flush=True)


table_ops.USE_PALLAS = False
enc_bwd_chain("xla")
table_ops.USE_PALLAS = True
enc_bwd_chain("pallas")

# --- batched sort cost vs payload count ---------------------------------
L, N = 16, 1 << 18
key_arr = jax.random.randint(jax.random.PRNGKey(5), (L, N), 0, 1 << 19)
pay = [jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(6), i), (L, N)) for i in range(5)]


def sort_chain(n_ops, iters=8):
    @jax.jit
    def chain(k):
        def body(i, carry):
            ops = (carry,) + tuple(p + carry[:, :1] * 0 for p in pay[: n_ops - 1])
            s = jax.lax.sort(ops, dimension=1, num_keys=1)
            return s[0] ^ 1  # perturb so next sort differs

        return jax.lax.fori_loop(0, iters, body, k)[0, 0]

    @jax.jit
    def chain1(k):
        s = jax.lax.sort((k,) + tuple(pay[: n_ops - 1]), dimension=1, num_keys=1)
        return s[0][0, 0]

    float(np.asarray(chain1(key_arr)))
    float(np.asarray(chain(key_arr)))
    t0 = time.perf_counter()
    float(np.asarray(chain1(key_arr ^ 3)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(chain(key_arr ^ 7)))
    tk = time.perf_counter() - t0
    print(f"sort [16,2^18] x{n_ops} ops: {(tk-t1)/(iters-1)*1e3:7.2f} ms", flush=True)


for n_ops in (2, 4, 6):
    sort_chain(n_ops)
