"""Is optax-Adam slow because the [rows, 2] table leaf tile-pads 64x?
Times p/m/v updates on equal element counts with different shapes."""
import time, sys, jax, jax.numpy as jnp, numpy as np, optax

n = 11_000_000
SALT = int(time.time()) % 100000
shapes = {"[5.5M, 2]": (n // 2, 2), "[85937, 128]": (n // 128, 128), "flat [11M]": (n,)}
tx = optax.scale_by_adam()

for name, shp in shapes.items():
    p = jax.random.normal(jax.random.PRNGKey(SALT), shp) * 1e-2
    g = jax.random.normal(jax.random.PRNGKey(SALT + 1), shp) * 1e-3
    st = tx.init(p)

    def make(iters):
        @jax.jit
        def run(p, g, st):
            def body(i, carry):
                p, st = carry
                u, st = tx.update(g * (1.0 + 1e-9 * p.reshape(-1)[0]), st, p)
                return (optax.apply_updates(p, u), st)
            p, st = jax.lax.fori_loop(0, iters, body, (p, st))
            return p.reshape(-1)[0]
        return run

    c1, c8 = make(1), make(8)
    float(np.asarray(c1(p, g, st))); float(np.asarray(c8(p, g, st)))
    t0 = time.perf_counter(); float(np.asarray(c1(p, g, st))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(np.asarray(c8(p, g, st))); t8 = time.perf_counter() - t0
    print(f"{name:14s} adam step: {(t8 - t1) / 7 * 1e3:7.2f} ms", flush=True)
