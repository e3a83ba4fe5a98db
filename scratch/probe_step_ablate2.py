"""Bisect the 87 ms in-situ backward (probe_step_ablate): grad-of-field
variants on FIXED sample positions with params varying per iteration."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.train import optim

model = build_nerf_network(default_nerf_config(), aabb_scale=1)
spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15})
state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)

batch = 1 << 18
pos = jax.random.uniform(jax.random.PRNGKey(3), (batch, 3))
dirs = jax.random.uniform(jax.random.PRNGKey(4), (batch, 3))
ITERS = 8


def chain_time(name, make_fn):
    f_many = make_fn(ITERS)
    f_one = make_fn(1)
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    float(np.asarray(f_many(ks[0])))
    float(np.asarray(f_one(ks[1])))
    t0 = time.perf_counter()
    float(np.asarray(f_one(ks[2])))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(f_many(ks[3])))
    t_many = time.perf_counter() - t0
    per = (t_many - t_one) / (ITERS - 1)
    print(f"{name:44s} {per*1e3:8.2f} ms  (1-iter {t_one*1e3:6.1f} ms)", flush=True)
    return per


def _couple(params, s):
    f = 1.0 + 1e-12 * s
    return jax.tree.map(lambda x: x * f, params)


def mk_grad_full(iters):
    @jax.jit
    def f(k):
        def body(i, carry):
            p, _ = carry

            def loss(p):
                rgb, sigma = model(p, pos, dirs)
                return jnp.sum(rgb) + jnp.sum(jnp.log1p(sigma))

            g = jax.grad(loss)(p)
            s = g["rgb_mlp"]["weights"][0][0, 0] % 1.0
            return _couple(jax.tree.map(lambda a, b: a - 1e-12 * b, p, g), s), s

        _, s = jax.lax.fori_loop(0, iters, body, (state.params, jnp.zeros(())))
        return s

    return f


def mk_grad_density(iters):
    @jax.jit
    def f(k):
        def body(i, carry):
            p, _ = carry

            def loss(p):
                return jnp.sum(jnp.log1p(model.density(p, pos)))

            g = jax.grad(loss)(p)
            s = g["density_mlp"]["weights"][0][0, 0] % 1.0
            return _couple(jax.tree.map(lambda a, b: a - 1e-12 * b, p, g), s), s

        _, s = jax.lax.fori_loop(0, iters, body, (state.params, jnp.zeros(())))
        return s

    return f


def mk_grad_encode(iters):
    """grad wrt table through the model's own encode path (pos_encoding)."""
    enc = model.pos_encoding

    @jax.jit
    def f(k):
        def body(i, carry):
            p, _ = carry

            def loss(p):
                feats = enc(p["pos_encoding"], pos)
                return jnp.sum(jnp.sin(3.0 * feats))

            g = jax.grad(loss)(p)
            s = g["pos_encoding"]["table"][0, 0] % 1.0
            return _couple(jax.tree.map(lambda a, b: a - 1e-12 * b, p, g), s), s

        _, s = jax.lax.fori_loop(0, iters, body, (state.params, jnp.zeros(())))
        return s

    return f


def mk_fwd_density(iters):
    @jax.jit
    def f(k):
        def body(i, carry):
            p, _ = carry
            s = jnp.sum(jnp.log1p(model.density(p, pos))) % 1.0
            return _couple(p, s), s

        _, s = jax.lax.fori_loop(0, iters, body, (state.params, jnp.zeros(())))
        return s

    return f


chain_time("grad full model (enc+mlps), fixed samples", mk_grad_full)
chain_time("grad density-only (enc+density mlp)", mk_grad_density)
chain_time("grad encode-only (table), model path", mk_grad_encode)
chain_time("fwd density-only", mk_fwd_density)
