import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.models import mlp as mlp_lib
from nerfshop_tpu.train import optim


def test_mlp_shapes(rng):
    m = mlp_lib.MLP(n_input_dims=32, n_output_dims=16, n_neurons=64, n_hidden_layers=2)
    params = m.init(rng)
    assert [w.shape for w in params["weights"]] == [(32, 64), (64, 64), (64, 16)]
    out = m.apply(params, jnp.ones((8, 32)))
    assert out.shape == (8, 16)
    assert out.dtype == jnp.float32


def test_mlp_fits_linear_function(rng):
    """A small MLP should drive a regression loss near zero in a few hundred steps."""
    m = mlp_lib.MLP(n_input_dims=2, n_output_dims=1, n_neurons=32, n_hidden_layers=2)
    params = m.init(rng)
    spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15})
    state = optim.create_train_state(params, spec)

    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 2))
    y = (2 * x[:, :1] - 0.5 * x[:, 1:])

    @jax.jit
    def step(state):
        def loss(p):
            return jnp.mean((m.apply(p, x) - y) ** 2)

        l, g = jax.value_and_grad(loss)(state.params)
        return optim.apply_gradients(state, g, spec), l

    for _ in range(300):
        state, l = step(state)
    assert float(l) < 1e-3


def test_exponential_decay_schedule():
    spec_cfg = {
        "otype": "ExponentialDecay",
        "decay_start": 100,
        "decay_interval": 50,
        "decay_base": 0.5,
        "nested": {"otype": "Adam", "learning_rate": 1.0},
    }
    adam_cfg, sched_cfg, ema = optim._unwrap(spec_cfg)
    assert ema is None
    sched = optim.make_schedule(adam_cfg, sched_cfg)
    assert float(sched(0)) == 1.0
    assert float(sched(99)) == 1.0
    assert float(sched(150)) == 0.5
    assert float(sched(200)) == 0.25


def test_ema_unwrap_and_tracking(rng):
    cfg = {"otype": "Ema", "decay": 0.5, "nested": {"otype": "Adam", "learning_rate": 0.1}}
    spec = optim.build_optimizer(cfg)
    assert spec.ema_decay == 0.5
    params = {"w": jnp.zeros(3)}
    state = optim.create_train_state(params, spec)
    grads = {"w": -jnp.ones(3)}  # pushes params up
    state = optim.apply_gradients(state, grads, spec)
    # ema lags params
    assert float(state.ema_params["w"][0]) < float(state.params["w"][0])
    assert float(state.ema_params["w"][0]) > 0.0


def test_l2_reg_applied():
    spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 0.1, "l2_reg": 1.0})
    params = {"w": jnp.ones(1) * 10.0}
    state = optim.create_train_state(params, spec)
    # zero gradient: only the l2 term drives the update (downward)
    state = optim.apply_gradients(state, {"w": jnp.zeros(1)}, spec)
    assert float(state.params["w"][0]) < 10.0
