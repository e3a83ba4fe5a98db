"""Optimizer construction from the JSON config tree.

Mirrors tcnn's nested optimizer configs consumed by the reference
(configs/nerf/base.json:5-22): ``Ema { ExponentialDecay { Adam } }``.

* Adam: beta1/beta2/epsilon/l2_reg — l2_reg is *coupled* L2 (added to the
  gradient before the moment updates), matching tcnn's Adam.
* ExponentialDecay: lr ×= decay_base every decay_interval steps once past
  decay_start (optionally frozen after decay_end).
* Ema: an exponential moving average of the parameters used for inference
  while the raw parameters keep training (tcnn EmaOptimizer). Handled by
  :class:`Trainer`, not inside the optax chain.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


@dataclass
class OptimizerSpec:
    tx: optax.GradientTransformation
    ema_decay: Optional[float]  # None → no EMA wrapper
    base_learning_rate: float


def _unwrap(cfg: dict):
    """Peel Ema/ExponentialDecay wrappers → (adam_cfg, schedule_cfg, ema)."""
    ema_decay = None
    schedule_cfg = None
    node = dict(cfg)
    while True:
        otype = node.get("otype", "Adam")
        if otype == "Ema":
            ema_decay = node.get("decay", 0.99)
            node = dict(node.get("nested", {}))
        elif otype == "ExponentialDecay":
            schedule_cfg = node
            node = dict(node.get("nested", {}))
        else:
            return node, schedule_cfg, ema_decay


def make_schedule(adam_cfg: dict, schedule_cfg: Optional[dict]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    base_lr = adam_cfg.get("learning_rate", 1e-2)
    if schedule_cfg is None:
        return lambda step: jnp.asarray(base_lr, jnp.float32)
    start = schedule_cfg.get("decay_start", 0)
    interval = schedule_cfg.get("decay_interval", 10000)
    base = schedule_cfg.get("decay_base", 0.33)
    end = schedule_cfg.get("decay_end", None)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        eff = jnp.clip(step, 0, end) if end is not None else step
        # lr ×= decay_base every decay_interval steps past decay_start
        n_decays = jnp.floor(jnp.maximum(eff - start, 0.0) / interval)
        return base_lr * jnp.power(base, n_decays)

    return schedule


def build_optimizer(cfg: dict) -> OptimizerSpec:
    adam_cfg, schedule_cfg, ema_decay = _unwrap(dict(cfg))
    schedule = make_schedule(adam_cfg, schedule_cfg)
    l2_reg = adam_cfg.get("l2_reg", 0.0)

    chain = []
    if l2_reg:
        chain.append(optax.add_decayed_weights(l2_reg))
    chain.append(
        optax.scale_by_adam(
            b1=adam_cfg.get("beta1", 0.9),
            b2=adam_cfg.get("beta2", 0.999),
            eps=adam_cfg.get("epsilon", 1e-8),
        )
    )
    chain.append(optax.scale_by_schedule(lambda count: -schedule(count)))
    return OptimizerSpec(
        tx=optax.chain(*chain),
        ema_decay=ema_decay,
        base_learning_rate=adam_cfg.get("learning_rate", 1e-2),
    )


class TrainState(NamedTuple):
    """Params + optimizer state + EMA copy; a pure pytree."""

    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray

    @property
    def inference_params(self):
        return self.ema_params if self.ema_params is not None else self.params


def create_train_state(params, spec: OptimizerSpec) -> TrainState:
    return TrainState(
        params=params,
        opt_state=spec.tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if spec.ema_decay else None,
        step=jnp.zeros((), jnp.int32),
    )


def apply_gradients(state: TrainState, grads, spec: OptimizerSpec) -> TrainState:
    updates, new_opt_state = spec.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    if spec.ema_decay:
        d = spec.ema_decay
        new_ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, state.ema_params, new_params)
    else:
        new_ema = None
    return TrainState(new_params, new_opt_state, new_ema, state.step + 1)
