"""The NGP NeRF network: hash-encoded density MLP + SH-conditioned RGB MLP.

Behavioral parity with the reference's NerfNetworkFull
(include/neural-graphics-primitives/nerf_network_full.h:34-239) and its
no-view-direction variant (nerf_network_nodir.h:30):

  pos [0,1]³ ──HashGrid──► density MLP (1 hidden, 64) ──► 16 feats
                                          │ feats[0] = raw density (σ before exp)
  dir warped ──SH(deg4)──┐                ▼
                         └──[feats ∥ SH]──► rgb MLP (2 hidden, 64) ──► 3 raw rgb

Activations applied by the *field* functions (common_nerf.cu
network_to_rgb/network_to_density): density = exp, rgb = sigmoid (LDR) or
exp (HDR), with clamped exponents for bf16 stability
(pyngp/nerf_network.py:103 clamps ±10).

Everything is a pure function over a params pytree; density-only forward
(used by the occupancy grid and selection projection) skips the rgb branch
exactly like the reference's density() path (nerf_network_full.h:223-239).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from nerfshop_tpu.models import encodings as enc
from nerfshop_tpu.models import mlp as mlp_lib

DENSITY_FEATURES = 16
EXP_CLAMP = 15.0
RGB_EXP_CLAMP = 10.0


def density_activation_fn(raw: jnp.ndarray, kind: str = "exponential") -> jnp.ndarray:
    kind = kind.lower()
    if kind == "exponential":
        return jnp.exp(jnp.clip(raw, -EXP_CLAMP, EXP_CLAMP))
    if kind == "relu":
        return jax.nn.relu(raw)
    if kind == "logistic":
        return jax.nn.sigmoid(raw)
    if kind == "none":
        return raw
    raise ValueError(kind)


def rgb_activation_fn(raw: jnp.ndarray, kind: str = "logistic") -> jnp.ndarray:
    kind = kind.lower()
    if kind == "logistic":
        return jax.nn.sigmoid(raw)
    if kind == "exponential":
        return jnp.exp(jnp.clip(raw, -RGB_EXP_CLAMP, RGB_EXP_CLAMP))
    if kind == "relu":
        return jax.nn.relu(raw)
    if kind == "none":
        return raw
    raise ValueError(kind)


@dataclass
class NerfNetwork:
    """Full NGP NeRF model (pos+dir). Set ``use_dir=False`` for the NoDir
    variant (nerf_network_nodir.h)."""

    pos_encoding: enc.Encoding
    dir_encoding: Optional[enc.Encoding]
    density_mlp: mlp_lib.MLP
    rgb_mlp: mlp_lib.MLP
    n_extra_dims: int = 0
    density_activation: str = "exponential"
    rgb_activation: str = "logistic"

    @property
    def use_dir(self) -> bool:
        return self.dir_encoding is not None

    def init(self, rng: jax.Array):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        params = {
            "pos_encoding": self.pos_encoding.init(k1),
            "density_mlp": self.density_mlp.init(k2),
            "rgb_mlp": self.rgb_mlp.init(k3),
        }
        if self.dir_encoding is not None:
            params["dir_encoding"] = self.dir_encoding.init(k4)
        return params

    # -- density-only path (occupancy grid / selection / SDF-ish queries) ---

    def density_features(self, params, pos: jnp.ndarray) -> jnp.ndarray:
        """pos warped [N,3] → [N,16] density features (feats[...,0] = raw σ)."""
        h = self.pos_encoding.apply(params["pos_encoding"], pos)
        return self.density_mlp.apply(params["density_mlp"], h)

    def density(self, params, pos: jnp.ndarray, activated: bool = True) -> jnp.ndarray:
        raw = self.density_features(params, pos)[..., 0]
        return density_activation_fn(raw, self.density_activation) if activated else raw

    # -- full forward ---------------------------------------------------------

    def __call__(self, params, pos: jnp.ndarray, direction: Optional[jnp.ndarray] = None, extra: Optional[jnp.ndarray] = None):
        """pos warped [N,3], direction warped [N,3] → (rgb [N,3], sigma [N]).

        Returns *activated* rgb and density.
        """
        feats = self.density_features(params, pos)
        sigma = density_activation_fn(feats[..., 0], self.density_activation)
        if self.dir_encoding is not None:
            assert direction is not None
            d_in = direction if extra is None else jnp.concatenate([direction, extra], -1)
            d = self.dir_encoding.apply(params["dir_encoding"], d_in)
            rgb_in = jnp.concatenate([feats.astype(jnp.float32), d.astype(jnp.float32)], axis=-1)
        else:
            rgb_in = feats.astype(jnp.float32)
        raw_rgb = self.rgb_mlp.apply(params["rgb_mlp"], rgb_in)[..., :3]
        rgb = rgb_activation_fn(raw_rgb, self.rgb_activation)
        return rgb, sigma

    def dir_encoding_is_static(self, params) -> bool:
        """True when the dir encoding has no trainable leaves (SH — the
        default), so its output can be precomputed outside a grad closure."""
        if self.dir_encoding is None:
            return False
        de = params.get("dir_encoding") if isinstance(params, dict) else None
        return not jax.tree_util.tree_leaves(de)

    def precompute_raw_inputs(self, params, pos, direction=None, extra=None):
        """Param-independent forward inputs for :meth:`raw_forward_pre`:
        (pos-encoding precompute, dir-encoding output or None). Only valid
        when positions/directions do not depend on trainable params (no
        camera optimization) and the dir encoding is parameterless."""
        pre_pos = self.pos_encoding.precompute(pos)
        d = None
        if self.dir_encoding is not None and self.dir_encoding_is_static(params):
            d_in = direction if extra is None else jnp.concatenate([direction, extra], -1)
            d = self.dir_encoding.apply(params.get("dir_encoding"), d_in).astype(jnp.float32)
        return pre_pos, d

    def raw_forward_pre(self, params, pre_pos, d_enc, direction=None, extra=None):
        """raw_forward from precomputed inputs. ``d_enc`` None + use_dir →
        the dir encoding is evaluated here (it has trainable params)."""
        h = self.pos_encoding.apply_pre(params["pos_encoding"], pre_pos)
        feats = self.density_mlp.apply(params["density_mlp"], h)
        raw_sigma = feats[..., 0]
        if self.dir_encoding is not None:
            if d_enc is None:
                d_in = direction if extra is None else jnp.concatenate([direction, extra], -1)
                d_enc = self.dir_encoding.apply(params["dir_encoding"], d_in).astype(jnp.float32)
            rgb_in = jnp.concatenate([feats.astype(jnp.float32), d_enc], axis=-1)
        else:
            rgb_in = feats.astype(jnp.float32)
        raw_rgb = self.rgb_mlp.apply(params["rgb_mlp"], rgb_in)[..., :3]
        return raw_rgb, raw_sigma

    def raw_forward(self, params, pos, direction=None, extra=None):
        """Unactivated (raw_rgb [N,3], raw_sigma [N]) — the analog of the
        4-channel network output the reference's kernels consume."""
        feats = self.density_features(params, pos)
        raw_sigma = feats[..., 0]
        if self.dir_encoding is not None:
            d_in = direction if extra is None else jnp.concatenate([direction, extra], -1)
            d = self.dir_encoding.apply(params["dir_encoding"], d_in)
            rgb_in = jnp.concatenate([feats.astype(jnp.float32), d.astype(jnp.float32)], axis=-1)
        else:
            rgb_in = feats.astype(jnp.float32)
        raw_rgb = self.rgb_mlp.apply(params["rgb_mlp"], rgb_in)[..., :3]
        return raw_rgb, raw_sigma


def build_nerf_network(config: dict, aabb_scale: int = 1, n_extra_dims: int = 0, is_hdr: bool = False, desired_resolution: float = 2048.0) -> NerfNetwork:
    """Construct from the JSON config tree (reference: Testbed::reset_network
    src/testbed.cu:2217-2443, incl. hash-grid auto-params at 2280-2292:
    per_level_scale = exp(ln(desired_res · aabb_scale / base_res)/(L−1)))."""
    import math

    enc_cfg = dict(config.get("encoding", {}))
    n_levels = enc_cfg.get("n_levels", 16)
    base_res = enc_cfg.get("base_resolution", 16)
    per_level_scale = enc_cfg.get("per_level_scale")
    if per_level_scale is None and n_levels > 1:
        per_level_scale = math.exp(math.log(desired_resolution * aabb_scale / base_res) / (n_levels - 1))
    pos_encoding = enc.build_encoding(enc_cfg, 3, per_level_scale)

    dir_cfg = config.get("dir_encoding")
    dir_encoding = enc.build_encoding(dict(dir_cfg), 3 + n_extra_dims) if dir_cfg else None

    density_mlp = mlp_lib.build_network(dict(config.get("network", {})), pos_encoding.n_output_dims, DENSITY_FEATURES)
    rgb_in = DENSITY_FEATURES + (dir_encoding.n_output_dims if dir_encoding else 0)
    rgb_mlp = mlp_lib.build_network(dict(config.get("rgb_network", config.get("network", {}))), rgb_in, 3)

    return NerfNetwork(
        pos_encoding=pos_encoding,
        dir_encoding=dir_encoding,
        density_mlp=density_mlp,
        rgb_mlp=rgb_mlp,
        n_extra_dims=n_extra_dims,
        density_activation="exponential",
        rgb_activation="exponential" if is_hdr else "logistic",
    )
