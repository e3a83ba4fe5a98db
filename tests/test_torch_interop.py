"""Torch-facing density fwd/bwd surface (pyngp parity, python_api.cu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.models import encodings as enc
from nerfshop_tpu.models import mlp as mlp_lib
from nerfshop_tpu.models import nerf_network as nn
from nerfshop_tpu import torch_interop


def _tiny_model():
    pos_enc = enc.GridEncoding(
        n_input_dims=3, n_levels=4, n_features_per_level=2,
        log2_hashmap_size=10, base_resolution=4, per_level_scale=1.5,
    )
    model = nn.NerfNetwork(
        pos_encoding=pos_enc,
        dir_encoding=enc.SphericalHarmonicsEncoding(degree=4),
        density_mlp=mlp_lib.MLP(n_input_dims=8, n_output_dims=16, n_neurons=16, n_hidden_layers=1),
        rgb_mlp=mlp_lib.MLP(n_input_dims=32, n_output_dims=3, n_neurons=16, n_hidden_layers=1),
    )
    params = model.init(jax.random.PRNGKey(0))
    return model, params


class TestDensityFns:
    def test_fwd_matches_model(self):
        model, params = _tiny_model()
        fns = torch_interop.DensityFns(model, params)
        pos = np.random.default_rng(0).uniform(0, 1, (32, 3)).astype(np.float32)
        out = fns.fwd_density(pos)
        ref = np.asarray(model.density_features(params, jnp.asarray(pos)))
        np.testing.assert_allclose(out, ref, atol=1e-6)
        assert out.shape == (32, fns.n_density_output_dims)

    def test_bwd_matches_autodiff(self):
        model, params = _tiny_model()
        fns = torch_interop.DensityFns(model, params)
        rng = np.random.default_rng(1)
        pos = rng.uniform(0.1, 0.9, (8, 3)).astype(np.float32)
        d_out = rng.normal(size=(8, fns.n_density_output_dims)).astype(np.float32)
        g = fns.bwd_density(pos, d_out)
        ref = np.asarray(
            jax.grad(lambda p: jnp.sum(model.density_features(params, p) * d_out))(jnp.asarray(pos))
        )
        np.testing.assert_allclose(g, ref, atol=1e-5)

    def test_bwd_bwd_shapes(self):
        model, params = _tiny_model()
        fns = torch_interop.DensityFns(model, params)
        rng = np.random.default_rng(2)
        pos = rng.uniform(0.1, 0.9, (4, 3)).astype(np.float32)
        d_out = rng.normal(size=(4, fns.n_density_output_dims)).astype(np.float32)
        d_dpos = rng.normal(size=(4, 3)).astype(np.float32)
        d_pos2, d_dout = fns.bwd_bwd_input_density(pos, d_out, d_dpos)
        assert d_pos2.shape == pos.shape
        assert d_dout.shape == d_out.shape
        assert np.isfinite(d_pos2).all() and np.isfinite(d_dout).all()


class TestTorchModule:
    def test_backward_flows_to_positions(self):
        torch = pytest.importorskip("torch")
        model, params = _tiny_model()
        mod = torch_interop.NerfDensityModule(model, params)
        pos = torch.rand(16, 3, requires_grad=True)
        feats = mod(pos)
        assert feats.shape == (16, mod.n_density_output_dims)
        loss = feats.square().sum()
        loss.backward()
        assert pos.grad is not None
        g_ref = np.asarray(
            jax.grad(lambda p: jnp.sum(model.density_features(params, p) ** 2))(
                jnp.asarray(pos.detach().numpy())
            )
        )
        np.testing.assert_allclose(pos.grad.numpy(), g_ref, atol=1e-4)
