"""Disney BRDF + soft shadows + floor for the SDF renderer (S1 parity:
evaluate_shading testbed_sdf.cu:79, shadow tracer :758, m_floor_enable)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.ops.brdf import BrdfParams, disney_shade


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


class TestDisneyShade:
    def _shade(self, p, L=(0, 0, 1), V=(0, 0, 1), N=(0, 0, 1), base=(0.8, 0.8, 0.8)):
        out = disney_shade(
            jnp.asarray([base], jnp.float32),
            jnp.asarray([1.0, 1.0, 1.0]) * 0.25,
            jnp.asarray([1.0, 1.0, 1.0]),
            p,
            jnp.asarray(_unit(L)),
            jnp.asarray([_unit(V)]),
            jnp.asarray([_unit(N)]),
        )
        return np.asarray(out)[0]

    def test_frontal_brighter_than_grazing(self):
        p = BrdfParams()
        frontal = self._shade(p, L=(0, 0, 1))
        grazing = self._shade(p, L=(0.995, 0, 0.1))
        assert frontal.mean() > grazing.mean()

    def test_backfacing_light_gives_ambient_only(self):
        p = BrdfParams()
        back = self._shade(p, L=(0, 0, -1))
        # ambient = 0.25 * 0.2 * base
        np.testing.assert_allclose(back, 0.25 * 0.2 * 0.8, atol=1e-5)

    def test_metallic_tints_specular(self):
        # a red metal reflects red at the specular peak; dielectric does not
        p_metal = BrdfParams(metallic=1.0, roughness=0.3)
        p_diel = BrdfParams(metallic=0.0, roughness=0.3)
        L = V = (0, 0.4, 0.9)
        m = self._shade(p_metal, L=L, V=V, base=(0.9, 0.1, 0.1))
        d = self._shade(p_diel, L=L, V=V, base=(0.9, 0.1, 0.1))
        assert m[0] / max(m[1], 1e-6) > d[0] / max(d[1], 1e-6)

    def test_rough_spreads_specular(self):
        # at the exact mirror peak (H = N), smoother = brighter; off-peak
        # (24° away), rougher = brighter — the lobe is wider
        peak_smooth = self._shade(BrdfParams(roughness=0.1), L=(0, 0, 1), V=(0, 0, 1))
        peak_rough = self._shade(BrdfParams(roughness=0.9), L=(0, 0, 1), V=(0, 0, 1))
        assert peak_smooth.max() > peak_rough.max()
        off_smooth = self._shade(BrdfParams(roughness=0.1), L=(0, 0.4, 0.9), V=(0, 0.4, 0.9))
        off_rough = self._shade(BrdfParams(roughness=0.9), L=(0, 0.4, 0.9), V=(0, 0.4, 0.9))
        assert off_rough.max() > off_smooth.max()

    def test_finite_everywhere(self):
        rng = np.random.default_rng(0)
        N = rng.normal(size=(128, 3)).astype(np.float32)
        N /= np.linalg.norm(N, axis=-1, keepdims=True)
        V = rng.normal(size=(128, 3)).astype(np.float32)
        V /= np.linalg.norm(V, axis=-1, keepdims=True)
        out = disney_shade(
            jnp.full((128, 3), 0.7), jnp.asarray([0.2, 0.2, 0.2]),
            jnp.ones(3), BrdfParams(metallic=0.5, clearcoat=1.0, sheen=0.5),
            jnp.asarray(_unit((1, 1, 1))), jnp.asarray(V), jnp.asarray(N),
        )
        assert np.isfinite(np.asarray(out)).all()


def _look_at(eye, center=(0.5, 0.5, 0.5), up=(0, 1, 0)):
    eye = np.asarray(eye, np.float32)
    fwd = _unit(np.asarray(center, np.float32) - eye)
    right = _unit(np.cross(fwd, np.asarray(up, np.float32)))
    down = np.cross(fwd, right)
    return np.concatenate([np.stack([right, down, fwd], 1), eye[:, None]], 1).astype(np.float32)


class _AnalyticBoxSdf:
    """Exact box SDF standing in for a trained model — makes the knob tests
    deterministic (a 60-step trained SDF is too noisy to assert on)."""

    def init(self, rng):
        return {}

    def apply(self, params, pos):
        q = jnp.abs(pos - 0.5) - 0.15
        outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside


class TestSdfRenderKnobs:
    def _testbed(self):
        from types import SimpleNamespace

        from nerfshop_tpu.ops.brdf import BrdfParams
        from nerfshop_tpu.train import sdf as sdf_train

        tb = sdf_train.SdfTestbed(
            model=_AnalyticBoxSdf(), spec=None, loss_fn=None,
            state=SimpleNamespace(inference_params={}),
            rng=jax.random.PRNGKey(0), brdf=BrdfParams(),
        )
        return tb

    def test_shadow_and_normal_toggles_change_frame(self):
        tb = self._testbed()
        tb.floor_enable = True  # box shadow falls on the floor plane
        cam = _look_at((0.5, 1.2, -0.6))
        focal = np.asarray([40.0, 40.0], np.float32)
        img0 = tb.render(32, 32, cam, focal)
        assert np.isfinite(img0).all()
        tb.render_shadows = False
        img1 = tb.render(32, 32, cam, focal)
        # shadows darken part of the lit floor
        assert np.abs(img1 - img0).max() > 1e-3
        tb.analytic_normals = False
        img2 = tb.render(32, 32, cam, focal)
        assert np.isfinite(img2).all()
        # fd vs analytic normals agree closely on a clean SDF
        assert np.abs(img2 - img1).mean() < 0.05
        tb.floor_enable = False
        img3 = tb.render(32, 32, cam, focal)
        # removing the floor empties previously-covered pixels
        assert (img3[..., 3] > 0.5).sum() < (img1[..., 3] > 0.5).sum()

    def test_sun_dir_changes_shading(self):
        tb = self._testbed()
        cam = _look_at((0.5, 1.2, -0.6))
        focal = np.asarray([40.0, 40.0], np.float32)
        a = tb.render(24, 24, cam, focal)
        tb.sun_dir = (-0.577, -0.577, 0.577)
        b = tb.render(24, 24, cam, focal)
        hit = (a[..., 3] > 0.5) & (b[..., 3] > 0.5)
        assert hit.any()
        assert np.abs(a[..., :3][hit] - b[..., :3][hit]).max() > 1e-3
