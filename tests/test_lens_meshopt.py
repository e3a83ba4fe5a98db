"""Lens modes (f-theta / latlong), rolling shutter, and mesh optimization.

Reference parity: pixel_to_ray lens modes (common_device.cuh:245), rolling
shutter time interpolation (testbed_nerf.cu:1124), optimise_mesh_step
(testbed_nerf.cu:4470)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.geometry import mesh_opt
from nerfshop_tpu.geometry.mesh_io import TriMesh
from nerfshop_tpu.ops import rays as rays_lib


def _identity_xform():
    return jnp.asarray(np.eye(3, 4, dtype=np.float32))


class TestLatLong:
    def test_roundtrip(self):
        uv = jnp.asarray(np.random.default_rng(0).uniform(0.05, 0.95, (64, 2)).astype(np.float32))
        d = rays_lib.latlong_to_dir(uv)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
        uv2 = rays_lib.dir_to_latlong(d)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-5)

    def test_center_looks_forward(self):
        # u=v=0.5 → +z in camera frame (reference latlong_to_dir convention)
        d = rays_lib.latlong_to_dir(jnp.asarray([0.5, 0.5]))
        np.testing.assert_allclose(np.asarray(d), [0, 0, 1], atol=1e-6)

    def test_full_image_covers_sphere(self):
        W, H = 32, 16
        b = rays_lib.rays_for_image((W, H), _identity_xform(), jnp.ones(2),
                                    jnp.asarray([0.5, 0.5]), lens="latlong")
        d = np.asarray(b.directions)
        # directions reach both hemispheres on every axis
        assert (d.min(0) < -0.5).all() and (d.max(0) > 0.5).all()


class TestFTheta:
    def test_center_ray_is_forward(self):
        W, H = 33, 33
        coeffs = jnp.asarray([0.0, 0.005, 0.0, 0.0, 0.0])  # θ = 0.005·r
        b = rays_lib.rays_for_image((W, H), _identity_xform(), jnp.ones(2),
                                    jnp.asarray([0.5, 0.5]), lens="ftheta",
                                    ftheta_coeffs=coeffs)
        d = np.asarray(b.directions).reshape(H, W, 3)
        center = d[H // 2, W // 2]
        np.testing.assert_allclose(center, [0, 0, 1], atol=1e-2)
        # corner ray bends away by θ(r_corner) ≈ 0.005·√2·16 ≈ 0.11 rad
        corner = d[0, 0]
        ang = np.arccos(np.clip(corner @ np.array([0, 0, 1.0]), -1, 1))
        assert 0.08 < ang < 0.15

    def test_requires_coeffs(self):
        with pytest.raises(ValueError):
            rays_lib.rays_for_image((4, 4), _identity_xform(), jnp.ones(2),
                                    jnp.asarray([0.5, 0.5]), lens="ftheta")


class TestRollingShutter:
    def test_pose_lerp_endpoints(self):
        xf0 = jnp.asarray(np.eye(3, 4, dtype=np.float32))[None]
        xf1 = xf0.at[:, :, 3].set(jnp.asarray([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(np.asarray(rays_lib.pose_lerp(xf0, xf1, jnp.zeros(1))), np.asarray(xf0))
        np.testing.assert_allclose(np.asarray(rays_lib.pose_lerp(xf0, xf1, jnp.ones(1))), np.asarray(xf1))

    def test_shutter_times_formula(self):
        pix = jnp.asarray([[10.0, 20.0]])
        res = jnp.asarray([100.0, 100.0])
        rs = jnp.asarray([0.1, 0.5, 0.25, 0.0])
        t = rays_lib.shutter_times(jax.random.PRNGKey(0), pix, res, rs)
        np.testing.assert_allclose(float(t[0]), 0.1 + 0.5 * 0.1 + 0.25 * 0.2, atol=1e-6)

    def test_rays_move_with_shutter(self):
        # end pose translated +x: bottom-row rays (v≈1) originate shifted
        N = 1
        xf = jnp.asarray(np.eye(3, 4, dtype=np.float32))[None]
        xf_end = xf.at[:, 0, 3].set(1.0)
        img_idx = jnp.zeros(2, jnp.int32)
        pix = jnp.asarray([[8.0, 0.0], [8.0, 15.0]])  # top row, bottom row
        res = jnp.asarray([16.0, 16.0])
        b = rays_lib.rays_from_pixels(
            img_idx, pix, xf, jnp.full((N, 2), 20.0), jnp.full((N, 2), 0.5), res,
            xforms_end=xf_end, rolling_shutter=jnp.asarray([0.0, 0.0, 1.0, 0.0]),
            rng=jax.random.PRNGKey(0),
        )
        o = np.asarray(b.origins)
        assert o[0, 0] < 0.1  # top row ≈ start pose
        assert o[1, 0] > 0.8  # bottom row ≈ end pose


class TestMeshOpt:
    def _icosphere(self, r=0.3, c=(0.5, 0.5, 0.5)):
        # octahedron subdivided twice, projected to the sphere
        v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float64)
        f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int64)
        for _ in range(2):
            mid = {}
            nf = []
            vl = list(v)

            def midpoint(a, b):
                key = (min(a, b), max(a, b))
                if key not in mid:
                    m = (vl[a] + vl[b]) / 2
                    m = m / np.linalg.norm(m)
                    mid[key] = len(vl)
                    vl.append(m)
                return mid[key]

            for a, b, cc in f:
                ab, bc, ca = midpoint(a, b), midpoint(b, cc), midpoint(cc, a)
                nf += [[a, ab, ca], [ab, b, bc], [ca, bc, cc], [ab, bc, ca]]
            v, f = np.array(vl), np.array(nf, np.int64)
        return TriMesh((v * r + np.asarray(c)).astype(np.float32), f.astype(np.int32))

    def test_vertices_pulled_to_isosurface(self):
        # analytic density: smooth ball of radius 0.25; start mesh at r=0.32
        center = jnp.asarray([0.5, 0.5, 0.5])

        def density_fn(pos):
            r = jnp.linalg.norm(pos - center, axis=-1)
            return 10.0 * jax.nn.sigmoid((0.25 - r) * 80.0)

        mesh = self._icosphere(r=0.32)
        r_before = np.linalg.norm(mesh.vertices - 0.5, axis=-1)
        mesh = mesh_opt.optimize_mesh(
            density_fn, mesh, n_steps=150, thresh=5.0,
            density_amount=1.0, smooth_amount=0.1, learning_rate=2e-3,
        )
        r_after = np.linalg.norm(mesh.vertices - 0.5, axis=-1)
        # iso-surface (σ=5) is exactly at r=0.25
        assert abs(r_after.mean() - 0.25) < 0.02, (r_before.mean(), r_after.mean())
        assert r_after.std() < 0.01  # smoothing keeps it spherical

    def test_smoothing_reduces_noise(self):
        rng = np.random.default_rng(0)
        mesh = self._icosphere(r=0.3)
        noisy = mesh.vertices + rng.normal(0, 0.01, mesh.vertices.shape).astype(np.float32)
        mesh_n = TriMesh(noisy.copy(), mesh.faces)

        def flat_density(pos):
            return jnp.zeros(pos.shape[0])  # no density force

        out = mesh_opt.optimize_mesh(
            flat_density, mesh_n, n_steps=100, thresh=0.0,
            density_amount=0.0, smooth_amount=5.0, learning_rate=2e-3,
        )
        ring, cnt = mesh_opt.build_neighbor_table(mesh.faces, mesh.n_vertices)

        def roughness(verts):
            pad = ring == np.arange(len(verts))[:, None]
            s = (verts[ring] * (~pad)[..., None]).sum(1) / cnt[:, None]
            return float(np.linalg.norm(verts - s, axis=-1).mean())

        assert roughness(out.vertices) < 0.5 * roughness(noisy)


class TestPngSlices:
    def test_sheet_written(self, tmp_path):
        pytest.importorskip("PIL")
        # direct sheet construction test through a Testbed would need a
        # trained model; exercise the tiling math on the helper level instead
        from nerfshop_tpu.data import image_io

        res = 8
        field = np.zeros((res, res, res), np.float32)
        field[2:6, 2:6, 2:6] = 5.0
        occ = np.clip(field / 5.0, 0, 1)
        n = int(np.ceil(np.sqrt(res)))
        sheet = np.zeros((n * res, n * res), np.float32)
        for z in range(res):
            r, c = divmod(z, n)
            sheet[r * res:(r + 1) * res, c * res:(c + 1) * res] = occ[:, :, z]
        p = tmp_path / "slices.png"
        image_io.write_image(p, np.repeat(sheet[..., None], 3, -1))
        assert p.exists()
        back = image_io.read_image(p)
        assert back.shape[0] == n * res
