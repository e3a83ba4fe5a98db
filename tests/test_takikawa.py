"""Takikawa octree encoding (S3): octree build, masked features, SDF
training with the configs/sdf/takikawa.json-style config."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.geometry.triangle_octree import TriangleOctree
from nerfshop_tpu.models import encodings as enc


def _unit_cube_mesh(center=0.5, half=0.2):
    c, h = center, half
    v = np.array([[c-h,c-h,c-h],[c+h,c-h,c-h],[c+h,c+h,c-h],[c-h,c+h,c-h],
                  [c-h,c-h,c+h],[c+h,c-h,c+h],[c+h,c+h,c+h],[c-h,c+h,c+h]], np.float32)
    f = np.array([[0,1,2],[0,2,3],[4,6,5],[4,7,6],[0,4,5],[0,5,1],
                  [3,2,6],[3,6,7],[0,3,7],[0,7,4],[1,5,6],[1,6,2]], np.int64)
    return v, f


def test_octree_build_occupancy():
    v, f = _unit_cube_mesh()
    oct = TriangleOctree.build(v, f, depth=6)
    # surface cells occupied, deep interior and far exterior not
    assert oct.contains(np.array([[0.5, 0.5, 0.3]]), 6)[0]   # on a face
    assert not oct.contains(np.array([[0.05, 0.05, 0.05]]), 6)[0]  # far outside
    assert not oct.contains(np.array([[0.5, 0.5, 0.5]]), 6)[0]  # deep inside
    # coarser levels are supersets
    assert oct.contains(np.array([[0.5, 0.5, 0.3]]), 3)[0]
    frac = oct.levels[6].mean()
    assert 0.001 < frac < 0.2, frac


def test_takikawa_encoding_masked_and_trains():
    v, f = _unit_cube_mesh()
    oct = TriangleOctree.build(v, f, depth=8)
    e = enc.build_encoding(
        {"otype": "Takikawa", "n_levels": 4, "starting_level": 4,
         "n_features_per_level": 4, "log2_hashmap_size": 14},
        3, octree=oct,
    )
    assert e.n_output_dims == 16
    params = e.init(jax.random.PRNGKey(0))
    on_surface = jnp.asarray([[0.5, 0.5, 0.3]])
    far = jnp.asarray([[0.05, 0.05, 0.05]])
    out_s = e.apply(params, on_surface)
    out_f = e.apply(params, far)
    assert float(jnp.abs(out_f).max()) == 0.0  # outside the octree → zeros
    assert out_s.shape == (1, 16)
    # gradient flows only to surface features
    g = jax.grad(lambda p: jnp.sum(e.apply(p, on_surface) ** 2))(params)
    assert float(jnp.abs(g["table"]).sum()) > 0


def test_sdf_testbed_with_takikawa_config():
    from nerfshop_tpu.geometry.mesh_io import TriMesh
    from nerfshop_tpu.train import sdf as sdf_train

    v, f = _unit_cube_mesh(half=0.3)
    mesh = TriMesh(vertices=v, faces=f)
    cfg = {
        "encoding": {"otype": "Takikawa", "n_levels": 4, "starting_level": 3,
                      "n_features_per_level": 4, "log2_hashmap_size": 13},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 32, "n_hidden_layers": 2},
        "loss": {"otype": "Mape"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    }
    tb = sdf_train.SdfTestbed.create(cfg, mesh, jax.random.PRNGKey(0))
    l0 = tb.train(20, 4096)
    l1 = tb.train(60, 4096)
    assert np.isfinite(l1)
    assert l1 < l0 * 1.5, (l0, l1)  # training is stable/improving
