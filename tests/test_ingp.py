"""`.ingp` snapshot interop (R8): tcnn param-blob layout, morton grid
conversion, zlib wrapping, exact round-trip through export/import."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.io import ingp
from nerfshop_tpu.models.nerf_network import build_nerf_network


def test_morton_is_standard_interleave():
    # morton(1,0,0)=1, morton(0,1,0)=2, morton(0,0,1)=4
    m = ingp._morton3d(np.array([1, 0, 0]), np.array([0, 1, 0]), np.array([0, 0, 1]))
    np.testing.assert_array_equal(m, [1, 2, 4])
    m2 = ingp._morton3d(np.array([3]), np.array([5]), np.array([6]))
    # bit-interleave check: x=011, y=101, z=110 -> zyx triplets (110)(101)(011)... 
    expect = sum(((3 >> b) & 1) << (3 * b) | ((5 >> b) & 1) << (3 * b + 1) | ((6 >> b) & 1) << (3 * b + 2) for b in range(3))
    assert int(m2[0]) == expect


def test_morton_perm_roundtrip():
    perm = ingp._morton_perm(8)
    assert sorted(perm) == list(range(512))
    rm = np.arange(512, dtype=np.float32)
    morton = rm[perm]
    back = np.empty_like(morton)
    back[perm] = morton
    np.testing.assert_array_equal(back, rm)


def test_ingp_export_import_roundtrip(tmp_path):
    cfg = default_nerf_config()
    cfg["encoding"]["n_levels"] = 4
    cfg["encoding"]["log2_hashmap_size"] = 12
    model = build_nerf_network(cfg, aabb_scale=2)
    params = model.init(jax.random.PRNGKey(0))
    grid = np.random.default_rng(0).uniform(0, 3, (2, 128, 128, 128)).astype(np.float32)
    path = tmp_path / "snap.ingp"
    ingp.export_ingp(path, cfg, model, params, density_grid=grid,
                     aabb_scale=2, training_step=777, loss=0.0123,
                     interop="warn")  # raw blob mechanics: no re-bake
    out = ingp.import_ingp(path, model, params)
    assert out["training_step"] == 777
    assert out["aabb_scale"] == 2
    # fp16 round-trip: params match to half precision
    for a, b in zip(params["density_mlp"]["weights"], out["params"]["density_mlp"]["weights"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(params["pos_encoding"]["table"]),
        np.asarray(out["params"]["pos_encoding"]["table"]), atol=1e-4, rtol=1e-2,
    )
    np.testing.assert_allclose(out["density_grid"], grid, atol=2e-2, rtol=1e-2)
    # zlib-wrapped on disk
    head = open(path, "rb").read(1)
    assert head == b"\x78"


def test_ingp_uncompressed_msgpack(tmp_path):
    cfg = default_nerf_config()
    cfg["encoding"]["n_levels"] = 2
    cfg["encoding"]["log2_hashmap_size"] = 10
    model = build_nerf_network(cfg, aabb_scale=1)
    params = model.init(jax.random.PRNGKey(0))
    path = tmp_path / "snap.msgpack"
    ingp.export_ingp(path, cfg, model, params, interop="warn")
    loaded = ingp.load_ingp(path)
    assert loaded["snapshot"]["version"] == 1
    assert loaded["snapshot"]["params_type"] == "__half"


def test_testbed_ingp_roundtrip(tmp_path):
    """Testbed.save_snapshot/.load_snapshot dispatch on the .ingp extension
    and renders survive the round trip."""
    import os
    if not os.path.exists("/tmp/verify_scene/transforms.json"):
        import subprocess, sys
        subprocess.run([sys.executable, "scratch/make_verify_scene.py"], check=True)
    from nerfshop_tpu import Testbed, TestbedMode

    tb = Testbed(TestbedMode.Nerf)
    tb.load_training_data("/tmp/verify_scene")
    tb.train(40, 8192)
    img_a = tb.render(32, 32, spp=1)
    p = str(tmp_path / "scene.ingp")
    # interop="warn" keeps the brick table verbatim (the re-bake convert
    # path is covered by test_ingp_rebake_convert on a small model; running
    # it on the full 16-level table here would dominate the CPU suite)
    tb.save_snapshot(p, interop="warn")

    tb2 = Testbed(TestbedMode.Nerf)
    tb2.load_snapshot(p)
    assert tb2.stats.step == tb.stats.step
    tb2.camera_matrix = tb.camera_matrix
    tb2.fov_deg = tb.fov_deg
    img_b = tb2.render(32, 32, spp=1)
    # fp16 params + fp16 grid: renders agree closely
    assert float(np.abs(img_a - img_b).mean()) < 0.02


def test_ingp_rebake_convert(tmp_path):
    """Default export re-bakes brick -> tcnn 'plain' order (VERDICT r2 #7):
    dense levels copy exactly, hash levels are least-squares fit; a reader
    building the model from the stored config (layout='plain') reproduces
    the encoding field closely."""
    from nerfshop_tpu.models.encodings import GridEncoding

    cfg = default_nerf_config()
    cfg["encoding"]["n_levels"] = 4
    cfg["encoding"]["log2_hashmap_size"] = 9
    cfg["encoding"]["base_resolution"] = 4
    cfg["encoding"]["per_level_scale"] = 2.0
    model = build_nerf_network(cfg, aabb_scale=1)
    assert model.pos_encoding.layout == "brick"
    assert not all(model.pos_encoding.level_dense)  # hash levels exercised
    params = model.init(jax.random.PRNGKey(3))
    # give the table structure (init is ~0 -> fit would be trivial)
    params["pos_encoding"]["table"] = (
        jax.random.normal(jax.random.PRNGKey(4), params["pos_encoding"]["table"].shape) * 0.1
    )
    path = tmp_path / "conv.ingp"
    ingp.export_ingp(path, cfg, model, params)  # default interop="convert"

    loaded = ingp.load_ingp(path)
    assert loaded["encoding"]["layout"] == "plain"
    # build the reader-side model from the stored config
    model_p = build_nerf_network(loaded, aabb_scale=1)
    assert model_p.pos_encoding.layout == "plain"
    tmpl = model_p.init(jax.random.PRNGKey(0))
    out = ingp.unpack_params(model_p, np.frombuffer(loaded["snapshot"]["params_binary"], np.float16), tmpl)

    x = jax.random.uniform(jax.random.PRNGKey(5), (512, 3))
    y_brick = np.asarray(model.pos_encoding.apply(params["pos_encoding"], x))
    y_plain = np.asarray(model_p.pos_encoding.apply(out["pos_encoding"], x))
    # dense levels exact (fp16 blob); hash levels least-squares fit
    err = np.abs(y_plain - y_brick)
    assert err.mean() < 0.02, err.mean()
