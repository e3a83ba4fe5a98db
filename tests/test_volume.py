"""Volume testbed: density-field fitting + delta-tracked rendering vs the
GT tracker (the reference's volume_render_kernel_gt analog as oracle)."""

import jax
import numpy as np
import pytest

from nerfshop_tpu.train import volume as vol_lib


def _cfg():
    return {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15},
        "encoding": {"otype": "HashGrid", "n_levels": 6, "n_features_per_level": 2,
                     "log2_hashmap_size": 14, "base_resolution": 8, "per_level_scale": 1.6},
        "network": {"n_neurons": 32, "n_hidden_layers": 2},
    }


@pytest.mark.slow
def test_volume_fit_and_render():
    gt = vol_lib.synthetic_smoke(res=48)
    tb = vol_lib.VolumeTestbed.create(_cfg(), gt, jax.random.PRNGKey(0))
    l0 = tb.train(1, batch_size=8192)
    l1 = tb.train(120, batch_size=8192)
    assert l1 < l0 * 0.5, (l0, l1)

    cam = np.array([[1, 0, 0, 0.5], [0, -1, 0, 0.5], [0, 0, 1, -1.2]], np.float32)
    focal = np.array([28.0, 28.0], np.float32)
    img_net = tb.render(24, 24, cam, focal, spp=8)
    img_gt = tb.render(24, 24, cam, focal, spp=8, use_gt=True)
    assert img_net.shape == (24, 24, 4)
    assert img_net[..., 3].mean() > 0.05  # some hits
    # network render roughly matches GT tracker (stochastic, loose)
    diff = np.abs(img_net[..., 3] - img_gt[..., 3]).mean()
    assert diff < 0.25, diff


def test_volume_testbed_facade():
    from nerfshop_tpu import Testbed, TestbedMode

    tb = Testbed(TestbedMode.Volume, config=_cfg())
    tb._volume_grid = None  # no asset: set synthetic directly
    tb._reset_network()
    tb._volume.set_volume(vol_lib.synthetic_smoke(res=32))
    loss = tb.train(n_steps=3, batch_size=4096)
    assert np.isfinite(loss)


def test_volume_ingest_npy(tmp_path):
    """S6: .npy volumes load through Testbed.load_training_data."""
    import numpy as np

    from nerfshop_tpu import Testbed, TestbedMode

    g = (np.arange(32) + 0.5) / 32
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    vol = np.exp(-50 * ((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)).astype(np.float32)
    np.save(tmp_path / "smoke.npy", vol)

    tb = Testbed(TestbedMode.Volume)
    tb.load_training_data(str(tmp_path / "smoke.npy"))
    loss = tb.train(30, 4096)
    assert np.isfinite(loss)
    img = tb.render(24, 24, spp=1)
    assert img.shape == (24, 24, 4)


def test_volume_ingest_nvdb_hint(tmp_path):
    import numpy as np
    import pytest

    from nerfshop_tpu.data import volume_io

    p = tmp_path / "x.nvdb"
    p.write_bytes(volume_io.NANOVDB_MAGIC.to_bytes(8, "little") + b"\0" * 64)
    with pytest.raises(NotImplementedError, match="NanoVDB"):
        volume_io.load_volume(p)
