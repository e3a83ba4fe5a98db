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


def test_volume_ingest_vdb_hint(tmp_path):
    """OpenVDB (not NanoVDB) still gets a conversion hint."""
    import pytest

    from nerfshop_tpu.data import volume_io

    p = tmp_path / "x.vdb"
    p.write_bytes(b"\x20\x42\x44\x56" + b"\0" * 64)
    with pytest.raises(NotImplementedError, match="OpenVDB"):
        volume_io.load_volume(p)


def _write_test_nvdb(path, dense, tiles=(), index_bbox=None):
    """Minimal uncompressed NanoVDB float-grid writer (ABI v32.3 layout per
    the reference's vendored NanoVDB.h) used to exercise load_nanovdb.

    ``tiles``: optional [(i0, j0, k0, value)] — 8³ ACTIVE CONSTANT tiles
    emitted through one lower-internal node (all must share the node's
    128-aligned origin); exercises the internal-tile expansion path."""
    import struct

    import numpy as np

    X, Y, Z = dense.shape
    leaves = []
    for i0 in range(0, X, 8):
        for j0 in range(0, Y, 8):
            for k0 in range(0, Z, 8):
                blk = np.zeros((8, 8, 8), np.float32)
                sub = dense[i0:i0 + 8, j0:j0 + 8, k0:k0 + 8]
                blk[: sub.shape[0], : sub.shape[1], : sub.shape[2]] = sub
                if (blk != 0).any():
                    # real builders run gridStats, which rewrites
                    # LeafData.mBBoxMin to the leaf's ACTIVE-voxel bbox min
                    # (NanoVDB.h:3883) — usually unaligned on boundary
                    # leaves; the loader must realign via origin() =
                    # mBBoxMin & ~7 (NanoVDB.h:3734)
                    act = np.argwhere(blk != 0).min(axis=0)
                    leaves.append((i0 + act[0], j0 + act[1], k0 + act[2], blk))

    LEAF_SIZE = 96 + 512 * 4
    LOWER_SIZE = 1088 + 4096 * 8  # hdr(32)+masks(2·512)+stats(16)→align32 + table
    tree_off = 672
    n_lower = 1 if tiles else 0
    root_off_rel = 64              # root right after TreeData
    lower_off_rel = root_off_rel + 64  # after the (tile-less) root
    leaf_off_rel = lower_off_rel + n_lower * LOWER_SIZE
    grid_size = tree_off + leaf_off_rel + LEAF_SIZE * len(leaves)

    grid = bytearray(grid_size)
    struct.pack_into("<Q", grid, 0, 0x304244566F6E614E)  # GridData.mMagic
    # TreeData: mNodeOffset[4] (leaf, lower, upper, root), mNodeCount[3]
    struct.pack_into(
        "<4Q", grid, tree_off, leaf_off_rel, lower_off_rel if n_lower else 0, 0, root_off_rel
    )
    struct.pack_into("<3I", grid, tree_off + 32, len(leaves), n_lower, 0)
    # RootData: mBBox(24) mTableSize(4) mBackground(4) ...
    struct.pack_into("<I", grid, tree_off + root_off_rel + 24, 0)
    struct.pack_into("<f", grid, tree_off + root_off_rel + 28, 0.0)
    if tiles:
        base = tree_off + lower_off_rel
        mn = np.min(np.asarray([t[:3] for t in tiles], np.int64), axis=0)
        struct.pack_into("<3i", grid, base, *mn.tolist())  # mBBoxMin (active)
        org = mn & ~127
        for (i0, j0, k0, v) in tiles:
            li, lj, lk = (i0 - org[0]) // 8, (j0 - org[1]) // 8, (k0 - org[2]) // 8
            assert 0 <= li < 16 and 0 <= lj < 16 and 0 <= lk < 16
            n = (li << 8) | (lj << 4) | lk
            grid[base + 32 + n // 8] |= 1 << (n % 8)  # value mask (LSB-first)
            struct.pack_into("<f", grid, base + 1088 + 8 * n, v)
    for n, (i0, j0, k0, blk) in enumerate(leaves):
        base = tree_off + leaf_off_rel + n * LEAF_SIZE
        struct.pack_into("<3i", grid, base, i0, j0, k0)
        grid[base + 16 : base + 80] = b"\xff" * 64  # value mask: all active
        grid[base + 96 : base + 96 + 2048] = blk.tobytes()  # i-major, k-fastest

    name = b"density\x00"
    header = struct.pack("<QIHH", 0x304244566F6E614E, 0, 1, 0)
    meta = bytearray(176)
    struct.pack_into("<4Q", meta, 0, grid_size, 0, 0, int((dense != 0).sum()))
    struct.pack_into("<II", meta, 32, 1, 0)  # gridType=Float, gridClass
    # indexBBox = ACTIVE-voxel bbox (what gridStats writes) — typically
    # unaligned, so the loader's low-side clip path is exercised
    if index_bbox is not None:
        alo, ahi = np.asarray(index_bbox[0], np.int64), np.asarray(index_bbox[1], np.int64)
    else:
        act = np.argwhere(dense != 0)
        alo, ahi = act.min(axis=0), act.max(axis=0)
    struct.pack_into("<6i", meta, 88, *alo.tolist(), *ahi.tolist())  # indexBBox
    struct.pack_into("<I", meta, 136, len(name))  # nameSize
    struct.pack_into("<4I", meta, 140, len(leaves), n_lower, 0, 0)  # nodeCount
    with open(path, "wb") as f:
        f.write(header)
        f.write(bytes(meta))
        f.write(name)
        f.write(bytes(grid))


def test_nanovdb_ingest(tmp_path):
    """.nvdb files load natively (VERDICT r2 #9 / reference
    src/testbed_volume.cu:563): sparse leaves place at their absolute
    origins, untouched voxels read the background."""
    import numpy as np

    from nerfshop_tpu.data import volume_io

    rng = np.random.default_rng(0)
    dense = np.zeros((24, 16, 16), np.float32)
    dense[2:10, 3:11, 4:12] = rng.uniform(0.1, 2.0, (8, 8, 8)).astype(np.float32)
    dense[16:24, 8:16, 0:8] = rng.uniform(0.1, 1.0, (8, 8, 8)).astype(np.float32)
    p = tmp_path / "vol.nvdb"
    _write_test_nvdb(p, dense)
    out = volume_io.load_volume(p)
    # the volume is returned over the ACTIVE indexBBox (as real stats-run
    # files declare it), with unaligned per-leaf mBBoxMin realigned
    act = np.argwhere(dense != 0)
    alo, ahi = act.min(axis=0), act.max(axis=0)
    expect = dense[alo[0] : ahi[0] + 1, alo[1] : ahi[1] + 1, alo[2] : ahi[2] + 1]
    assert out.shape == expect.shape
    np.testing.assert_allclose(out, expect, atol=0)


def test_nanovdb_internal_tiles(tmp_path):
    """Active constant tiles in a lower-internal node expand to dense 8³
    blocks (VERDICT r3 #9; reference reads them through the NanoVDB
    accessor, here they are materialized at load)."""
    import numpy as np

    from nerfshop_tpu.data import volume_io

    dense = np.zeros((8, 8, 8), np.float32)  # no leaves at all
    tiles = [(8, 8, 16, 0.7), (16, 8, 16, 0.3), (8, 120, 120, 1.5)]
    bbox = ((8, 8, 16), (23, 127, 127))
    p = tmp_path / "tiles.nvdb"
    _write_test_nvdb(p, dense, tiles=tiles, index_bbox=bbox)
    out = volume_io.load_volume(p)
    lo = np.asarray(bbox[0])
    expect = np.zeros(np.asarray(bbox[1]) - lo + 1, np.float32)
    for (i0, j0, k0, v) in tiles:
        a = np.asarray([i0, j0, k0]) - lo
        expect[a[0] : a[0] + 8, a[1] : a[1] + 8, a[2] : a[2] + 8] = v
    assert out.shape == expect.shape
    np.testing.assert_allclose(out, expect, atol=0)


def test_nanovdb_rejects_compressed(tmp_path):
    import struct

    import pytest

    from nerfshop_tpu.data import volume_io

    p = tmp_path / "c.nvdb"
    p.write_bytes(struct.pack("<QIHH", 0x304244566F6E614E, 0, 1, 1) + b"\x00" * 176)
    with pytest.raises(NotImplementedError):
        volume_io.load_volume(p)
