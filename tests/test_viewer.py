"""Web viewer (P6/E17): HTTP endpoints drive render/train/edit verbs."""

import json
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def viewer():
    import subprocess
    import sys

    if not __import__("os").path.exists("/tmp/verify_scene/transforms.json"):
        subprocess.run([sys.executable, "scratch/make_verify_scene.py"], check=True)
    from nerfshop_tpu import Testbed, TestbedMode
    from nerfshop_tpu.viewer.server import ViewerServer

    tb = Testbed(TestbedMode.Nerf)
    tb.load_training_data("/tmp/verify_scene")
    tb.train(60, 8192)
    # tiny bake: the default /render path is the baked interactive renderer;
    # 32³ keeps the CPU-suite bake cost negligible while exercising it
    srv = ViewerServer(tb, port=18731, bake_resolution=32)
    httpd = srv.start_background()
    yield "http://127.0.0.1:18731"
    httpd.shutdown()


def _post(url, path, body):
    req = urllib.request.Request(url + path, data=json.dumps(body).encode(), method="POST")
    return urllib.request.urlopen(req, timeout=300)


def test_index_and_state(viewer):
    html = urllib.request.urlopen(viewer + "/", timeout=30).read()
    assert b"nerfshop_tpu viewer" in html
    state = json.loads(urllib.request.urlopen(viewer + "/state", timeout=30).read())
    assert state["step"] >= 60
    assert len(state["camera"]) == 3


def test_render_endpoint(viewer):
    r = _post(viewer, "/render", {"width": 48, "height": 32, "spp": 1})
    png = r.read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert r.headers["Content-Type"] == "image/png"


def test_train_endpoint(viewer):
    out = json.loads(_post(viewer, "/train", {"n_steps": 4, "batch_size": 4096}).read())
    assert np.isfinite(out["loss"])


def test_edit_verbs(viewer):
    out = json.loads(_post(viewer, "/edit/select_sphere",
                           {"center": [0.5, 0.5, 0.5], "radius": 0.12}).read())
    assert out["ok"]
    out = json.loads(_post(viewer, "/edit/compute_proxy", {}).read())
    assert out["ok"] and out["stage"] == "ProxyMesh"
    out = json.loads(_post(viewer, "/edit/extract_cage", {}).read())
    assert out["ok"] and out["stage"] == "TetMesh"
    out = json.loads(_post(viewer, "/edit/translate", {"offset": [0.1, 0, 0]}).read())
    assert out["ok"]
    out = json.loads(_post(viewer, "/edit/apply", {}).read())
    assert out["ok"] and out["n_operators"] == 1
    out = json.loads(_post(viewer, "/edit/clear", {}).read())
    assert out["ok"] and out["n_operators"] == 0


def test_unknown_verb(viewer):
    out = json.loads(_post(viewer, "/edit/nonsense", {}).read())
    assert out["ok"] is False


def test_cage_vertex_gizmo_and_state_extras(viewer):
    """VERDICT r2 #10: cage-vertex manipulation endpoint (the ImGuizmo
    analog), cage handles + loss history surfaced in /state."""
    out = json.loads(_post(viewer, "/edit/select_sphere",
                           {"center": [0.5, 0.5, 0.5], "radius": 0.12}).read())
    assert out["ok"]
    _post(viewer, "/edit/compute_proxy", {})
    _post(viewer, "/edit/extract_cage", {})
    state = json.loads(urllib.request.urlopen(viewer + "/state", timeout=30).read())
    assert "cage_vertices" in state and len(state["cage_vertices"]) > 3
    assert len(state["loss_history"]) > 0
    v = np.asarray(state["cage_vertices"], np.float32)
    out = json.loads(_post(viewer, "/edit/move_vertex",
                           {"index": 0, "position": (v[0] + 0.05).tolist()}).read())
    assert out["ok"]
    state2 = json.loads(urllib.request.urlopen(viewer + "/state", timeout=30).read())
    v2 = np.asarray(state2["cage_vertices"], np.float32)
    assert np.allclose(v2[0], v[0] + 0.05, atol=1e-5)
    out = json.loads(_post(viewer, "/edit/set_cage_vertices",
                           {"vertices": v.tolist()}).read())
    assert out["ok"]


def test_drag_applied_cage_updates_last_rebake_s(viewer):
    """VERDICT r4 ask #6b: a gizmo drag of an APPLIED cage must trigger a
    rebake on the next baked-path frame, surfaced as /state.last_rebake_s."""
    out = json.loads(_post(viewer, "/edit/select_sphere",
                           {"center": [0.5, 0.5, 0.5], "radius": 0.12}).read())
    assert out["ok"]
    _post(viewer, "/edit/compute_proxy", {})
    _post(viewer, "/edit/extract_cage", {})
    out = json.loads(_post(viewer, "/edit/apply", {}).read())
    assert out["ok"] and out["n_operators"] == 1
    # baked frame with the applied (undragged) cage settles the key
    _post(viewer, "/render", {"width": 48, "height": 32})
    state0 = json.loads(urllib.request.urlopen(viewer + "/state", timeout=30).read())

    v = np.asarray(state0["cage_vertices"], np.float32)
    out = json.loads(_post(viewer, "/edit/move_vertex",
                           {"index": 0, "position": (v[0] + 0.04).tolist()}).read())
    assert out["ok"]
    _post(viewer, "/render", {"width": 48, "height": 32})
    state1 = json.loads(urllib.request.urlopen(viewer + "/state", timeout=30).read())
    assert state1["last_rebake_s"] is not None
    assert state1["last_rebake_s"] != state0["last_rebake_s"]
    _post(viewer, "/edit/clear", {})
