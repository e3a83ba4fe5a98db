import json

from nerfshop_tpu import config as cfg_lib


def test_strip_comments():
    text = '{"a": 1, // comment\n "b": "http://not-a-comment"}'
    data = cfg_lib.loads_tolerant(text)
    assert data == {"a": 1, "b": "http://not-a-comment"}


def test_parent_inheritance(tmp_path):
    (tmp_path / "base.json").write_text(json.dumps({"loss": {"otype": "L2"}, "network": {"n_neurons": 64}}))
    (tmp_path / "child.json").write_text(json.dumps({"parent": "base.json", "network": {"n_neurons": 128}}))
    cfg = cfg_lib.load_network_config(tmp_path / "child.json")
    assert cfg["loss"]["otype"] == "L2"
    assert cfg["network"]["n_neurons"] == 128


def test_reference_configs_parse():
    import pathlib

    ref = pathlib.Path("/root/reference/configs")
    if not ref.exists():
        return
    for p in ref.rglob("*.json"):
        cfg = cfg_lib.load_network_config(p)
        assert isinstance(cfg, dict)


def test_config_dict_access():
    cfg = cfg_lib.default_nerf_config()
    assert cfg.encoding.otype == "HashGrid"
    assert cfg.get_path("optimizer.nested.nested.learning_rate") == 1e-2
    assert cfg.get_path("no.such.key", 42) == 42
