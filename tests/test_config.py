"""Config system tests (yaml ⊕ dotlist merge, instantiate_from_config)."""

import os
import tempfile

from starvector_tpu.config import (
    ConfigNode,
    experiment_id,
    get_config,
    instantiate_from_config,
    merge,
    parse_dotlist,
)


def test_merge_deep_right_bias():
    a = {"m": {"x": 1, "y": 2}, "k": 1}
    b = {"m": {"y": 3, "z": 4}}
    c = merge(a, b)
    assert c.m.x == 1 and c.m.y == 3 and c.m.z == 4 and c.k == 1


def test_dotlist_yaml_coercion():
    cfg = parse_dotlist(["a.b=3e-4", "a.c=true", "d=[1,2]", "e=text"])
    assert abs(cfg.a.b - 3e-4) < 1e-12
    assert cfg.a.c is True
    assert cfg.d == [1, 2]
    assert cfg.e == "text"


def test_get_config_file_and_cli():
    with tempfile.TemporaryDirectory() as td:
        default = os.path.join(td, "default.yaml")
        exp = os.path.join(td, "exp.yaml")
        with open(default, "w") as f:
            f.write("training:\n  lr: 1.0e-3\n  steps: 10\n")
        with open(exp, "w") as f:
            f.write("training:\n  lr: 5.0e-4\n")
        cfg = get_config(
            [f"config={exp}", "training.steps=99"], default_path=default
        )
        assert cfg.training.lr == 5e-4
        assert cfg.training.steps == 99


def test_instantiate_from_config():
    block = {"target": "collections.OrderedDict", "params": {}}
    obj = instantiate_from_config(block)
    from collections import OrderedDict

    assert isinstance(obj, OrderedDict)


def test_experiment_id_deterministic():
    cfg = ConfigNode({"a": 1, "b": {"c": 2}})
    assert experiment_id(cfg) == experiment_id(ConfigNode({"b": {"c": 2}, "a": 1}))


def test_set_get_path():
    cfg = ConfigNode()
    cfg.set_path("x.y.z", 5)
    assert cfg.get_path("x.y.z") == 5
    assert cfg.get_path("x.missing", "dflt") == "dflt"


def test_get_config_missing_default_raises():
    """A named-but-absent default layer must fail loudly, not silently drop
    the optimizer recipe / freeze flags (reference starvector/util.py:280
    crashes too; previously this repo skipped the layer without a message
    when launched from a non-root CWD)."""
    import pytest

    with pytest.raises(FileNotFoundError, match="default config layer"):
        get_config([], default_path="/nonexistent/default.yaml")


def test_resolve_repo_config_is_cwd_independent(tmp_path, monkeypatch):
    """resolve_repo_config finds configs/models/default.yaml from any CWD
    (anchored at the package root), and raises with the tried paths when
    the file exists nowhere."""
    import pytest

    from starvector_tpu.config import resolve_repo_config

    monkeypatch.chdir(tmp_path)
    path = resolve_repo_config()
    assert os.path.isabs(path) and os.path.exists(path)
    assert path.endswith(os.path.join("configs", "models", "default.yaml"))

    with pytest.raises(FileNotFoundError, match="tried"):
        resolve_repo_config("configs/does/not/exist.yaml")

    # explicit env root wins
    (tmp_path / "configs").mkdir()
    (tmp_path / "configs" / "x.yaml").write_text("a: 1\n")
    monkeypatch.setenv("STARVECTOR_CONFIG_ROOT", str(tmp_path))
    assert resolve_repo_config("configs/x.yaml") == str(
        tmp_path / "configs" / "x.yaml")
