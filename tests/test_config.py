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
