import argparse
import os

import pytest

from pointcept_tpu.utils.config import Config, ConfigDict, DictAction
from pointcept_tpu.utils.registry import Registry

pytestmark = pytest.mark.quick


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_config_fromfile_and_attr(tmp_path):
    path = _write(tmp_path, "a.py", "a = 1\nb = dict(c=2, d=[1, 2, 3])\n")
    cfg = Config.fromfile(path)
    assert cfg.a == 1
    assert cfg.b.c == 2
    assert cfg["b"]["d"] == [1, 2, 3]
    cfg.b.c = 5
    assert cfg.b.c == 5


def test_config_base_inheritance(tmp_path):
    _write(tmp_path, "base.py", "model = dict(type='A', depth=2, head=dict(ch=4))\nlr = 0.1\n")
    child = _write(
        tmp_path,
        "child.py",
        "_base_ = ['./base.py']\nmodel = dict(depth=3, head=dict(num=7))\nbs = 8\n",
    )
    cfg = Config.fromfile(child)
    assert cfg.model.type == "A"  # inherited
    assert cfg.model.depth == 3  # overridden
    assert cfg.model.head.ch == 4 and cfg.model.head.num == 7  # deep merged
    assert cfg.lr == 0.1 and cfg.bs == 8


def test_config_delete_key(tmp_path):
    _write(tmp_path, "base.py", "opt = dict(type='SGD', momentum=0.9)\n")
    child = _write(tmp_path, "child.py", "_base_ = ['./base.py']\nopt = dict(_delete_=True, type='AdamW')\n")
    cfg = Config.fromfile(child)
    assert cfg.opt == dict(type="AdamW")
    assert "momentum" not in cfg.opt


def test_config_merge_from_dict():
    cfg = Config(dict(model=dict(backbone=dict(depth=50)), pipeline=[dict(type="A"), dict(type="B")]))
    cfg.merge_from_dict({"model.backbone.depth": 101, "pipeline.1.type": "C", "new_key": 1})
    assert cfg.model.backbone.depth == 101
    assert cfg.pipeline[1]["type"] == "C"
    assert cfg.new_key == 1


def test_config_dump_roundtrip(tmp_path):
    cfg = Config(dict(a=1, b=dict(c=[1, 2], d="x"), e=(1, 2)))
    out = str(tmp_path / "dump.py")
    cfg.dump(out)
    cfg2 = Config.fromfile(out)
    assert cfg2.a == 1 and cfg2.b.c == [1, 2] and cfg2.b.d == "x" and tuple(cfg2.e) == (1, 2)


def test_dict_action():
    parser = argparse.ArgumentParser()
    parser.add_argument("--options", nargs="+", action=DictAction)
    args = parser.parse_args(["--options", "a.b=1", "c=true", "d=1,2,3", "e=[1,2]", "f=none", "g=str"])
    assert args.options == {
        "a.b": 1,
        "c": True,
        "d": (1, 2, 3),
        "e": [1, 2],
        "f": None,
        "g": "str",
    }


def test_registry_build():
    REG = Registry("test")

    @REG.register_module()
    class Foo:
        def __init__(self, x, y=2):
            self.x, self.y = x, y

    @REG.register_module(name="Bar2")
    class Bar:
        def __init__(self):
            pass

    obj = REG.build(dict(type="Foo", x=1))
    assert isinstance(obj, Foo) and obj.x == 1 and obj.y == 2
    assert isinstance(REG.build(dict(type="Bar2")), Bar)
    assert "Foo" in REG and len(REG) == 2
    with pytest.raises(KeyError):
        REG.build(dict(type="Missing"))


def test_configdict_deepcopy():
    import copy

    cd = ConfigDict(a=dict(b=[1, dict(c=2)]))
    cd2 = copy.deepcopy(cd)
    cd2.a.b[1]["c"] = 5
    assert cd.a.b[1]["c"] == 2
